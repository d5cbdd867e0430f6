"""Source/sink tests: CSV inference round-trip, JSONL, format dispatch,
partition pruning, and bucketed exchange-free joins."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from data_pipeline_agent_spark.sources.readers import read_any
from data_pipeline_agent_spark.sources.sinks import (
    read_bucketed_table,
    write_bucketed_table,
    write_csv_single,
    write_partitioned_parquet,
)


def test_csv_roundtrip_inference(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text(
        "id,name,score,when,empty\n"
        "1,alpha,1.5,2024-01-02 03:04:05,\n"
        "2,beta,2.5,2024-02-03 04:05:06,\n"
        "3,,3.5,2024-03-04 05:06:07,\n"
    )
    df = read_any(spark, str(p))
    types = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)
    assert types["id"] in ("int", "bigint")
    assert types["score"] == "double"
    assert types["when"] == "timestamp"
    assert df.count() == 3
    assert df.where(F.col("name").isNull()).count() == 1


def test_jsonl_read(spark, tmp_path):
    p = tmp_path / "t.json"
    rows = [{"a": i, "b": f"x{i}"} for i in range(5)]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    df = read_any(spark, str(p))
    assert df.count() == 5
    assert set(df.columns) == {"a", "b"}


def test_dispatch_defaults_to_csv(spark, tmp_path):
    p = tmp_path / "noext"
    p.write_text("x,y\n1,2\n")
    assert read_any(spark, str(p)).columns == ["x", "y"]


def test_partitioned_write_prunes(spark, tmp_path):
    src = spark.createDataFrame(
        [(i, "AB"[i % 2], float(i)) for i in range(100)], "id long, part string, v double"
    )
    out = str(tmp_path / "part_parquet")
    write_partitioned_parquet(src, out, ["part"])
    # directory layout is the partition key
    assert sorted(d for d in os.listdir(out) if d.startswith("part=")) == ["part=A", "part=B"]
    back = spark.read.parquet(out).where(F.col("part") == "A")
    assert back.count() == 50
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the non-matching directory is pruned at planning time
    assert "part=A" not in plan or "part=B" not in plan


def test_bucketed_join_no_exchange(spark):
    # managed tables land in the session's default warehouse; DROP TABLE
    # below removes the files (warehouse.dir is a static conf, unsettable here)
    a = spark.createDataFrame([(i, f"a{i}") for i in range(1000)], "k long, va string")
    b = spark.createDataFrame([(i, f"b{i}") for i in range(1000)], "k long, vb string")
    write_bucketed_table(a, "bt_a", "k", n_buckets=8, sort_col="k")
    write_bucketed_table(b, "bt_b", "k", n_buckets=8, sort_col="k")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path (tiny test tables would broadcast)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = read_bucketed_table(spark, "bt_a").join(read_bucketed_table(spark, "bt_b"), "k")
        assert joined.count() == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join must not shuffle"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_csv_single_sink(spark, tmp_path):
    df = spark.createDataFrame([("f1", 0.5), ("f2", 0.3)], "feature string, importance double")
    out = str(tmp_path / "imp_csv")
    write_csv_single(df, out)
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert len(files) == 1  # single part file, reference S6 shape
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 2


def test_write_range_clustered_files_have_disjoint_stats(spark, tmp_path):
    """The clustered layout's whole point: each output file's min/max
    range on the cluster column must be narrow and (near-)disjoint, so
    parquet row-group stats can prune selective reads. Assert real file
    footer statistics, not just row counts."""
    import pyarrow.parquet as pq

    from data_pipeline_agent_spark.sources.sinks import write_range_clustered

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    out = str(tmp_path / "orders_clustered")
    write_range_clustered(df, out, "o_totalprice", n_files=8)

    import glob

    ranges = []
    for f in sorted(glob.glob(f"{out}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = [md.schema.column(i).name for i in range(md.num_columns)].index(
            "o_totalprice"
        )
        lo = min(
            md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups)
        )
        ranges.append((lo, hi))
    assert len(ranges) >= 4  # range partitioner actually split the data
    ranges.sort()
    # contiguous, non-overlapping slices of the key space
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: ({lo1},{hi1}) vs ({lo2},{hi2})"
    # round-trip intact
    back = spark.read.parquet(out)
    assert back.count() == df.count()


def test_write_zorder_clustered_files_cover_compact_rectangles(spark, tmp_path):
    """Z-ordered files must each cover a COMPACT rectangle of the
    (custkey, totalprice) space — the property that lets row-group stats
    prune on either column. A plain single-column sort would leave the
    other column spanning its full range in every file."""
    import glob

    import pyarrow.parquet as pq

    from data_pipeline_agent_spark.sources.sinks import write_zorder_clustered

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    out = str(tmp_path / "orders_z")
    write_zorder_clustered(df, out, ["o_custkey", "o_totalprice"], n_files=16)

    def col_range(md, name):
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        idx = names.index(name)
        st = [md.row_group(g).column(idx).statistics for g in range(md.num_row_groups)]
        return min(s.min for s in st), max(s.max for s in st)

    spans_a, spans_b, n_rows = [], [], 0
    glo_a, ghi_a = float("inf"), float("-inf")
    glo_b, ghi_b = float("inf"), float("-inf")
    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) >= 8
    for f in files:
        md = pq.ParquetFile(f).metadata
        n_rows += md.num_rows
        lo, hi = col_range(md, "o_custkey")
        spans_a.append(hi - lo)
        glo_a, ghi_a = min(glo_a, lo), max(ghi_a, hi)
        lo, hi = col_range(md, "o_totalprice")
        spans_b.append(hi - lo)
        glo_b, ghi_b = min(glo_b, lo), max(ghi_b, hi)
    assert n_rows == df.count()
    # average per-file span must be well under the global span on BOTH
    # dimensions (a random or single-sorted layout fails one of them)
    avg_a = sum(spans_a) / len(spans_a)
    avg_b = sum(spans_b) / len(spans_b)
    assert avg_a <= (ghi_a - glo_a) * 0.6, (avg_a, ghi_a - glo_a)
    assert avg_b <= (ghi_b - glo_b) * 0.6, (avg_b, ghi_b - glo_b)


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    import glob

    from data_pipeline_agent_spark.sources.sinks import compact_parquet

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    frag = str(tmp_path / "fragmented")
    df.repartition(64).write.parquet(frag)
    assert len(glob.glob(f"{frag}/part-*.parquet")) == 64

    out = str(tmp_path / "compacted")
    n = compact_parquet(spark, frag, out, target_file_mb=256)
    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) == n == 1  # ~100 KB of data fits one 256 MB target
    assert spark.read.parquet(out).count() == df.count()


def test_align_schemas_union_with_missing_columns(spark):
    from data_pipeline_agent_spark.sources.sinks import align_schemas

    a = spark.createDataFrame([(1, "x")], "id long, old_col string")
    b = spark.createDataFrame([(2, 3.5)], "id long, new_col double")
    out = align_schemas([a, b]).orderBy("id").collect()
    assert [r["id"] for r in out] == [1, 2]
    assert out[0]["old_col"] == "x" and out[0]["new_col"] is None
    assert out[1]["old_col"] is None and out[1]["new_col"] == 3.5


def test_zorder_key_matches_python_interleave(spark):
    """Property check: the Morton key expression must equal a driver-side
    bit interleave for random quantized inputs."""
    import random

    from pyspark.sql import functions as F

    from data_pipeline_agent_spark.sources.sinks import zorder_key

    random.seed(7)
    rows = [(random.randrange(256), random.randrange(256)) for _ in range(200)]

    def interleave(a, b, bits=8):
        out = 0
        for i in range(bits):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    df = spark.createDataFrame(rows, "a long, b long")
    got = (
        df.select("a", "b", zorder_key([F.col("a"), F.col("b")], bits=8).alias("z"))
        .collect()
    )
    for r in got:
        assert r["z"] == interleave(r["a"], r["b"]), (r["a"], r["b"], r["z"])


def test_write_training_shards_deterministic(spark, tmp_path):
    """Training-shard export: every input row lands in exactly one JSONL
    shard, shard assignment is identical across two runs (no RNG), and
    the manifest row counts match the files on disk."""
    from data_pipeline_agent_spark.sources.sinks import write_training_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out1, out2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    m1 = write_training_shards(docs, out1, n_shards=4).collect()
    m2 = write_training_shards(docs, out2, n_shards=4).collect()
    assert sorted((r.shard, r.n_rows) for r in m1) == sorted(
        (r.shard, r.n_rows) for r in m2
    )
    total = docs.count()
    assert sum(r.n_rows for r in m1) == total
    back = spark.read.json(out1)
    assert back.count() == total
    assert back.select("doc_id").distinct().count() == total
    # shard membership identical across runs
    a = {(r.doc_id, r.shard) for r in spark.read.json(out1).select("doc_id", "shard").collect()}
    b = {(r.doc_id, r.shard) for r in spark.read.json(out2).select("doc_id", "shard").collect()}
    assert a == b


def test_write_training_shards_no_text_column(spark, tmp_path):
    """The sink is generic over id_col: a frame WITHOUT a text column must
    still export + produce a manifest (n_rows only, no n_chars)."""
    from data_pipeline_agent_spark.sources.sinks import write_training_shards

    feats = spark.range(100).select(
        F.col("id").alias("row_id"), (F.col("id") * 2.5).alias("score")
    )
    m = write_training_shards(
        feats, str(tmp_path / "f"), n_shards=4, id_col="row_id"
    )
    assert "n_chars" not in m.columns
    rows = m.collect()
    assert sum(r.n_rows for r in rows) == 100
