"""Spot-check a SUBSET of registry queries against their DuckDB twins.

Same compare rules as scripts/oracle_full.py (which sweeps the whole
registry and writes the per-round artifact); this is the fast inner-loop
tool for iterating on individual queries:

    python scripts/oracle_subset.py corpus_dsir_logratio text_bpe_fertility \
        [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.oracle_full import _sig  # noqa: E402

from data_pipeline_agent_spark.plans import REGISTRY  # noqa: E402
from data_pipeline_agent_spark.session import TABLES, get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    spark = get_spark("oracle_subset")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    failed = []
    for name in args.names:
        spec = REGISTRY[name]
        try:
            sdf = spec.spark(spark, args.sf_dir).toPandas()
            if spec.oracle is None:
                print(f"UNVERIFIED {name} spark={len(sdf)} (no oracle)")
                continue
            odf = con.execute(spec.oracle).df()
            s_cols, s_rows = _sig(sdf)
            o_cols, o_rows = _sig(odf)
            ok = s_cols == o_cols and s_rows == o_rows
            print(
                f"{'OK' if ok else 'FAIL'} {name} "
                f"spark={len(sdf)} oracle={len(odf)} "
                f"schema={'=' if s_cols == o_cols else f'{s_cols} != {o_cols}'}"
            )
            if not ok:
                failed.append(name)
                for i, (a, b) in enumerate(zip(s_rows, o_rows)):
                    if a != b:
                        print(f"  first diff row {i}:\n   spark : {a}\n   oracle: {b}")
                        break
        except Exception as exc:  # keep sweeping
            failed.append(name)
            print(f"ERR {name}: {type(exc).__name__}: {exc}"[:600])
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
