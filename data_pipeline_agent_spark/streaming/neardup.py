"""Streaming MinHash-LSH near-duplicate detection.

The ingestion-time sibling of operators/dedup.minhash_near_dup_pairs: a
document stream is banded with EXACTLY the batch stack's arithmetic
(functions/text_hash: md5 shingle hashes, 12 affine minhashes, 3 bands x
4 rows), each (band, key) bucket keeps its FIRST-ARRIVAL document as the
bucket exemplar in stream state, and every later arrival that lands in
the bucket is emitted as a near-dup candidate with its signature
agreement against the exemplar — the verify step, so a chance band
collision between dissimilar docs is filtered by the other 8 signature
components instead of being reported.

Scale shape: banding is a pure map-side projection (no Python in the
hot path until the keyed state op); state is ONE exemplar per occupied
bucket (id + 12 longs — megabytes per million buckets), evicted by
event-time timeout past the watermark horizon, so state never grows with
stream length. The emitted estimate is the standard MinHash unbiased
Jaccard estimator (agreeing components / k).

Semantics contract (same watermark trade as windows.dedup_stream): the
exemplar is the first arrival within the state horizon — a near-dup
arriving later than ``delay`` after its bucket's exemplar was evicted
re-seeds a fresh exemplar and is NOT reported. Within a micro-batch,
rows are processed in (ts, id) order, so a single-batch replay equals
the batch twin exactly (pinned by tests/test_streaming.py).

Reference parity note: /root/reference (main.py, 581-LoC pandas
profiler) has no streaming and no dedup at all — brief-extension
surface (the streaming sibling of the MinHash+LSH dedup item).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from data_pipeline_agent_spark.functions.text_hash import (
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_K,
    h32_array,
    minhash_from_hashes,
    tokens,
    word_ngrams,
)

PAIR_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("exemplar_id", LongType()),
        StructField("band", LongType()),
        StructField("n_sig_agree", LongType()),
        StructField("est_jaccard", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("ex_id", LongType()),
        StructField("ex_sig", ArrayType(LongType())),
        StructField("ex_ts", DoubleType()),  # epoch seconds
    ]
)

# minimum agreeing signature components (of MINHASH_K=12) for a bucket
# hit to be reported: 4 are implied by the shared band, so 6 asks for 2
# of the remaining 8 — expected Jaccard >= ~0.5 under the estimator
MIN_SIG_AGREE = 6


_INTERVAL_UNITS_MS = {
    "second": 1000,
    "seconds": 1000,
    "minute": 60_000,
    "minutes": 60_000,
    "hour": 3_600_000,
    "hours": 3_600_000,
}


def _interval_ms(delay: str) -> int:
    """'10 minutes' -> 600000; the subset of CalendarInterval syntax the
    streaming operators here use (fail loud on anything else)."""
    n, unit = delay.strip().split()
    if unit not in _INTERVAL_UNITS_MS:
        raise ValueError(f"unsupported interval unit in {delay!r}")
    return int(n) * _INTERVAL_UNITS_MS[unit]


def band_frame(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """(id, ts, band, key, sig) — one row per LSH band per document,
    computed with the batch dedup stack's exact arithmetic (so the
    stream flags precisely the candidate pairs lsh_candidate_pairs
    would). Works on static and streaming frames alike: everything is a
    scan-stage column expression. Documents shorter than one shingle
    never band (same scope as operators/dedup.shingles)."""
    staged = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(ts_col).alias("ts"),
        tokens(F.col(text_col)).alias("__toks"),
    ).where(F.size("__toks") >= 3)
    hashed = staged.select(
        "doc_id",
        "ts",
        h32_array(word_ngrams(F.col("__toks"))).alias("__hashes"),
    ).select(
        "doc_id",
        "ts",
        F.array(
            *[
                minhash_from_hashes(F.col("__hashes"), j)
                for j in range(MINHASH_K)
            ]
        ).alias("sig"),
    )
    # one scan, one generator: a per-band unionAll would re-evaluate the
    # md5 shingle hashing + 12 minhashes once per band branch (the sig
    # projection is not shared across union legs without a persist,
    # which a streaming frame cannot take)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band"),
                F.concat_ws(
                    "_",
                    *[
                        F.element_at("sig", b * LSH_ROWS + r + 1).cast(
                            "string"
                        )
                        for r in range(LSH_ROWS)
                    ],
                ).alias("key"),
            )
            for b in range(LSH_BANDS)
        ]
    )
    return hashed.select(
        "doc_id", "ts", "sig", F.explode(band_structs).alias("__b")
    ).select("doc_id", "ts", F.col("__b.band").alias("band"), F.col("__b.key").alias("key"), "sig")


def minhash_neardup_stream(
    stream_df: DataFrame,
    min_sig_agree: int = MIN_SIG_AGREE,
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming near-dup candidates over (doc_id long, text string,
    ts timestamp): per occupied (band, key) bucket the first arrival is
    kept as exemplar state and every later arrival is emitted with its
    signature agreement when >= ``min_sig_agree``. Event-time timeout at
    the watermark + ``delay`` horizon evicts idle buckets, bounding
    state. Output is at BAND grain (a pair agreeing in several bands
    appears once per band — dedupe downstream if pair grain is needed;
    the batch twin mirrors this grain exactly).

    Timezone safety: applyInPandasWithState hands the worker NAIVE
    pandas timestamps rendered in ``spark.sql.session.timeZone``, while
    ``GroupState`` watermark/timeout milliseconds are absolute epoch —
    so the exemplar epoch is computed by localizing with the session tz
    captured at plan-build time, not by assuming the session is UTC."""
    session_tz = stream_df.sparkSession.conf.get(
        "spark.sql.session.timeZone"
    )
    banded = band_frame(stream_df.withWatermark("ts", delay))
    k = MINHASH_K
    horizon_ms = _interval_ms(delay)

    def update_bucket(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        import pandas as pd  # worker-side import, self-contained

        if state.hasTimedOut:
            state.remove()
            return
        band, _bkey = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows) == 0:
            return
        # deterministic within-batch order: a single-batch replay must
        # elect the same exemplar as the batch twin's min(ts, id)
        rows = rows.sort_values(["ts", "doc_id"])
        ex_id, ex_sig, ex_ts = (
            state.get if state.exists else (None, None, None)
        )
        out = []
        for r in rows.itertuples():
            sig = [int(x) for x in r.sig]  # numpy -> plain ints (state ser)
            if ex_id is None:
                ts = r.ts if r.ts.tzinfo else r.ts.tz_localize(session_tz)
                ex_id, ex_sig, ex_ts = int(r.doc_id), sig, ts.timestamp()
                continue
            agree = sum(1 for a, b in zip(sig, ex_sig) if a == b)
            if agree >= min_sig_agree:
                out.append(
                    (
                        int(r.doc_id),
                        int(ex_id),
                        int(band),
                        int(agree),
                        round(agree / k, 6),
                    )
                )
        state.update((int(ex_id), [int(x) for x in ex_sig], float(ex_ts)))
        # evict exemplars idle past the watermark horizon: state is one
        # row per occupied bucket and must not grow with stream length
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(
            max(wm_ms, int(ex_ts * 1000)) + horizon_ms
        )
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "exemplar_id",
                    "band",
                    "n_sig_agree",
                    "est_jaccard",
                ],
            )

    return banded.groupBy("band", "key").applyInPandasWithState(
        update_bucket,
        outputStructType=PAIR_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def minhash_neardup_batch(
    df: DataFrame, min_sig_agree: int = MIN_SIG_AGREE
) -> DataFrame:
    """The batch twin: identical band frame, exemplar = min(ts, doc_id)
    per (band, key) via one struct-min window over the SAME bucket
    exchange the candidate count would ride (no join back — the
    exemplar's signature travels inside the min struct), agreement via
    one zip_with. Bucket partitions are the standard LSH occupancy
    regime — the same bound every batch LSH stage in this package runs
    under."""
    banded = band_frame(df)
    w = Window.partitionBy("band", "key")
    ex = F.min(F.struct("ts", "doc_id", "sig")).over(w)
    agree = F.size(
        F.filter(
            F.zip_with("sig", ex["sig"], lambda a, b: a == b),
            lambda x: x,
        )
    )
    return (
        banded.select(
            "doc_id",
            "band",
            ex["doc_id"].alias("exemplar_id"),
            agree.cast("long").alias("n_sig_agree"),
        )
        .where(
            (F.col("doc_id") != F.col("exemplar_id"))
            & (F.col("n_sig_agree") >= min_sig_agree)
        )
        .select(
            "doc_id",
            "exemplar_id",
            "band",
            "n_sig_agree",
            F.round(F.col("n_sig_agree") / MINHASH_K, 6).alias("est_jaccard"),
        )
    )
