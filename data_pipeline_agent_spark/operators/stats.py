"""Visualization-support statistics (SURVEY §2.4 A1-A8) — every figure's
data is a distributed aggregate collected as a tiny driver-side result;
no row data ever leaves the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_agent_spark.operators.profiling import numeric_columns


def group_counts(df: DataFrame, col: str, limit: int = 50) -> list[tuple]:
    """A3/A8 value_counts, deterministic order (count desc, value asc)."""
    return [
        (r[0], r[1])
        for r in df.groupBy(col)
        .count()
        .orderBy(F.desc("count"), F.asc(col))
        .limit(limit)
        .collect()
    ]


def histogram_bins(df: DataFrame, col: str, bins: int = 20) -> list[tuple]:
    """A7 fixed-width histogram: [(bin_start, bin_end, count)]. One agg for
    min/max + one grouped agg for counts."""
    mm = df.agg(F.min(col).alias("mn"), F.max(col).alias("mx")).first()
    mn, mx = mm["mn"], mm["mx"]
    if mn is None or mx is None:
        return []
    if mx == mn:
        return [(float(mn), float(mx), df.where(F.col(col).isNotNull()).count())]
    b = (
        df.where(F.col(col).isNotNull())
        .select(
            F.least(
                F.floor((F.col(col) - F.lit(mn)) / F.lit(mx - mn) * bins), F.lit(bins - 1)
            ).alias("bin")
        )
        .groupBy("bin")
        .count()
        .collect()
    )
    counts = {int(r["bin"]): r["count"] for r in b}
    w = (mx - mn) / bins
    return [
        (float(mn + i * w), float(mn + (i + 1) * w), counts.get(i, 0)) for i in range(bins)
    ]


def corr_pairs(df: DataFrame, max_cols: int = 10) -> tuple[list[str], dict]:
    """A6 Pearson matrix over the first max_cols numeric columns
    (reference caps at 10, main.py:165) in ONE aggregate pass."""
    cols = numeric_columns(df)[:max_cols]
    if len(cols) < 2:
        return cols, {}
    # F.corr on a zero-variance column raises DIVIDE_BY_ZERO under Spark
    # 4's ANSI mode (pandas shows NaN); screen out constant columns first
    var_row = df.agg(*[F.var_samp(F.col(c).cast("double")).alias(c) for c in cols]).first()
    cols = [c for c in cols if var_row[c] is not None and var_row[c] > 0]
    if len(cols) < 2:
        return cols, {}
    aggs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            aggs.append(F.corr(a, b).alias(f"{a}||{b}"))
    row = df.agg(*aggs).first().asDict()
    out = {}
    for k, v in row.items():
        a, b = k.split("||")
        out[(a, b)] = v
        out[(b, a)] = v
    for c in cols:
        out[(c, c)] = 1.0
    return cols, out


def kde_grid(df: DataFrame, col: str, n_points: int = 64) -> list[tuple[float, float]]:
    """A7 KDE overlay (reference: sns.histplot(kde=True), main.py:156,179).

    Gaussian kernel density evaluated on an n_points even grid between the
    column's min and max, via ``pyspark.mllib.stat.KernelDensity`` — the
    sample stays distributed (one RDD pass per estimate); only the
    n_points grid densities come back to the driver. Bandwidth is Scott's
    rule (std * n^(-1/5)), the seaborn default, so the curve shape matches
    the reference's overlay.

    Returns [] when the column is empty or constant (no density to draw),
    mirroring seaborn's silent skip.
    """
    from pyspark.mllib.stat import KernelDensity

    s = (
        df.where(F.col(col).isNotNull())
        .agg(
            F.count(col).alias("n"),
            F.stddev(F.col(col).cast("double")).alias("sd"),
            F.min(F.col(col).cast("double")).alias("lo"),
            F.max(F.col(col).cast("double")).alias("hi"),
        )
        .first()
    )
    n, sd, lo, hi = s["n"], s["sd"], s["lo"], s["hi"]
    if not n or n < 2 or sd is None or sd == 0.0 or lo == hi:
        return []
    bw = float(sd) * float(n) ** (-0.2)
    kd = KernelDensity()
    kd.setSample(
        df.where(F.col(col).isNotNull())
        .select(F.col(col).cast("double"))
        .rdd.map(lambda r: r[0])
    )
    kd.setBandwidth(bw)
    xs = [lo + (hi - lo) * i / (n_points - 1) for i in range(n_points)]
    ys = kd.estimate(xs)
    return [(float(x), float(y)) for x, y in zip(xs, ys)]
