"""Mergeable-sketch operators — the Mimir combiner story taken to its
logical end: a sketch IS a combiner state that never grows with the
key space.

`heavy_hitters_cms` builds a count-min sketch. The point at 100 TB:
the shuffle carries D·W fixed cells (map-side partial sums merge
cell-wise — sketches are commutative monoids), NEVER a per-word
shuffle; word identity only re-enters for the (much smaller) candidate
set queried against the broadcast sketch. Hashing is the repo's
engine-portable polynomial hash so the whole pipeline is
value-checkable against the DuckDB oracle (production swaps in
xxhash64 for the JVM fast path; the plan shape is identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mimir_spark.functions.text import portable_token_hash
from mimir_spark.operators.core import tokens
from mimir_spark.sources.tables import load_table

CMS_D = 4  # rows (independent hash functions)
CMS_W = 32  # buckets per row — deliberately small so collisions are real
# fixed odd universal-hash coefficients: bucket_i = ((a·h0 + b) mod M) mod W
CMS_COEFFS = [(3, 7), (5, 11), (13, 17), (19, 23)]
CMS_MERSENNE = (1 << 31) - 1
HH_THRESHOLD = 900  # absolute count threshold at the oracle SF (0.01)


def _cms_cells(h0: F.Column) -> F.Column:
    return F.array(
        *[
            F.struct(
                F.lit(d).cast("long").alias("d"),
                (((F.lit(a) * h0 + F.lit(b)) % CMS_MERSENNE) % CMS_W).alias(
                    "bucket"
                ),
            )
            for d, (a, b) in enumerate(CMS_COEFFS)
        ]
    )


def heavy_hitters_cms(
    spark: SparkSession, sf_dir: str, threshold: int = HH_THRESHOLD
) -> DataFrame:
    """Heavy hitters via count-min sketch: report every word whose
    CMS estimate reaches `threshold`, with the estimate next to the
    true count (est ≥ true by construction — CMS only overestimates).

    Plan: one token scan builds the sketch (explode D cells per
    occurrence → groupBy(d, bucket): the shuffle is D·W rows whatever
    the corpus size). The query side joins the candidate vocabulary
    against the BROADCAST sketch (D·W rows) and takes the min cell per
    word. The true-count column is the verification twin computed the
    classic way; at 100 TB you'd keep only the sketch side and query
    it for the (tiny) candidate set.
    """
    docs = load_table(spark, sf_dir, "documents")
    occ = tokens(docs).select(
        "word", portable_token_hash(F.col("word")).alias("h0")
    )
    sketch = (
        occ.select(F.explode(_cms_cells(F.col("h0"))).alias("c"))
        .groupBy("c.d", "c.bucket")
        .agg(F.count("*").alias("cnt"))
    )
    words = occ.groupBy("word", "h0").agg(
        F.count("*").cast("long").alias("true_count")
    )
    est = (
        words.select(
            "word",
            "true_count",
            F.explode(_cms_cells(F.col("h0"))).alias("c"),
        )
        .select("word", "true_count", F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
        .join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("word", "true_count")
        .agg(F.min("cnt").alias("est_count"))
    )
    return est.filter(F.col("est_count") >= threshold).select(
        "word", "est_count", "true_count"
    )


HLL_M = 256  # registers (p=8)
HLL_WBITS = 22  # width of the rho window: MOD // HLL_M < 2^22


def hll_registers(df: DataFrame, key_cols: list[str], item: F.Column) -> DataFrame:
    """HyperLogLog register table for `item` within each key group:
    one row per (keys, register j) with the max rho observed.

    This IS the mergeable sketch state: registers combine by cell-wise
    max, so partial register tables from any split of the data (map
    tasks, micro-batches, distributed partial aggs) merge into the
    same table — Catalyst's partial aggregation does exactly that
    here, and the shuffle carries at most |keys|·m rows regardless of
    input size. Hashing is the portable polynomial hash over the
    item's decimal string so the DuckDB oracle reproduces registers
    bit-for-bit (production would swap in xxhash64).
    """
    h0 = portable_token_hash(item.cast("string"))
    j = (h0 % HLL_M).alias("j")
    w = F.floor(h0 / HLL_M)
    rho = (
        F.when(w > 0, F.lit(HLL_WBITS) - F.floor(F.log2(w)))
        .otherwise(F.lit(HLL_WBITS + 1))
        .cast("long")
        .alias("rho")
    )
    return df.select(*key_cols, j, rho).groupBy(*key_cols, "j").agg(
        F.max("rho").alias("m_j")
    )


def hll_estimate(reg: DataFrame, key_cols: list[str]) -> DataFrame:
    """Finalize an HLL register table into per-key cardinality
    estimates. The harmonic mean's Z is accumulated as an EXACT
    integer (Σ 2^(30−M_j), absent registers contribute 2^30) so the
    only floating-point steps are one literal-for-literal identical
    expression on both engines — keeping the estimate value-hashable
    against the oracle. Small-range (linear-counting) correction
    included. Everything here is registers-sized: |keys|·m rows."""
    per_key = reg.groupBy(*key_cols).agg(
        F.count("*").cast("long").alias("n_present"),
        F.sum(F.expr("shiftleft(1L, cast(30 - m_j AS INT))"))
        .cast("long")
        .alias("z_present"),
    )
    z_int = (
        F.col("z_present")
        + (F.lit(HLL_M) - F.col("n_present")) * F.lit(1 << 30).cast("long")
    ).alias("z_int")
    with_z = per_key.select(*key_cols, "n_present", z_int).withColumn(
        "v_zero", (F.lit(HLL_M) - F.col("n_present")).cast("long")
    )
    # identical literal arithmetic on both engines: e-notation literals
    # are DOUBLE in Spark SQL and DuckDB alike (plain 0.7213 would be
    # DECIMAL in both, with engine-specific scale rules).
    raw = "7213e-4 / (1e0 + 1079e-3 / 256e0) * 65536e0 * 1073741824e0 / z_int"
    return with_z.withColumn(
        "est_distinct",
        F.expr(
            f"round(CASE WHEN v_zero > 0 AND {raw} <= 640e0 "
            f"THEN 256e0 * ln(256e0 / v_zero) ELSE {raw} END, 4)"
        ),
    ).select(*key_cols, "n_present", "v_zero", "est_distinct")


def hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type via a portable
    HyperLogLog(m=256), reported next to the exact count (the
    verification twin — at 100 TB you keep only the sketch side).

    Plan: one scan builds registers (groupBy(event_type, j), map-side
    combined — the shuffle is ≤ |types|·256 rows however large events
    is); the finalize step and the estimate are registers-sized. The
    exact-count twin is the one corpus-sized distinct. Mimir parity:
    this is the `uniq` workload as a fixed-size combiner state.
    Streaming twin: streaming/hll.py merges per-batch registers into
    the identical estimate."""
    ev = load_table(spark, sf_dir, "events")
    reg = hll_registers(ev, ["event_type"], F.col("user_id"))
    est = hll_estimate(reg, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("true_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type", "n_present", "v_zero", "est_distinct", "true_distinct"
    )


HIST_BIN_WIDTH = 25.0
QUANTS = (0.5, 0.9, 0.99)


def quantiles_from_histogram(
    hist: DataFrame,
    bin_width: float = HIST_BIN_WIDTH,
    qs: tuple[float, ...] = QUANTS,
) -> DataFrame:
    """Quantile estimates from a fixed-width histogram sketch
    (columns bin, cnt): for each q, rank = max(ceil(q·N), 1), find the
    bin holding that rank via the cumulative walk, interpolate
    linearly inside the bin. Everything after the histogram is
    bins-sized: the cumulative window runs over O(bins) rows in one
    task (bounded by construction, not by data volume) and the
    rank-to-bin match is a 3-row broadcast against the bins — the
    histogram is the only corpus-sized pass."""
    spark = hist.sparkSession
    # single-partition cumulative walk over the O(bins) table —
    # bounded by construction (the warning it logs is cosmetic and
    # silenced at the harness logger; see bench.py)
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.select(
        "bin",
        "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("long").alias("cum_prev"),
    )
    total = hist.agg(F.sum("cnt").cast("long").alias("n"))
    qdf = spark.createDataFrame([(q,) for q in qs], "q double")
    ranks = qdf.crossJoin(F.broadcast(total)).select(
        "q",
        F.greatest(F.ceil(F.col("q") * F.col("n")), F.lit(1))
        .cast("long")
        .alias("rank_n"),
    )
    return (
        F.broadcast(ranks)
        .join(
            cum,
            (F.col("cum_prev") < F.col("rank_n"))
            & (F.col("cum_prev") + F.col("cnt") >= F.col("rank_n")),
        )
        .select(
            "q",
            "rank_n",
            F.round(
                F.col("bin") * F.lit(bin_width)
                + F.lit(bin_width)
                * (F.col("rank_n") - F.col("cum_prev"))
                / F.col("cnt"),
                6,
            ).alias("est"),
        )
    )


def histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p90/p99 of events.value from the fixed-width
    histogram — the mergeable-sketch twin of `median_order_value`'s
    exact path and the finalizer shared with the streaming histogram
    (streaming/quantiles.py): histograms add cell-wise, so partial
    histograms from any split of the stream merge into exactly this
    result."""
    from mimir_spark.operators.core import histogram

    hist = histogram(spark, sf_dir, bin_width=HIST_BIN_WIDTH).select(
        "bin", "cnt"
    )
    return quantiles_from_histogram(hist)


# DDSketch (Masson, Rim & Lee, VLDB 2019): log-scaled buckets give a
# RELATIVE-error guarantee (|est - true| <= alpha * true) with no
# prior knowledge of the value range — the fixed-width histogram above
# needs the range; this one only needs positivity. Literals are
# written in e-notation so gamma = (1+a)/(1-a) is the identical DOUBLE
# on both engines.
DD_GAMMA_SQL = "101e-2 / 99e-2"  # alpha = 0.01


def ddsketch_buckets(df: DataFrame, value: str = "value") -> DataFrame:
    """value column → log-bucket count table. Buckets are
    ceil(ln(x)/ln(gamma)): O(ln(range)/alpha) of them regardless of
    row count, and counts add cell-wise (mergeable monoid, like the
    fixed-width histogram)."""
    b = F.expr(
        f"cast(ceil(ln({value}) / ln({DD_GAMMA_SQL})) AS BIGINT)"
    ).alias("bucket")
    return (
        df.filter(F.col(value) > 0)
        .select(b)
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def quantiles_from_ddsketch(
    sk: DataFrame, qs: tuple[float, ...] = QUANTS
) -> DataFrame:
    """Quantile estimates from a DDSketch bucket table: rank walk over
    the O(buckets) cumulative (single bounded task), estimate is the
    bucket's geometric midpoint 2*gamma^b/(gamma+1) — identical literal
    arithmetic on both engines."""
    spark = sk.sparkSession
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    cum = sk.select(
        "bucket",
        "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("long").alias("cum_prev"),
    )
    total = sk.agg(F.sum("cnt").cast("long").alias("n"))
    qdf = spark.createDataFrame([(q,) for q in qs], "q double")
    ranks = qdf.crossJoin(F.broadcast(total)).select(
        "q",
        F.greatest(F.ceil(F.col("q") * F.col("n")), F.lit(1))
        .cast("long")
        .alias("rank_n"),
    )
    g = DD_GAMMA_SQL
    return (
        F.broadcast(ranks)
        .join(
            cum,
            (F.col("cum_prev") < F.col("rank_n"))
            & (F.col("cum_prev") + F.col("cnt") >= F.col("rank_n")),
        )
        .select(
            "q",
            "rank_n",
            F.expr(
                f"round(2e0 * pow({g}, bucket) / ({g} + 1e0), 6)"
            ).alias("est"),
        )
    )


def ddsketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of events.value from a DDSketch — the
    relative-error twin of `histogram_quantiles` (1% guaranteed
    relative error vs the histogram's fixed absolute bin width).
    Finalizer shared with streaming/ddsketch.py, so stream and batch
    estimates are bit-identical."""
    ev = load_table(spark, sf_dir, "events")
    return quantiles_from_ddsketch(ddsketch_buckets(ev, "value"))


# ---- Rank-error quantiles: deterministic bottom-k sample sketch ---------
#
# DDSketch above guarantees RELATIVE-VALUE error; selecting a p99.9
# length/quality cutoff needs RANK error (the estimate's true rank
# within eps*n of the target). The compact rank sketches of the
# literature (KLL, Karnin-Lang-Liberman FOCS 2016; t-digest) interleave
# randomized compactions whose output depends on how the data was
# partitioned - correct within their error bounds, but impossible to
# value-hash-pin across engines or partitionings (see kll_quantiles
# below for the real thing under the weaker gate). This sketch gets the
# same rank-error CLASS with a state that is a pure function of the
# data SET: the sample is the k rows with the smallest multiplicative
# hash of their unique id - a uniform random sample in the hash's
# randomness, reproducible everywhere, and "k smallest of a union" is
# recoverable from "k smallest of each part" (the TakeOrdered monoid
# the streaming reservoir already relies on), so the streaming twin is
# bit-identical. By Dvoretzky-Kiefer-Wolfowitz, the sampled empirical
# CDF is within eps of the true CDF everywhere with prob
# >= 1 - 2*exp(-2*k*eps^2): k=4096 gives ~2.4% rank error at 99%
# confidence; at 100 TB you raise k (65536 ~ 0.6%) - the shuffle is
# k*partitions rows however large the corpus.

RQ_K = 4096
_RQ_MULT = 2654435761  # Knuth multiplicative hash, shared with pipeline.py
_RQ_MOD = 4294967296


def bottomk_sample(
    df: DataFrame, id_col: str = "event_id", value_col: str = "value",
    k: int = RQ_K,
) -> DataFrame:
    """The k rows with the smallest hash(id): orderBy+limit plans as
    distributed TakeOrdered (per-partition k-heaps, k-sized merge) -
    the corpus is scanned once and only k*partitions rows move."""
    return (
        df.select(F.col(id_col).alias("sid"), F.col(value_col).alias("value"))
        .withColumn("u", (F.col("sid") * F.lit(_RQ_MULT)) % F.lit(_RQ_MOD))
        .orderBy("u", "sid")
        .limit(k)
    )


def quantiles_from_bottomk(
    sample: DataFrame, qs: tuple[float, ...] = QUANTS
) -> DataFrame:
    """Quantile estimates from the bottom-k sample: rank
    max(ceil(q*m), 1) within the value-ordered sample (tie-break by
    id - fully deterministic). Everything here is k-bounded: the
    ordering window runs over <= k rows in one task, same class as the
    DDSketch cumulative walk. Shared with the streaming twin so stream
    and batch estimates are bit-identical."""
    spark = sample.sparkSession
    m = sample.agg(F.count("*").cast("long").alias("n_sample"))
    qdf = spark.createDataFrame([(q,) for q in qs], "q double")
    ranks = qdf.crossJoin(F.broadcast(m)).select(
        "q",
        "n_sample",
        F.greatest(F.ceil(F.col("q") * F.col("n_sample")), F.lit(1))
        .cast("long")
        .alias("rk"),
    )
    ranked = sample.select(
        "value",
        F.row_number()
        .over(Window.orderBy("value", "sid"))  # k-bounded sample
        .cast("long")
        .alias("rk"),
    )
    return F.broadcast(ranks).join(ranked, "rk").select(
        "q", "n_sample", F.round("value", 6).alias("est")
    )


def rank_quantiles(spark: SparkSession, sf_dir: str, k: int = RQ_K) -> DataFrame:
    """p50/p90/p99 of events.value with a RANK-error guarantee from
    the deterministic bottom-k sample sketch (see block comment).
    Output: (q, n_sample, est); est is an actual data value, so the
    estimate itself value-hashes identically on the DuckDB oracle."""
    ev = load_table(spark, sf_dir, "events")
    return quantiles_from_bottomk(bottomk_sample(ev, k=k))


# ---- KLL: the real compactor-cascade rank sketch (rows-only gate) -------

KLL_K = 200


def _kll_cap(level: int, top: int, k: int) -> int:
    # Geometric capacity decay toward lower levels (the KLL trick that
    # beats MRL's uniform buffers): c_l = k * (2/3)^(top - l), floor 2.
    import math

    return max(2, int(math.ceil(k * (2.0 / 3.0) ** (top - level))))


def _kll_compact(levels: dict[int, list], k: int, rng) -> None:
    """Compact in place until every level fits its capacity budget:
    repeatedly sort the lowest over-capacity level and promote every
    second item (random offset) to the level above - each promoted
    item's implicit weight doubles, total weight is conserved."""
    while True:
        top = max(levels)
        over = [
            l
            for l in sorted(levels)
            if len(levels[l]) > _kll_cap(l, top, k)
        ]
        if not over:
            return
        l = over[0]
        items = sorted(levels[l])
        off = rng.randrange(2)
        levels[l] = []
        levels.setdefault(l + 1, []).extend(items[off::2])


def kll_quantiles(
    spark: SparkSession,
    sf_dir: str,
    k: int = KLL_K,
    qs: tuple[float, ...] = QUANTS,
) -> DataFrame:
    """p50/p90/p99 of events.value from a TRUE KLL sketch
    (Karnin, Lang & Liberman, "Optimal quantile approximation in
    streams", FOCS 2016): per-partition compactor cascades built in
    one corpus pass (mapInPandas - each partial is O(k) items with
    level-encoded weights), merged level-wise and re-compacted by a
    single bounded finalizer task, estimates read off the weighted
    cumulative. Rank error ~ O(1/k) at fixed confidence - the sketch
    you reach for when the bottom-k sample's O(1/sqrt(k)) is too
    coarse for the state budget.

    Honesty note on the gate: compaction discards every second item of
    a buffer whose CONTENT depends on which rows shared a partition,
    so the estimate is deterministic only per plan, not per data SET -
    it cannot be value-hash-pinned cross-engine (rows-only key; the
    unit test pins every estimate's TRUE rank within the theoretical
    envelope instead). `rank_quantiles` above is the hash-pinnable
    sibling."""
    import random

    import numpy as np
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select("value")

    def _partials(batches):
        levels: dict[int, list] = {0: []}
        rng = random.Random(0xC0FFEE)
        for pdf in batches:
            levels[0].extend(float(v) for v in pdf["value"])
            _kll_compact(levels, k, rng)
        rows = [
            (l, v) for l, items in levels.items() for v in items
        ]
        if rows:
            yield pd.DataFrame(rows, columns=["level", "value"]).astype(
                {"level": np.int64, "value": np.float64}
            )

    partial = ev.mapInPandas(_partials, "level long, value double")

    def _finalize(key, pdf):
        levels: dict[int, list] = {0: []}
        for l, grp in pdf.groupby("level"):
            levels.setdefault(int(l), []).extend(float(v) for v in grp["value"])
        rng = random.Random(0xC0FFEE)
        _kll_compact(levels, k, rng)
        vals = np.array(
            [v for l, items in levels.items() for v in items], dtype=np.float64
        )
        wts = np.array(
            [1 << l for l, items in levels.items() for _ in items],
            dtype=np.float64,
        )
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        n = cum[-1] if len(cum) else 0.0
        out = []
        for q in qs:
            target = max(q * n, 1.0)
            i = int(np.searchsorted(cum, target, side="left"))
            out.append((q, int(n), round(float(vals[min(i, len(vals) - 1)]), 6)))
        return pd.DataFrame(out, columns=["q", "n_total", "est"])

    return partial.groupBy(F.lit("all").alias("g")).applyInPandas(
        _finalize, "q double, n_total long, est double"
    )


# ---- t-digest: tail-accurate mergeable centroid sketch (rows-only) ------

TDIGEST_DELTA = 100


def _tdigest_compress(means, weights, delta: int):
    """Greedy merging t-digest compression (Dunning & Ertl): inputs
    sorted by mean; adjacent runs merge while the k1 scale function
    k1(q) = (delta/2pi)*asin(2q-1) advances by <= 1 across the merged
    centroid. k1's slope explodes at q -> 0/1, so tail centroids stay
    tiny - the property that makes t-digest's relative rank error
    TIGHTEST at the extreme quantiles (p99.9 cutoffs), where KLL's
    uniform guarantee is loosest."""
    import math

    import numpy as np

    n = float(weights.sum())

    def k1(q):
        return (delta / (2.0 * math.pi)) * math.asin(
            max(-1.0, min(1.0, 2.0 * q - 1.0))
        )

    out_m, out_w = [], []
    q0 = 0.0
    cur_m, cur_w = float(means[0]), float(weights[0])
    for m, w in zip(means[1:], weights[1:]):
        if k1(q0 + (cur_w + w) / n) - k1(q0) <= 1.0:
            cur_m = (cur_m * cur_w + float(m) * float(w)) / (cur_w + w)
            cur_w += float(w)
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            q0 += cur_w / n
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.array(out_m), np.array(out_w)


def tdigest_quantiles(
    spark: SparkSession,
    sf_dir: str,
    delta: int = TDIGEST_DELTA,
    qs: tuple[float, ...] = QUANTS,
) -> DataFrame:
    """p50/p90/p99 of events.value from a merging t-digest: per-Arrow-
    batch partial digests (O(delta) centroids each) via mapInPandas,
    merged by sort-and-recompress in one bounded finalizer task,
    estimates by interpolation between centroid means. Unlike KLL,
    merging preserves total weight EXACTLY (n_total = true row count),
    and the scale function concentrates resolution in the tails.

    Same honest gate note as kll_quantiles: centroid means depend on
    which rows shared a batch, so the estimate is deterministic only
    per plan - rows-only key, pinned by a rank-envelope test;
    `rank_quantiles` remains the hash-pinnable sibling."""
    import numpy as np
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select("value")

    def _partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.sort(pdf["value"].to_numpy(np.float64), kind="stable")
            m, w = _tdigest_compress(v, np.ones_like(v), delta)
            yield pd.DataFrame({"mean": m, "weight": w})

    partial = ev.mapInPandas(_partials, "mean double, weight double")

    def _finalize(key, pdf):
        order = np.argsort(pdf["mean"].to_numpy(np.float64), kind="stable")
        means = pdf["mean"].to_numpy(np.float64)[order]
        weights = pdf["weight"].to_numpy(np.float64)[order]
        m, w = _tdigest_compress(means, weights, delta)
        n = w.sum()
        cum = np.cumsum(w)
        centers = cum - w / 2.0
        out = []
        for q in qs:
            r = q * n
            est = float(np.interp(r, centers, m))
            out.append((q, int(round(n)), round(est, 6)))
        return pd.DataFrame(out, columns=["q", "n_total", "est"])

    return partial.groupBy(F.lit("all").alias("g")).applyInPandas(
        _finalize, "q double, n_total long, est double"
    )

def _quantile_band(
    spark: SparkSession,
    sf_dir: str,
    est_df: DataFrame,
    rank_eps: float,
    n_tol_frac: float,
    n_tol_abs: float,
    qs: tuple[float, ...] = QUANTS,
) -> DataFrame:
    """Tolerance-band driver contract for the plan-dependent quantile
    sketches (the approx_distinct/approx_quantiles move): the sketch
    ESTIMATE cannot be value-hashed cross-engine (compaction/centroid
    content depends on partition boundaries), but its published rank
    envelope CAN be verified exactly — the hashed columns are the
    exact side (row count + interpolated percentiles) plus flags
    asserting the estimate's TRUE rank (count of values ≤ est,
    computed against the data) sits within rank_eps of its target and
    the sketch's weight within the n tolerance. The raw estimates
    stay available through the Python API (kll_quantiles /
    tdigest_quantiles call paths); the flags promote the pytest rank
    envelope to the driver gate."""
    ev = load_table(spark, sf_dir, "events").select("value")
    exact = ev.agg(
        F.count("*").alias("n"),
        *[
            F.expr(f"percentile(value, {q})").alias(f"p{i}")
            for i, q in enumerate(qs)
        ],
    )
    ranks = (
        ev.join(F.broadcast(est_df))
        .groupBy("q", "n_total", "est")
        .agg(
            F.sum((F.col("value") <= F.col("est")).cast("long")).alias("rk")
        )
    )
    exact_val = F.when(F.col("q") == qs[0], F.col("p0"))
    for i, q in enumerate(qs[1:-1], start=1):
        exact_val = exact_val.when(F.col("q") == q, F.col(f"p{i}"))
    exact_val = exact_val.otherwise(F.col(f"p{len(qs) - 1}"))
    return ranks.join(F.broadcast(exact)).select(
        "q",
        F.col("n").alias("n_exact"),
        F.round(exact_val, 4).alias("exact_value"),
        (
            F.abs(F.col("rk") / F.col("n") - F.col("q"))
            <= F.lit(rank_eps)
        )
        .cast("long")
        .alias("rank_ok"),
        (
            F.abs(F.col("n_total") - F.col("n"))
            <= F.lit(n_tol_frac) * F.col("n") + F.lit(n_tol_abs)
        )
        .cast("long")
        .alias("n_ok"),
    )


def kll_quantiles_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable projection of kll_quantiles: the pytest rank
    envelope (5% rank error, weight within 2%+2 — generous vs the
    ~1-2% typical at k=200) verified exactly and hashed alongside the
    exact percentiles."""
    return _quantile_band(
        spark, sf_dir, kll_quantiles(spark, sf_dir), 0.05, 0.02, 2.0
    )


def tdigest_quantiles_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable projection of tdigest_quantiles: 3% rank
    envelope and EXACT weight conservation (merging preserves total
    weight, unlike KLL's odd-buffer truncation)."""
    return _quantile_band(
        spark, sf_dir, tdigest_quantiles(spark, sf_dir), 0.03, 0.0, 0.0
    )


# ---- KMV (k-minimum-values / theta-sketch) set operations ------------------

KMV_K = 256
# word_shingle_hashes values are uniform on [0, M31): mod-2147483647
# arithmetic. (K-1)*M precomputed as ONE exact double literal so both
# engines evaluate the identical division.
KMV_KM = float((KMV_K - 1) * 2_147_483_647)


def kmv_source_setops(
    spark: SparkSession, sf_dir: str, k: int = KMV_K
) -> DataFrame:
    """Cross-source distinct-set algebra WITHOUT the cross-source
    distinct: per-source KMV (bottom-k / theta) sketches over hashed
    3-word shingles, then pairwise union / intersection / difference
    cardinality ESTIMATES from sketch combination alone (Beyer et al.
    SIGMOD'07; the DataSketches theta-sketch set-op story).

    Why this matters at 100 TB: the exact twin
    (cross_source_duplication) joins distinct shingle sets ACROSS
    sources — a corpus-sized shuffle per pair. Here the only
    corpus-sized stage is one explode → distinct(source, h) with
    map-side partial dedup; the per-source bottom-k runs as
    WindowGroupLimit per-partition heaps (rank ≤ k never materializes
    a full sort), and everything downstream touches |sources|·k rows.
    Sketches are mergeable monoids: bottom-k(A ∪ B) is computable from
    bottom-k(A) ∪ bottom-k(B), so the pair stage never re-reads data.

    Estimators (all exact-integer ratios → identical IEEE doubles in
    both engines, hence value-hashable): |S| ≈ (k−1)·M / h_(k);
    J(A,B) ≈ |union-sketch ∩ A-sketch ∩ B-sketch| / k;
    |A∩B| ≈ J · |A∪B|; |A∖B| ≈ max(|A∪B| − |B|, 0). A sketch smaller
    than k IS its set — estimates collapse to exact counts.
    """
    docs = load_table(spark, sf_dir, "documents")
    return kmv_pairwise(kmv_sketch(docs, k), k)


def kmv_sketch(docs: DataFrame, k: int = KMV_K) -> DataFrame:
    """Per-source bottom-k distinct shingle hashes as (source, h) rows
    — the mergeable KMV state: bottom-k over ANY union of partial
    bottom-k tables equals bottom-k over the union of the raw sets
    (every global bottom-k member survives its own partial's cut),
    which is what lets the streaming twin merge per-batch partials."""
    from mimir_spark.functions.text import word_shingle_hashes

    hs = (
        docs.select(
            "source", F.explode(word_shingle_hashes("text")).alias("h")
        )
        .distinct()
    )
    w = Window.partitionBy("source").orderBy("h")
    return (
        hs.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .select("source", "h")
    )


def kmv_pairwise(sk_rows: DataFrame, k: int = KMV_K) -> DataFrame:
    """Pairwise set-operation estimates from a (source, h) sketch-row
    table — the |sources|·k-sized tail of kmv_source_setops, shared
    with the streaming finalizer."""
    sk = sk_rows.groupBy("source").agg(
        F.sort_array(F.collect_list("h")).alias("arr")
    )
    a = sk.select(F.col("source").alias("source_a"), F.col("arr").alias("arr_a"))
    b = sk.select(F.col("source").alias("source_b"), F.col("arr").alias("arr_b"))
    pairs = a.join(b, F.col("source_a") < F.col("source_b"))

    km = float((k - 1) * 2_147_483_647)  # == KMV_KM at the default k

    def est(arr: F.Column) -> F.Column:
        # kth smallest of a sorted ascending array; exhausted → exact.
        return F.when(
            F.size(arr) < k, F.size(arr).cast("double")
        ).otherwise(F.lit(km) / F.element_at(arr, k).cast("double"))

    merged = F.array_sort(F.array_union("arr_a", "arr_b"))
    out = (
        pairs.withColumn("merged", merged)
        .withColumn("union_k", F.slice("merged", 1, k))
        .withColumn("k_used", F.least(F.lit(k), F.size("merged")).cast("int"))
        .withColumn("est_a", F.round(est(F.col("arr_a")), 4))
        .withColumn("est_b", F.round(est(F.col("arr_b")), 4))
        .withColumn("union_est", F.round(est(F.col("merged")), 4))
        .withColumn(
            "shared",
            F.size(
                F.array_intersect(
                    F.array_intersect("union_k", "arr_a"), "arr_b"
                )
            ),
        )
        .withColumn(
            "j_raw",
            F.col("shared").cast("double") / F.col("k_used").cast("double"),
        )
        .withColumn("jaccard_est", F.round("j_raw", 6))
        # inter_est multiplies the RAW (unrounded) jaccard and union:
        # a product of two rounded decimals is often an EXACT .xxxx5
        # half, where Spark's shortest-decimal HALF_UP and DuckDB's
        # exact-binary round deterministically disagree; the raw
        # quotient product is never a representable half.
        .withColumn(
            "inter_est",
            F.round(F.col("j_raw") * est(F.col("merged")), 4),
        )
        .withColumn(
            "diff_ab_est",
            F.round(
                F.greatest(F.col("union_est") - F.col("est_b"), F.lit(0.0)), 4
            ),
        )
        .withColumn(
            "diff_ba_est",
            F.round(
                F.greatest(F.col("union_est") - F.col("est_a"), F.lit(0.0)), 4
            ),
        )
    )
    return out.select(
        "source_a",
        "source_b",
        "k_used",
        "est_a",
        "est_b",
        "union_est",
        "jaccard_est",
        "inter_est",
        "diff_ab_est",
        "diff_ba_est",
    )


WAU_WINDOW_DAYS = 7


def wau_hll_sliding(
    spark: SparkSession,
    sf_dir: str,
    window_days: int = WAU_WINDOW_DAYS,
    verify: bool = True,
) -> DataFrame:
    """Trailing-7-day active users per day ("WAU") by HLL REGISTER
    RE-AGGREGATION — the sketch version of hypertable_rollup's
    cascade: daily register tables (one scan of events, ≤ days·m
    rows) are fanned to the ≤7 window end-days they serve and merged
    by cell-wise max, so the sliding distinct-count NEVER rescans the
    corpus and never unions raw user sets. Exactly the property that
    makes HLL the right WAU primitive at 100 TB: a day's registers
    are computed once, forever mergeable into any window.

    The exact trailing-window distinct (a days×events range join —
    a BroadcastNestedLoopJoin that rescans events per day) is the
    VERIFICATION twin only, gated behind verify=True: the driver's
    oracle contract keeps it on, but the production path at 100 TB is
    verify=False, which is pure register algebra — no range join, no
    corpus rescans (plan-pinned: zero BroadcastNestedLoopJoin).
    Output: (day, n_present, v_zero, est_distinct[, true_wau]).
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.floor(F.unix_timestamp("ts") / 86400).cast("long")
    keyed = ev.select(day.alias("day"), "user_id")
    reg_daily = hll_registers(keyed, ["day"], F.col("user_id"))
    fanned = reg_daily.select(
        F.explode(
            F.sequence(
                F.col("day"), F.col("day") + F.lit(window_days - 1)
            )
        ).alias("day"),
        "j",
        "m_j",
    )
    merged = fanned.groupBy("day", "j").agg(F.max("m_j").alias("m_j"))
    est = hll_estimate(merged, ["day"])
    days = keyed.select("day").distinct()
    if not verify:
        # the fan-out manufactures window end-days past the last
        # observed day; restrict to the observed-day spine (O(days)
        # rows, broadcast) exactly as the verify twin's join does.
        return est.join(F.broadcast(days), "day", "left_semi").select(
            "day", "n_present", "v_zero", "est_distinct"
        )
    exact = (
        days.alias("d")
        .join(
            keyed.alias("e"),
            (F.col("e.day") <= F.col("d.day"))
            & (F.col("e.day") >= F.col("d.day") - F.lit(window_days - 1)),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("e.user_id").cast("long").alias("true_wau"))
    )
    return est.join(exact, "day").select(
        "day", "n_present", "v_zero", "est_distinct", "true_wau"
    )
