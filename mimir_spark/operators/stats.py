"""Statistical analytics over the relational tables — the descriptive-
stats surface a MapReduce analytics stack exposes as reduce-side
kernels (Mimir's `reduce` callbacks computing moments; cf. the
MapReduce-MPI examples), re-expressed as Spark's built-in declarative
aggregates so they run JVM-side with map-side partials:

- `corr_matrix`: pairwise Pearson correlation among the lineitem
  numeric measures, long form (one row per ordered pair).
- `linreg_by_group`: per-group least-squares fit (slope, intercept,
  r²) of extendedprice on quantity via the `regr_*` aggregate family.
- `chi2_lang_source`: chi-square test of independence for the
  documents lang × source contingency table — observed counts vs
  expected under independence, plus the aggregated statistic and
  degrees of freedom.

Scale notes: every op is one scan + one partial-aggregated groupBy
(corr/regr are algebraic aggregates — Catalyst computes co-moments
map-side, merging constant-size state). chi2 builds the |lang|×|src|
contingency table (tiny) and derives marginals from it with windows
over the AGGREGATED table — the raw table is never re-scanned and no
driver collect happens anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mimir_spark.sources.tables import load_table

# The lineitem measures whose pairwise correlations we report.
_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation for every unordered pair of lineitem
    measures, long form: (x, y, corr, n).

    One scan, ONE aggregate row carrying all six co-moment states
    (corr is algebraic: count/mean/m2/co-moment merge associatively,
    so the map-side partial is 6 fixed-size states regardless of row
    count), then an explode to long form — at 100 TB this is exactly
    one reduce of constant-width state.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pairs = [
        (x, y) for i, x in enumerate(_CORR_COLS) for y in _CORR_COLS[i + 1 :]
    ]
    aggs = [
        F.round(F.corr(x, y), 6).alias(f"c_{x}_{y}") for x, y in pairs
    ] + [F.count(F.lit(1)).alias("n")]
    wide = li.agg(*aggs)
    stacked = wide.select(
        F.expr(
            "stack({n}, {args}) AS (x, y, corr)".format(
                n=len(pairs),
                args=", ".join(
                    f"'{x}', '{y}', c_{x}_{y}" for x, y in pairs
                ),
            )
        ),
        "n",
    )
    return stacked.select("x", "y", "corr", "n")


def linreg_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(returnflag, linestatus) OLS fit of extendedprice ~ quantity:
    slope, intercept, r², and the sample count.

    regr_slope/regr_intercept/regr_r2 are built-in algebraic
    aggregates in both Spark and DuckDB — the whole fit is map-side
    co-moment partials merged per group; no second pass, no Python.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
        F.round(
            F.regr_intercept("l_extendedprice", "l_quantity"), 6
        ).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.count(F.lit(1)).alias("n"),
    )


def chi2_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence scan of documents' lang × source.

    Pipeline: groupBy(lang, source) → contingency counts (the ONLY
    pass over the corpus); marginals and the grand total come from
    windows over that aggregated table (|lang|·|source| rows — a few
    dozen), so the heavy table is scanned once however large it is.
    Output: one row per cell with observed, expected (6dp) and the
    cell's chi² contribution, plus the total statistic and dof
    repeated per row (keeps the result a single flat DataFrame).
    """
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("obs"))
    w_lang = Window.partitionBy("lang")
    w_src = Window.partitionBy("source")
    w_all = Window.partitionBy()
    enriched = (
        cells.withColumn("row_total", F.sum("obs").over(w_lang))
        .withColumn("col_total", F.sum("obs").over(w_src))
        .withColumn("grand", F.sum("obs").over(w_all))
        .withColumn("n_lang", F.size(F.collect_set("lang").over(w_all)))
        .withColumn("n_src", F.size(F.collect_set("source").over(w_all)))
    )
    contrib = (
        F.col("obs")
        - F.col("row_total") * F.col("col_total") / F.col("grand")
    ) ** 2 / (F.col("row_total") * F.col("col_total") / F.col("grand"))
    scored = enriched.withColumn(
        "expected",
        F.round(F.col("row_total") * F.col("col_total") / F.col("grand"), 6),
    ).withColumn("contribution", F.round(contrib, 6))
    # chi² total from the ROUNDED contributions so both engines sum
    # identical addends (a handful of cells — order noise < 1e-9,
    # collapsed by the final round).
    return (
        scored.withColumn(
            "chi2", F.round(F.sum("contribution").over(w_all), 4)
        )
        .withColumn(
            "dof",
            ((F.col("n_lang") - 1) * (F.col("n_src") - 1)).cast("bigint"),
        )
        .select(
            "lang",
            "source",
            "obs",
            "expected",
            "contribution",
            "chi2",
            "dof",
        )
    )


# ---- Poisson-bootstrap confidence intervals (round 11) ---------------------

# Poisson(1) CDF thresholds for the inverse-CDF lookup: a replicate
# weight c is the smallest k with u < CDF(k). repr()-exact doubles so
# the oracle SQL compares the identical literals.
_POIS1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033253,
    0.999998874797402,
)
BOOT_B = 100
BOOT_M31 = 2147483647


def _boot_u(b: int) -> F.Column:
    """Replicate-b uniform for a row: the portable md5-31 hash of
    "event_id:b" — a pure function of the data, identical in every
    engine and partitioning. The mix must be NONLINEAR in (id, b): any
    affine scheme (id·M + b·S mod 2^k) makes every replicate the same
    base permutation shifted by a constant, so the 100 "replicates"
    are one draw repeated — the CI collapses around a biased point
    instead of around the mean (found by the bracketing pytest)."""
    s = F.concat(F.col("event_id").cast("string"), F.lit(f":{b}"))
    h = (
        F.conv(F.substring(F.md5(s), 1, 8), 16, 10)
        .cast("long")
        .bitwiseAND(F.lit(BOOT_M31))
    )
    return h / F.lit(float(BOOT_M31 + 1))


def _boot_weight(b: int) -> F.Column:
    """Poisson(1) replicate weight via inverse CDF on the hash
    uniform (capped at 9 — beyond the 1e-6 tail)."""
    u = _boot_u(b)
    c = F.lit(len(_POIS1_CDF))
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        c = F.when(u < F.lit(_POIS1_CDF[k]), F.lit(k)).otherwise(c)
    return c.cast("long")


def bootstrap_ci_poisson(
    spark: SparkSession, sf_dir: str, n_boot: int = BOOT_B
) -> DataFrame:
    """Distributed UNCERTAINTY QUANTIFICATION: a 95% bootstrap
    confidence interval for each event type's mean value, via the
    Poisson bootstrap (Chamandy, Muralidharan, Najmi & Naidu,
    "Estimating Uncertainty for Massive Data Streams", Google 2012) —
    the resampling scheme that works when the data can't be sampled
    WITH replacement globally: each row independently enters
    replicate b with Poisson(1) multiplicity, so a replicate is one
    weighted aggregate, not a shuffle of the corpus.

    Shape: ONE pass over events computing 2·B aggregates (Σc_b·x and
    Σc_b per replicate — all map-side combined, no row fan-out), then
    a B-sized per-type finalize: replicate means (6dp) ranked, the
    2.5%/97.5% elements picked exactly. Everything after the scan is
    |types|·B rows. Replicate weights are pure functions of
    (event_id, b) — deterministic across engines and partitionings.

    Output: event_type, n, mean (6dp), ci_lo, ci_hi (exact element
    picks of the rounded replicate means), ci_width."""
    ev = load_table(spark, sf_dir, "events")
    aggs = [
        F.count("*").cast("long").alias("n"),
        F.round(F.avg("value"), 6).alias("mean_value"),
    ]
    for b in range(n_boot):
        w = _boot_weight(b)
        aggs.append(F.sum(w * F.col("value")).alias(f"s{b}"))
        aggs.append(F.sum(w).cast("long").alias(f"c{b}"))
    wide = ev.groupBy("event_type").agg(*aggs)
    # replicate means, unpivoted to (type, b, m) — B rows per type
    pairs = []
    for b in range(n_boot):
        pairs.append(
            F.struct(
                F.lit(b).alias("b"),
                F.round(F.col(f"s{b}") / F.col(f"c{b}"), 6).alias("m"),
            )
        )
    narrow = wide.select(
        "event_type",
        "n",
        "mean_value",
        F.explode(F.array(*pairs)).alias("r"),
    ).select("event_type", "n", "mean_value", F.col("r.m").alias("m"))
    from pyspark.sql import Window

    # ties in m get arbitrary ranks, but the VALUE at any rank is
    # deterministic given the sorted multiset — which is all the
    # element picks read.
    rk = F.row_number().over(
        Window.partitionBy("event_type").orderBy(F.col("m"))
    )
    lo_rank = max(1, int(n_boot * 0.025))
    hi_rank = int(n_boot * 0.975)
    ranked = narrow.withColumn("rk", rk)
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.max("mean_value").alias("mean_value"),
            F.max(F.when(F.col("rk") == lo_rank, F.col("m"))).alias("ci_lo"),
            F.max(F.when(F.col("rk") == hi_rank, F.col("m"))).alias("ci_hi"),
        )
        .select(
            "event_type",
            "n",
            "mean_value",
            "ci_lo",
            "ci_hi",
            F.round(F.col("ci_hi") - F.col("ci_lo"), 6).alias("ci_width"),
        )
    )


# ---- CUSUM changepoint detection (round 11) --------------------------------

CUSUM_SLACK_SD = 0.5  # slack k, in per-type sd units
CUSUM_THRESHOLD_SD = 4.0  # alarm threshold h, in sd units


def cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tabular CUSUM drift detection (Page 1954) over each event
    type's HOURLY mean-value series — the classic changepoint monitor
    a data pipeline runs on ingest metrics: S⁺_t = max(0, S⁺_{t−1} +
    (x_t − μ − k)), alarming when either side exceeds h = 4σ.

    The recursion LOOKS like a sequential fold, but has the closed
    prefix form S⁺_t = c_t − min(0, min_{j≤t} c_j) with c the running
    sum of (x_t − μ − k) — so the whole detector is TWO window
    functions per side over the (tiny) hourly aggregate, no fold, no
    UDF; the heavy table is scanned once into the hourly rollup and
    every window runs over |types|·hours rows. Running sums accumulate
    in the identical per-partition order on both engines.

    Portability: hourly means, per-type μ and σ are order-dependent
    double aggregates, so each is ROUNDED 6dp before entering the
    recursion (the anomaly_zscore broadcast-threshold contract); the
    window arithmetic downstream is then identical decimals. Output:
    one row per (event_type, hour) with the statistic trace and alarm
    flags.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 3600).alias("hour"),
        )
        .agg(F.round(F.avg("value"), 6).alias("x"))
    )
    stats = hourly.groupBy("event_type").agg(
        F.round(F.avg("x"), 6).alias("mu"),
        F.round(F.stddev_samp("x"), 6).alias("sd"),
    )
    j = hourly.join(F.broadcast(stats), "event_type")
    # The running sums must be ORDER-INDEPENDENT to hash-match: DuckDB
    # evaluates window aggregates with segment trees (pairwise order),
    # Spark sequentially — float cumsums differ in final ulps. So the
    # recursion runs in EXACT 1e-8 integer units (the HLL integer-Z
    # move): d = 10·x7 − 10·mu7 − 5·sd7 with x7 = round(x·1e7), every
    # cumsum/min/compare an exact BIGINT op (|d| ≤ 1e11, 10³ steps —
    # far inside int64), floats re-enter only at emission.
    as7 = lambda c: F.round(F.col(c) * 1e7, 0).cast("long")  # noqa: E731
    ji = j.select(
        "event_type",
        "hour",
        "x",
        as7("x").alias("x7"),
        as7("mu").alias("mu7"),
        as7("sd").alias("sd7"),
    )
    w = Window.partitionBy("event_type").orderBy("hour")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    d_pos = 10 * F.col("x7") - 10 * F.col("mu7") - 5 * F.col("sd7")
    d_neg = 10 * F.col("mu7") - 10 * F.col("x7") - 5 * F.col("sd7")
    with_c = ji.select(
        "event_type",
        "hour",
        "x",
        "sd7",
        F.sum(d_pos).over(run).alias("c_pos"),
        F.sum(d_neg).over(run).alias("c_neg"),
    )
    s_pos = F.col("c_pos") - F.least(
        F.lit(0).cast("long"), F.min("c_pos").over(run)
    )
    s_neg = F.col("c_neg") - F.least(
        F.lit(0).cast("long"), F.min("c_neg").over(run)
    )
    h_int = 40 * F.col("sd7")  # 4σ in 1e-8 units — exact comparison
    return with_c.select(
        "event_type",
        F.col("hour").cast("long").alias("hour"),
        "x",
        # NO rounding: sp/sn are identical exact integers on both
        # engines, so the division yields the identical double —
        # while a 6dp round would sit exactly on the .5 grid whenever
        # the 5·sd7 term makes the sum a multiple of 50 (half-up vs
        # exact-binary rounding then diverge systematically).
        (s_pos / F.lit(1e8)).alias("s_pos"),
        (s_neg / F.lit(1e8)).alias("s_neg"),
        (s_pos > h_int).cast("long").alias("alarm_up"),
        (s_neg > h_int).cast("long").alias("alarm_down"),
    )


# ---- Theil-Sen robust trend (round 11) --------------------------------------


def theil_sen_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL-SEN robust trend per event type: the median of all
    pairwise slopes of the hourly mean-value series (29.3% breakdown
    point — one corrupted ingest day cannot flip the trend the way it
    flips the OLS fit in linreg_by_group), plus the standard
    median-residual intercept.

    Scale shape: the O(n²) pair join runs over the HOURLY ROLLUP
    (|types|·hours rows, bounded by the time span), never the raw
    events — the corpus is scanned once into the rollup and the pair
    space is (hours choose 2) per type regardless of event volume.

    Portability: hourly means are rounded 6dp; each slope is one
    division of those exact decimals by an exact integer hour gap —
    identical doubles in both engines — and the median is the LOWER
    median, an exact order-statistic pick ((n+1)÷2 under ORDER BY
    value) rather than an averaged midpoint, so no new float op is
    introduced. Output: (event_type, n_points, n_pairs, slope,
    intercept), 6dp.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 3600).alias("hour"),
        )
        .agg(F.round(F.avg("value"), 6).alias("x"))
        .localCheckpoint(eager=True)
    )
    a = hourly.select(
        "event_type", F.col("hour").alias("h1"), F.col("x").alias("x1")
    )
    b = hourly.select(
        "event_type", F.col("hour").alias("h2"), F.col("x").alias("x2")
    )
    pairs = a.join(b, "event_type").filter(F.col("h2") > F.col("h1"))
    slopes = pairs.select(
        "event_type",
        (
            (F.col("x2") - F.col("x1"))
            / (F.col("h2") - F.col("h1")).cast("double")
        ).alias("slope"),
    )
    w = Window.partitionBy("event_type").orderBy("slope")
    med_slope = (
        slopes.withColumn("rk", F.row_number().over(w))
        .withColumn("n_pairs", F.count("*").over(Window.partitionBy("event_type")))
        .filter(F.col("rk") == F.floor((F.col("n_pairs") + 1) / 2))
        .select("event_type", "slope", "n_pairs")
    )
    resid = hourly.join(F.broadcast(med_slope), "event_type").select(
        "event_type",
        "slope",
        "n_pairs",
        (F.col("x") - F.col("slope") * F.col("hour").cast("double")).alias(
            "r"
        ),
    )
    w2 = Window.partitionBy("event_type").orderBy("r")
    out = (
        resid.withColumn("rk", F.row_number().over(w2))
        .withColumn(
            "n_points", F.count("*").over(Window.partitionBy("event_type"))
        )
        .filter(F.col("rk") == F.floor((F.col("n_points") + 1) / 2))
    )
    return out.select(
        "event_type",
        F.col("n_points").cast("long").alias("n_points"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.round("slope", 6).alias("slope"),
        F.round("r", 6).alias("intercept"),
    )


# ---- additive seasonal decomposition (round 11) -----------------------------


def seasonal_decompose_hourly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Additive seasonal decomposition of each type's hourly series —
    x = μ + trend_day + seasonal_hod + residual, with the hour-of-day
    profile as the seasonal component (the classical-decomposition
    half of STL) and Hyndman's seasonality STRENGTH
    F_s = max(0, 1 − Var(resid)/Var(seas + resid)) as the headline
    diagnostic a pipeline alerts on.

    Plan: one corpus scan into the hourly rollup; everything after —
    daily means, the 24-slot profile, residual variances — aggregates
    over |types|·hours rows. Components stay EXACT decimal arithmetic
    (x, daily mean, seasonal slot all rounded 6dp; deviations are
    differences of rounded decimals), so the only order-dependent
    float ops are the two final variances, emitted at 6dp where
    engine ulp drift collapses.

    Output: one row per (event_type, hod) with the seasonal profile
    and the type-level strength/variances repeated.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 3600).alias("h"),
        )
        .agg(F.round(F.avg("value"), 6).alias("x"))
        .withColumn("day", F.floor(F.col("h") / 24))
        .withColumn("hod", (F.col("h") % 24).cast("int"))
    )
    # dmean stays UNROUNDED: the average of 6dp-grid values lands
    # exactly on decimal halves (k/24 with k ≡ 12 mod 24), where
    # Spark's HALF_UP and DuckDB's exact-binary round systematically
    # diverge — a raw double's downstream 6dp rounds only hit a
    # boundary at measure zero (the repo-wide float contract).
    daily = hourly.groupBy("event_type", "day").agg(
        F.avg("x").alias("dmean")
    )
    dev = hourly.join(daily, ["event_type", "day"]).withColumn(
        "dev", F.col("x") - F.col("dmean")
    )
    seas = dev.groupBy("event_type", "hod").agg(
        F.round(F.avg("dev"), 6).alias("seasonal"),
        F.count(F.lit(1)).cast("long").alias("n_obs"),
    )
    resid = dev.join(seas, ["event_type", "hod"]).withColumn(
        "resid", F.col("dev") - F.col("seasonal")
    )
    strength = resid.groupBy("event_type").agg(
        F.round(F.var_samp("resid"), 6).alias("var_resid"),
        F.round(F.var_samp("dev"), 6).alias("var_deseason"),
        F.round(
            F.greatest(
                F.lit(0.0),
                F.lit(1.0) - F.var_samp("resid") / F.var_samp("dev"),
            ),
            6,
        ).alias("strength"),
    )
    return seas.join(F.broadcast(strength), "event_type").select(
        "event_type",
        "hod",
        "seasonal",
        "n_obs",
        "var_resid",
        "var_deseason",
        "strength",
    )


ACF_LAGS = (1, 2, 3, 6, 12, 24)


def hourly_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUTOCORRELATION FUNCTION of each type's hourly mean series at
    the standard diagnostic lags (1,2,3,6,12,24 h) — the numeric
    periodicity check beside seasonal_decompose_hourly's strength
    (a 24 h cycle shows as acf(24) >> acf(12)); computed as Pearson
    corr over the (x_t, x_{t−lag}) pair set via a lag window, so the
    co-moment normalization cancels engine summation ulps exactly as
    in corr_matrix (6dp round).

    Plan: one corpus scan into the hourly rollup; one event_type
    window provides ALL lag columns (no self-joins); one aggregate
    per type emits every lag's corr from algebraic co-moment
    partials. Gaps in the hourly spine make a ROW lag the previous
    row's offset, not `lag` hours — so each pair also lags the HOUR
    column and keeps only calendar-true pairs (h_lag == hour − lag);
    pairs spanning a gap are dropped rather than re-indexed, and
    n_pairs is reported so thin series read as such.
    Output: (event_type, lag, n_pairs, acf).
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 3600).alias("hour"),
        )
        .agg(F.round(F.avg("value"), 6).alias("x"))
    )
    w = Window.partitionBy("event_type").orderBy("hour")
    cols = [
        F.lag("x", lag).over(w).alias(f"x_l{lag}") for lag in ACF_LAGS
    ] + [
        F.lag("hour", lag).over(w).alias(f"h_l{lag}") for lag in ACF_LAGS
    ]
    lagged = hourly.select("event_type", "hour", "x", *cols)
    parts = []
    for lag in ACF_LAGS:
        # keep only calendar-true pairs: the lagged row is exactly
        # `lag` hours earlier (gap-free stretch)
        valid = F.col(f"h_l{lag}") == F.col("hour") - lag
        parts.append(
            lagged.filter(valid).groupBy("event_type").agg(
                F.lit(lag).cast("long").alias("lag"),
                F.count(F.lit(1)).cast("long").alias("n_pairs"),
                F.round(F.corr("x", f"x_l{lag}"), 6).alias("acf"),
            )
        )
    out = parts[0]
    for p_df in parts[1:]:
        out = out.unionByName(p_df)
    return out.select("event_type", "lag", "n_pairs", "acf")


# ---- Holt-Winters (round 12) -------------------------------------------------

# Smoothing constants are EXACT binary rationals (1/4, 1/8, 1/4), so
# every fold step is a fixed sequence of exact-representable-constant
# IEEE ops — Spark's aggregate() and DuckDB's recursive CTE compute
# bit-identical doubles with NO per-step rounding (the kcenter
# sequential-fold contract), and only the EMITTED forecast rounds.
HW_ALPHA = 0.25
HW_BETA = 0.125
HW_GAMMA = 0.25
HW_SEASON = 24  # daily cycle on the hourly rollup


def holt_winters_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive HOLT-WINTERS (triple exponential smoothing; Winters
    1960) over each event type's hourly mean series — level + trend +
    24-hour seasonality, the forecasting step past holt_linear_user
    (no seasonality) and seasonal_decompose_hourly (no forecast).

    Recursion (simple-init variant: level₀ = x₁, trend₀ = 0, s ≡ 0):
        ŷ_t  = level + trend + s[h_t]          (one-step forecast)
        level' = α(x_t − s[h_t]) + (1−α)(level + trend)
        trend' = β(level' − level) + (1−β)trend
        s[h_t]' = γ(x_t − level') + (1−γ)s[h_t]
    with h_t = calendar hour-of-day (hour mod 24) — calendar-true
    seasonality, robust to gaps in the observed-hour spine (a gap
    skips updates; it never shifts which season cell a reading hits).

    Scale shape: one corpus scan into the (|types|·hours)-bounded
    hourly rollup; each type's whole recursion is ONE Catalyst
    aggregate fold over its sorted series array (state = level, trend,
    24 season cells — O(1) per step); output explodes back to one row
    per (event_type, hour). Nothing iterative ever touches raw events.
    Output: (event_type, hour, x, forecast, resid).
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour"),
    ).agg(F.round(F.avg("value"), 6).alias("x"))
    series = hourly.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("hour", "x"))).alias("ts")
    )

    a, b, g, m = HW_ALPHA, HW_BETA, HW_GAMMA, HW_SEASON
    x_i = "element_at(ts, CAST(i AS INT)).x"
    sidx = f"CAST(pmod(element_at(ts, CAST(i AS INT)).hour, {m}) + 1 AS INT)"
    sprev = f"element_at(acc.s, {sidx})"
    newlevel = f"({a} * ({x_i} - {sprev}) + {1 - a} * (acc.level + acc.trend))"
    fold = f"""
        aggregate(
          sequence(1, size(ts)),
          named_struct(
            'level', element_at(ts, 1).x,
            'trend', CAST(0.0 AS DOUBLE),
            's', transform(sequence(1, {m}), j -> CAST(0.0 AS DOUBLE)),
            'fc', CAST(array() AS array<double>)
          ),
          (acc, i) -> named_struct(
            'level', {newlevel},
            'trend', {b} * ({newlevel} - acc.level) + {1 - b} * acc.trend,
            's', transform(sequence(1, {m}), j -> CASE
                   WHEN j = {sidx}
                   THEN {g} * ({x_i} - {newlevel}) + {1 - g} * {sprev}
                   ELSE element_at(acc.s, CAST(j AS INT)) END),
            'fc', concat(acc.fc,
                         array(acc.level + acc.trend + {sprev}))
          )
        ).fc
    """
    folded = series.selectExpr("event_type", "ts", f"{fold} AS fc")
    return folded.selectExpr(
        "event_type",
        "explode(arrays_zip(ts, fc)) AS z",
    ).selectExpr(
        "event_type",
        "z.ts.hour AS hour",
        "z.ts.x AS x",
        "round(z.fc, 6) AS forecast",
        "round(z.ts.x - z.fc, 6) AS resid",
    )
