"""Feature-engineering / data-QA operators: per-user activity
profiles, per-type winsorized statistics, and embedding-norm QA —
the numeric-hygiene passes a feature store or vector pipeline runs
before training.

All pure Column expressions; thresholds that feed comparisons are
rounded to a fixed precision on BOTH engines so count aggregates can't
flip on a last-ulp difference in percentile interpolation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimir_spark.functions.time import epoch_seconds
from mimir_spark.functions.vectors import dot
from mimir_spark.sources.tables import load_table


def user_activity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioural features: event volume, type diversity,
    active days, and value stats — one groupBy, all partial-aggregated
    map-side. The classic feature-store fan-in."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.countDistinct(F.date_trunc("day", "ts")).alias("active_days"),
        F.round(F.sum("value"), 4).alias("total_value"),
        F.round(F.avg("value"), 4).alias("mean_value"),
        F.round(F.percentile("value", 0.9), 4).alias("p90_value"),
    )


def winsorize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type winsorization report: p01/p99 clip thresholds,
    how many rows each side clips, and the winsorized mean — outlier
    hygiene before a value column feeds a model.

    Two-phase: a tiny per-type percentile aggregate is broadcast back
    onto the fact table (no second shuffle of events beyond the final
    groupBy). Thresholds are rounded to 6 dp BEFORE the comparisons so
    the clip counts are engine-portable (percentile interpolation can
    differ in the last ulp between engines)."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.01), 6).alias("lo"),
        F.round(F.percentile("value", 0.99), 6).alias("hi"),
    )
    joined = ev.join(F.broadcast(stats), "event_type")
    return joined.groupBy("event_type").agg(
        F.round(F.min("lo"), 4).alias("p01"),
        F.round(F.min("hi"), 4).alias("p99"),
        F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0))
        .cast("long")
        .alias("n_clipped_low"),
        F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0))
        .cast("long")
        .alias("n_clipped_high"),
        F.round(
            F.avg(F.greatest(F.least(F.col("value"), F.col("hi")), F.col("lo"))), 4
        ).alias("wins_mean"),
    )


def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm distribution of the embedding column —
    the first QA check on any vector ingest (zero/huge norms flag a
    broken encoder). Norm is a fold over the array (JVM expression);
    one groupBy on label."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    norm = F.sqrt(dot(e, e))
    return (
        emb.select("label", norm.alias("norm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("norm"), 6).alias("mean_norm"),
            F.round(F.min("norm"), 6).alias("min_norm"),
            F.round(F.max("norm"), 6).alias("max_norm"),
        )
    )


Z_THRESHOLD = 3.0
# Finite stand-in for the ±∞ robust z of a zero-MAD group (anomaly_mad):
# a numeric literal hashes identically on both engines, where Infinity /
# NULL round-trip differently through pandas.
RZ_INF = 999999999.0


def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outlier scan over `events.value`: rows with
    |z| ≥ 3 against their event type's mean/stddev — the cheap
    anomaly pass a pipeline runs on numeric columns before they feed
    features or labels.

    Two-phase like `winsorize_events`: a tiny per-type aggregate
    (mean, population stddev — both partial-aggregatable) broadcasts
    back onto the fact scan, so the only full-table work is one scan
    plus a map-side join. Mean/std are rounded to 6dp and z to 4dp on
    both engines before the threshold compare, so membership can't
    flip on sum-order last-ulp drift."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("mean_v"),
        F.round(F.stddev_pop("value"), 6).alias("std_v"),
    )
    z = F.round((F.col("value") - F.col("mean_v")) / F.col("std_v"), 4)
    return (
        ev.join(F.broadcast(stats), "event_type")
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= Z_THRESHOLD)
        .select("event_id", "event_type", "value", "z")
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over `events`: users are cohorted by
    the week of their first activity; each (cohort_week, week_offset)
    cell reports how many cohort members were active that many weeks
    later and the retention ratio — the standard product-analytics
    triangle, and a good join/agg stress shape (two user-keyed
    aggregates + one cohort-keyed broadcastable join).

    Shape: distinct (user, week) projection (one shuffle, map-side
    combined), per-user min week (user-keyed agg), activity ⋈ cohort
    on user_id (both sides user-partitioned — AQE plans a co-located
    join), then the (cohort_week, offset) aggregate whose output is
    weeks² cells. Week arithmetic is integer end-to-end (datediff of
    week-truncated stamps is always a multiple of 7)."""
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    coh = act.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    siz = coh.groupBy("cohort_week").agg(
        F.count("*").cast("long").alias("cohort_size")
    )
    return (
        act.join(coh, "user_id")
        .withColumn("week_offset", F.expr("datediff(wk, cohort_week) div 7"))
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").cast("long").alias("n_active"))
        .join(siz, "cohort_week")
        .withColumn(
            "retention",
            F.round(F.col("n_active") / F.col("cohort_size"), 6),
        )
    )


def event_windows_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window counts per event type (1 h windows every 30 min
    — each event lands in exactly 2 windows), via Spark's NATIVE
    window() operator, the same construct the streaming twin uses.
    The fan-out is the window/slide ratio (2×), constant per row; the
    aggregate partial-combines per (window, type) before the shuffle.
    Oracle twin materializes the same 2 bucket starts by epoch
    arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


FUNNEL_STEPS = ("view", "click", "purchase")


def window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-step ordered funnel (ClickHouse windowFunnel semantics,
    earliest-chain variant): per user, how many steps of
    view → click → purchase completed IN ORDER within 1 hour of the
    first view. Output is the funnel histogram (n_steps, n_users) —
    the conversion report product analytics reads off an event stream.

    Deterministic "earliest chain" semantics: step 1 anchors at the
    user's first view; step k+1 is the first qualifying event strictly
    after step k and within the window of the anchor. Each step is a
    per-user min aggregate over a filtered scan joined to the previous
    step — every shuffle is keyed on user_id, so after the first
    exchange the step joins and aggregates reuse the same partitioning
    (no re-shuffle; locally AQE coalesces, on a cluster the exchange
    is planned once). The histogram at the end is |steps|+1 rows.

    Comparisons stay on the native TIMESTAMP (+ interval arithmetic):
    the corpus carries microsecond precision, and an epoch-SECONDS
    projection would shift events across the strict `>` boundaries
    relative to the oracle's interval comparisons."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select("user_id", "event_type", "ts")
    return funnel_steps_histogram(e, e.select("user_id").distinct())


def funnel_steps_histogram(e: DataFrame, users: DataFrame) -> DataFrame:
    """The earliest-chain funnel core over (user_id, event_type, ts)
    rows plus an explicit user universe (n_steps=0 counts users with
    no qualifying view, so the universe cannot be derived from the
    funnel-type events alone). Shared with the streaming twin
    (streaming/funnel.py) so incremental and batch histograms are
    bit-identical: the chain is a pure function of the (user, type,
    ts) SET it is given."""
    win = F.expr("INTERVAL 1 HOUR")
    s1 = (
        e.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1"))
    )
    s3 = (
        e.filter(F.col("event_type") == FUNNEL_STEPS[2])
        .join(s2, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t1") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    steps = (
        users.join(s1.select("user_id", "t1"), "user_id", "left")
        .join(s2.select("user_id", "t2"), "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            F.when(F.col("t3").isNotNull(), 3)
            .when(F.col("t2").isNotNull(), 2)
            .when(F.col("t1").isNotNull(), 1)
            .otherwise(0)
            .cast("long")
            .alias("n_steps")
        )
    )
    return steps.groupBy("n_steps").agg(
        F.count("*").cast("long").alias("n_users")
    )


def hourly_value_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between hour-of-day and event value, per
    event type — the cyclical-pattern screen a feature-engineering
    pass runs on every numeric column. Computed from the five raw
    sums (n, Σx, Σy, Σx², Σy², Σxy) in ONE partial-aggregated pass
    so the formula is literal-identical on both engines (built-in
    corr() implementations differ in summation algorithm across
    engines; the raw-moment form is portable)."""
    ev = load_table(spark, sf_dir, "events")
    x = F.hour("ts").cast("double")
    y = F.col("value")
    agg = ev.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) * F.sqrt(
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.round(num / den, 4).alias("hour_value_corr"),
    )


def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation over purchase
    events — the classic customer-value split, and a clean
    aggregate-then-threshold stress shape: a user-keyed aggregate, a
    tiny median aggregate broadcast back, and an 8-cell rollup.

    Per purchasing user: R = seconds from their last purchase to the
    stream's max timestamp (1-row broadcast, the scalar pattern),
    F = purchase count, M = summed purchase value. Each dimension
    splits at its median (high = at-or-better-than median: recent,
    frequent, high-value); medians are 6dp-rounded on both engines
    before comparing. Output: one row per populated segment
    (r_high, f_high, m_high flags as BIGINT, n_users, avg value)."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", epoch_seconds("ts").alias("sec"), "value"
    )
    ref = p.agg(F.max("sec").alias("ref_sec"))
    per_user = (
        p.crossJoin(F.broadcast(ref))
        .groupBy("user_id")
        .agg(
            F.min(F.col("ref_sec") - F.col("sec")).cast("long").alias("recency_s"),
            F.count("*").cast("long").alias("frequency"),
            F.round(F.sum("value"), 4).alias("monetary"),
        )
    )
    cuts = per_user.agg(
        F.round(F.percentile("recency_s", 0.5), 6).alias("med_r"),
        F.round(F.percentile("frequency", 0.5), 6).alias("med_f"),
        F.round(F.percentile("monetary", 0.5), 6).alias("med_m"),
    )
    seg = per_user.crossJoin(F.broadcast(cuts)).select(
        (F.col("recency_s") <= F.col("med_r")).cast("long").alias("r_high"),
        (F.col("frequency") >= F.col("med_f")).cast("long").alias("f_high"),
        (F.col("monetary") >= F.col("med_m")).cast("long").alias("m_high"),
        "monetary",
    )
    return seg.groupBy("r_high", "f_high", "m_high").agg(
        F.count("*").cast("long").alias("n_users"),
        F.round(F.avg("monetary"), 4).alias("avg_monetary"),
    )

def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier scan over events.value — the
    heavy-tail-safe twin of anomaly_zscore: a single extreme burst
    inflates mean/stddev and can mask real outliers, while the median
    and the median-absolute-deviation are 50%-breakdown estimators.
    Flags rows with |value − median| / (1.4826·MAD) ≥ 3 per event
    type (1.4826 scales MAD to σ under normality).

    Two tiny per-type aggregates (median, then MAD over broadcast-
    joined deviations) and one fact scan — the same two-phase shape as
    winsorize_events; medians/MAD rounded 6dp and the robust z 4dp on
    both engines so membership can't flip on interpolation ulps.

    Degenerate groups: when ≥50% of a type's values are identical the
    MAD is 0 and the robust z is mathematically ±∞ for every value off
    the median — the textbook MAD estimator implodes, it does not go
    blind. Those rows (value ≠ median, mad = 0) are still flagged,
    with rz pinned to the finite sentinel ±RZ_INF (hash-stable on both
    engines, unlike NULL/Infinity); rows AT the median deviate by
    zero and are never outliers."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med_v")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .withColumn("ad", F.abs(F.col("value") - F.col("med_v")))
        .groupBy("event_type", "med_v")
        .agg(F.round(F.expr("percentile(ad, 0.5)"), 6).alias("mad_v"))
    )
    rz = F.when(
        F.col("mad_v") > 0,
        F.round(
            (F.col("value") - F.col("med_v"))
            / (F.lit(1.4826) * F.col("mad_v")),
            4,
        ),
    ).otherwise(
        F.signum(F.col("value") - F.col("med_v")) * F.lit(RZ_INF)
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .withColumn("rz", rz)
        .filter(F.abs(F.col("rz")) >= Z_THRESHOLD)
        .select("event_id", "event_type", "value", "rz")
    )


# ---- exponential moving average (round 10) -----------------------------

EMA_ALPHA_NUM, EMA_ALPHA_DEN = 1, 8  # α = 0.125 — exact in binary


def ema_user_value(
    spark: SparkSession, sf_dir: str, max_history: int = 10_000_000
) -> DataFrame:
    """Per-user exponential moving average of event values — the
    classic time-series smoother (TimescaleDB/Influx parity) that SQL
    windows cannot express (EMA_n = α·v_n + (1−α)·EMA_{n−1} is a
    sequential FOLD, not a frame aggregate). Expressed as the
    engine-portable fold recipe: per user, values are collected in
    (ts, event_id) order and folded left-to-right with F.aggregate
    seeded by the FIRST element — bit-identical to DuckDB's
    list_reduce over array_agg(... ORDER BY), because both folds are
    strictly sequential and α = 1/8 is exact in binary (the recipe the
    gate has verified for dot-product folds since r4; 6dp round for
    belt and braces).

    Scale shape: one groupBy(user_id) collect — per-user state is that
    user's event history, the SAME state any per-entity sequential
    model needs (cf. applyInPandasWithState's running totals). The
    collect is GUARDED in-plan (no extra job): any user whose history
    exceeds max_history fails the task with a raise_error directing
    the caller to the streaming twin (streaming.stateful.
    stateful_user_ema — O(1) state per user, bit-equal fold), instead
    of silently OOMing one executor on a 10^8-event key.
    Output (user_id, n_events, last_value, ema)."""
    ev = load_table(spark, sf_dir, "events")
    alpha = EMA_ALPHA_NUM / EMA_ALPHA_DEN
    seq = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("s")
    )
    vals = F.transform(F.col("s"), lambda x: x["value"])
    ema = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, v: F.lit(alpha) * v + F.lit(1 - alpha) * acc,
    )
    n = F.size("s").cast("long")
    n_guarded = F.when(n <= F.lit(max_history), n).otherwise(
        F.raise_error(
            F.concat(
                F.lit("ema_user_value: user "),
                F.col("user_id").cast("string"),
                F.lit(" has "),
                n.cast("string"),
                F.lit(
                    f" events (> max_history={max_history}); route this"
                    " corpus through streaming.stateful.stateful_user_ema"
                    " (O(1) state per user) instead of the batch collect."
                ),
            )
        ).cast("long")
    )
    return seq.select(
        "user_id",
        n_guarded.alias("n_events"),
        F.round(F.element_at(vals, -1), 6).alias("last_value"),
        F.round(ema, 6).alias("ema"),
    )


PSI_BINS = 10
PSI_THRESHOLD = 0.2  # the conventional "significant shift" cut


def drift_psi(ref: DataFrame, cur: DataFrame, n_bins: int = PSI_BINS) -> DataFrame:
    """Population Stability Index between a reference and a current
    snapshot of (event_type, value) rows — the standard
    feature-drift gate a training pipeline runs before refreshing a
    model on new data: psi = Σ_bins (p_ref − p_cur)·ln(p_ref/p_cur),
    with the folk thresholds 0.1 (watch) / 0.2 (significant shift).

    Binning: n_bins equal-width bins from the REFERENCE min/max per
    type (current rows outside the reference range clamp into the
    edge bins — exactly the "new mass outside the training range"
    signal PSI exists to catch). Laplace-smoothed proportions
    (n+1)/(N+n_bins) keep empty bins finite; the full type×bin spine
    is materialized (bounded: |types|·n_bins rows) because smoothing
    under unequal totals gives even empty-both bins a nonzero term.

    Scale shape: each snapshot is scanned once into a map-side-
    combined (type, bin) count — everything after is bounded by
    |types|·n_bins. The per-type float sum follows the
    bigram_logppl summation contract (round 6 at emission).

    Portability: bin = floor(((v−vmin)/(vmax−vmin))·n) with this
    exact parenthesization on both engines; min/max are raw data
    values, so every input to floor/ln is bit-identical."""
    stats = psi_ref_stats(ref)
    ref_cells = psi_binned_counts(ref, stats, n_bins)
    cur_cells = psi_binned_counts(cur, stats, n_bins)
    return psi_from_counts(ref_cells, cur_cells, stats, n_bins)


def psi_ref_stats(ref: DataFrame) -> DataFrame:
    """Per-type (vmin, vmax) of the reference snapshot — the frozen
    bin-edge metadata every PSI consumer (batch or streaming) shares."""
    return ref.groupBy("event_type").agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    )


def psi_binned_counts(
    df: DataFrame, stats: DataFrame, n_bins: int = PSI_BINS
) -> DataFrame:
    """(event_type, bin, cnt) under the reference bin edges — the
    sum-monoid partial both the batch op and the streaming twin fold
    (counts over disjoint batches simply add)."""
    binned = df.join(F.broadcast(stats), "event_type").select(
        "event_type",
        F.when(F.col("vmax") == F.col("vmin"), F.lit(0))
        .otherwise(
            F.least(
                F.greatest(
                    F.floor(
                        (
                            (F.col("value") - F.col("vmin"))
                            / (F.col("vmax") - F.col("vmin"))
                        )
                        * n_bins
                    ),
                    F.lit(0),
                ),
                F.lit(n_bins - 1),
            )
        )
        .cast("long")
        .alias("bin"),
    )
    return binned.groupBy("event_type", "bin").agg(
        F.count("*").cast("long").alias("cnt")
    )


def psi_from_counts(
    ref_cells: DataFrame,
    cur_cells: DataFrame,
    stats: DataFrame,
    n_bins: int = PSI_BINS,
) -> DataFrame:
    """PSI per type from the two (event_type, bin, cnt) partials —
    the shared finalizer (streaming merges its store into cur_cells
    and lands here)."""
    spine = stats.select(
        "event_type",
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("_b"),
    ).select("event_type", F.col("_b").cast("long").alias("bin"))
    full = (
        spine.join(
            ref_cells.withColumnRenamed("cnt", "nr"),
            ["event_type", "bin"],
            "left",
        )
        .join(
            cur_cells.withColumnRenamed("cnt", "nc"),
            ["event_type", "bin"],
            "left",
        )
        .select(
            "event_type",
            "bin",
            F.coalesce("nr", F.lit(0)).cast("long").alias("nr"),
            F.coalesce("nc", F.lit(0)).cast("long").alias("nc"),
        )
    )
    totals = full.groupBy("event_type").agg(
        F.sum("nr").cast("long").alias("n_ref"),
        F.sum("nc").cast("long").alias("n_cur"),
    )
    pr = (F.col("nr") + 1.0) / (F.col("n_ref") + F.lit(float(n_bins)))
    pc = (F.col("nc") + 1.0) / (F.col("n_cur") + F.lit(float(n_bins)))
    return (
        full.join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "n_ref",
            "n_cur",
            ((pr - pc) * F.log(pr / pc)).alias("term"),
        )
        .groupBy("event_type")
        .agg(
            F.max("n_ref").alias("n_ref"),
            F.max("n_cur").alias("n_cur"),
            F.round(F.sum("term"), 6).alias("psi"),
            (F.sum("term") > PSI_THRESHOLD).cast("long").alias("drifted"),
        )
    )


def feature_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() wrapper for drift_psi: the reference snapshot is the
    even-user half of events; the current snapshot is the odd-user
    half with a deterministic +25-unit shift injected into the
    'purchase' type — a hermetic stand-in for two feature-store
    snapshots (the corpus_snapshot_diff move); `drift_psi` itself
    takes any two (event_type, value) frames. The unshifted types pin
    psi ≈ 0 (same generator), purchase pins the drifted flag."""
    ev = load_table(spark, sf_dir, "events")
    ref = ev.filter(F.col("user_id") % 2 == 0)
    cur = ev.filter(F.col("user_id") % 2 == 1).withColumn(
        "value",
        F.when(
            F.col("event_type") == "purchase", F.col("value") + F.lit(25.0)
        ).otherwise(F.col("value")),
    )
    return drift_psi(ref, cur)


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix (the product-analytics
    'path analysis' / Markov-chain step): per user, consecutive events
    in (ts, event_id) order form (from_type → to_type) transitions;
    output counts and row-normalized probabilities. The lead() window
    partitions by user (bounded per-user state, the sessionize
    precedent — never a global order), and the matrix aggregate is
    |types|² rows however large the corpus."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").cast("long").alias("n")
    )
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return (
        counts.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n") / F.col("tot"), 6).alias("prob"),
        )
    )


HOLT_ALPHA = 0.25  # 1/4 — exact in binary, like the EMA's 1/8
HOLT_BETA = 0.125


def holt_linear_user(
    spark: SparkSession, sf_dir: str, max_history: int = 10_000_000
) -> DataFrame:
    """Per-user HOLT LINEAR-TREND double exponential smoothing (Holt
    1957; the level+trend extension of ema_user_value):

        l_t = α·v_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}

    seeded l_1 = v_1, b_1 = 0, values in (ts, event_id) order — a
    2-component sequential fold no SQL window expresses. Both α = 1/4
    and β = 1/8 are exact binary fractions and the fold is strictly
    left-to-right with the identical parenthesization on both engines,
    so the state is bit-replicable by the DuckDB oracle. The oracle's
    accumulator is a 2-element LIST, not a struct: DuckDB's
    list_reduce over struct states mis-evaluates the second field
    (observed: the 'b' field of a 3-step fold diverges from the
    hand-rolled recurrence), while list-valued accumulators reproduce
    the fold bit-for-bit.

    Same scale shape + in-plan history guard as ema_user_value (one
    groupBy(user_id) collect; > max_history raises toward the
    streaming twin). Output: (user_id, n_events, level, trend,
    forecast_3) with forecast_3 = l + 3·b, all 6dp.
    """
    ev = load_table(spark, sf_dir, "events")
    a, b_ = HOLT_ALPHA, HOLT_BETA
    seq = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("s")
    )
    vals = F.transform(F.col("s"), lambda x: x["value"])

    def l_new(acc, v):
        return F.lit(a) * v + F.lit(1 - a) * (acc["l"] + acc["b"])

    state = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.struct(
            F.element_at(vals, 1).alias("l"), F.lit(0.0).alias("b")
        ),
        lambda acc, v: F.struct(
            l_new(acc, v).alias("l"),
            (
                F.lit(b_) * (l_new(acc, v) - acc["l"])
                + F.lit(1 - b_) * acc["b"]
            ).alias("b"),
        ),
    )
    n = F.size("s").cast("long")
    n_guarded = F.when(n <= F.lit(max_history), n).otherwise(
        F.raise_error(
            F.concat(
                F.lit("holt_linear_user: user "),
                F.col("user_id").cast("string"),
                F.lit(
                    f" exceeds max_history={max_history}; use the"
                    " streaming stateful twin instead of the batch"
                    " collect."
                ),
            )
        ).cast("long")
    )
    return seq.select(
        "user_id",
        n_guarded.alias("n_events"),
        F.round(state["l"], 6).alias("level"),
        F.round(state["b"], 6).alias("trend"),
        F.round(state["l"] + F.lit(3.0) * state["b"], 6).alias("forecast_3"),
    )


def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TYPE-2 SLOWLY-CHANGING-DIMENSION history build (Kimball's SCD2
    — the warehouse pattern every CDC/ELT stack materializes): treat
    each user's event stream as attribute changes and emit one
    validity-interval row per RUN of equal states — (user_id, version,
    state, valid_from, valid_to, n_events, is_current), half-open
    intervals, valid_to NULL on the current row.

    Plan shape: ONE shuffle on user_id serves the whole chain — the
    change-point lag, the run-id cumsum, the per-run aggregate and the
    valid_to lead all share the same partitioning, so Catalyst plans a
    single Exchange (per-user state is bounded by that user's rows,
    the sessionize contract). Times are epoch seconds (bigint) via the
    repo's TIMESTAMP(NANOS)-safe helper.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        F.lag("event_type", 1).over(w).isNull()
        | (F.lag("event_type", 1).over(w) != F.col("event_type"))
    ).cast("int")
    seg = ev.withColumn(
        "version",
        F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    runs = seg.groupBy("user_id", "version").agg(
        F.first("event_type").alias("state"),
        F.min(epoch_seconds("ts")).cast("long").alias("valid_from"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("version")
    return runs.select(
        "user_id",
        F.col("version").cast("long").alias("version"),
        "state",
        "valid_from",
        F.lead("valid_from", 1).over(w2).cast("long").alias("valid_to"),
        "n_events",
        F.lead("valid_from", 1).over(w2).isNull().cast("long").alias(
            "is_current"
        ),
    )


QB_BINS = 8


def quantile_binning(
    spark: SparkSession, sf_dir: str, n_bins: int = QB_BINS
) -> DataFrame:
    """EQUAL-FREQUENCY feature discretization (quantile binning) of
    event values per type — the feature-engineering primitive behind
    GBDT-style histogram features and monotone target encoders: ntile
    assigns each row a bin with counts equal to ±1, and the report
    carries each bin's value range so the edges can be frozen and
    replayed on serving data.

    Plan: one shuffle on event_type for the ntile window (ties broken
    by event_id so the assignment is deterministic and engine-
    portable — ntile over a non-unique ORDER BY is implementation-
    defined), then a map-side-combined per-(type, bin) aggregate.
    Output: (event_type, bin, n, lo, hi) — |types|·n_bins rows.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    binned = ev.withColumn("bin", F.ntile(n_bins).over(w))
    return binned.groupBy("event_type", F.col("bin").cast("long").alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
    )


def top_session_paths(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 30, top_n: int = 25
) -> DataFrame:
    """PATH MINING over sessionized events: the most common ordered
    event-type sequences per session (consecutive duplicates
    collapsed) — the product-analytics "top user journeys" query, and
    the n-th-order generalization of event_transitions' first-order
    matrix.

    Plan: the sessionize lag/cumsum chain (one user_id shuffle), an
    ordered per-session collect (bounded by that session's rows), the
    consecutive-dedup as a JVM-side fold, then one count shuffle on
    the path string and a top-n window. Output: (path, n_sessions,
    rank)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag(epoch_seconds("ts"), 1).over(w)
    gap_s = gap_minutes * 60
    flagged = ev.withColumn(
        "new_session",
        F.when(prev_ts.isNull(), F.lit(0)).otherwise(
            (epoch_seconds("ts") - prev_ts > F.lit(gap_s)).cast("int")
        ),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    seq = flagged.groupBy("user_id", "session_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("s")
    )
    types = F.transform(F.col("s"), lambda x: x["event_type"])
    collapsed = F.aggregate(
        types,
        F.array().cast("array<string>"),
        lambda acc, t: F.when(
            F.try_element_at(acc, F.lit(-1)) == t, acc
        ).otherwise(F.concat(acc, F.array(t))),
    )
    paths = seq.select(F.array_join(collapsed, ">").alias("path"))
    counted = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )
    w2 = Window.partitionBy().orderBy(F.col("n_sessions").desc(), "path")
    return (
        counted.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= top_n)
        .select("path", "n_sessions", "rank")
    )


FH_BUCKETS = 64


def feature_hashing(
    spark: SparkSession, sf_dir: str, n_buckets: int = FH_BUCKETS
) -> DataFrame:
    """The HASHING TRICK (Weinberger et al. ICML'09): each document's
    bag-of-words projected into a fixed n_buckets-dim sparse vector —
    bucket = h(word) mod n, value summed with a SIGN from an
    independent hash bit so colliding words cancel in expectation
    (unbiased inner products, the property that lets linear models
    train on hashed features without a vocabulary).

    Vocabulary-free by construction: the feature space is O(n_buckets)
    at ANY corpus size — the same reason dsir_weights hashes its
    bigrams — and the whole op is one token scan with a map-side-
    combined (doc, bucket) sum; no dictionary build, no broadcast.

    Portability: bucket and sign come from the md5-31 token hash
    (bucket = h mod n, sign from the next bit up: (h ÷ n) mod 2), all
    exact integers. Output: sparse long form (doc_id, bucket, val).
    """
    from mimir_spark.functions.text import portable_token_hash31
    from mimir_spark.operators.core import tokens

    docs = load_table(spark, sf_dir, "documents")
    occ = tokens(docs).select(
        "doc_id", portable_token_hash31(F.col("word")).alias("h")
    )
    bucket = (F.col("h") % n_buckets).cast("long")
    sign = F.when(
        (F.floor(F.col("h") / n_buckets) % 2) == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        occ.select("doc_id", bucket.alias("bucket"), sign.alias("s"))
        .groupBy("doc_id", "bucket")
        .agg(F.sum("s").cast("long").alias("val"))
        .filter(F.col("val") != 0)
    )


ATTR_WINDOW_S = 3600


def attribution_report(
    spark: SparkSession, sf_dir: str, window_s: int = ATTR_WINDOW_S
) -> DataFrame:
    """MULTI-TOUCH ATTRIBUTION of purchase value to the touch events
    (views/clicks) in the hour before each purchase — the marketing-
    analytics workhorse, under three standard models at once:
    last_touch (all value to the latest touch), first_touch, and
    linear (value split evenly). Purchases with no in-window touch
    land in the 'unattributed' bucket, so every model CONSERVES total
    purchase value (pytest-pinned).

    Plan: purchases ⋈ touches is a user-keyed range join (both sides
    partitioned by user_id; per-purchase fan-in bounded by that
    user's touches in one hour); each model is a window/aggregate
    over the joined pairs — the corpus is scanned twice (once per
    role), everything downstream is pair-sized. Value splits divide
    the 2dp purchase value by an exact touch count; per-(model, type)
    sums are rounded 4dp at emission (the winsorize contract).
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    sec = epoch_seconds("ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("u"),
        sec.alias("p_sec"),
        F.col("value").alias("p_value"),
    )
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("touch_type"),
        sec.alias("t_sec"),
    )
    pairs = purchases.join(touches, "u").filter(
        (F.col("t_sec") < F.col("p_sec"))
        & (F.col("t_sec") >= F.col("p_sec") - F.lit(window_s))
    )
    w = Window.partitionBy("p_id")
    enriched = pairs.select(
        "p_id",
        "p_value",
        "touch_type",
        "t_sec",
        "t_id",
        F.count(F.lit(1)).over(w).alias("n_touch"),
        F.row_number()
        .over(w.orderBy(F.col("t_sec").desc(), F.col("t_id").desc()))
        .alias("rk_last"),
        F.row_number()
        .over(w.orderBy(F.col("t_sec").asc(), F.col("t_id").asc()))
        .alias("rk_first"),
    )
    last = enriched.filter(F.col("rk_last") == 1).select(
        F.lit("last_touch").alias("model"),
        "touch_type",
        F.col("p_value").alias("v"),
    )
    first = enriched.filter(F.col("rk_first") == 1).select(
        F.lit("first_touch").alias("model"),
        "touch_type",
        F.col("p_value").alias("v"),
    )
    linear = enriched.select(
        F.lit("linear").alias("model"),
        "touch_type",
        (F.col("p_value") / F.col("n_touch")).alias("v"),
    )
    attributed_ids = pairs.select("p_id").distinct()
    unattributed = (
        purchases.join(attributed_ids, "p_id", "left_anti")
        .crossJoin(
            spark.createDataFrame(
                [("last_touch",), ("first_touch",), ("linear",)],
                "model string",
            )
        )
        .select("model", F.lit("unattributed").alias("touch_type"),
                F.col("p_value").alias("v"))
    )
    allv = last.unionByName(first).unionByName(linear).unionByName(
        unattributed
    )
    return allv.groupBy("model", "touch_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum("v"), 4).alias("value"),
    )


TTC_WINDOW_S = 86400


def funnel_time_to_convert(
    spark: SparkSession, sf_dir: str, window_s: int = TTC_WINDOW_S
) -> DataFrame:
    """TIME-TO-CONVERT distribution: for every purchase with a view
    in the preceding 24 h by the same user, the seconds from the
    LATEST such view to the purchase — the funnel-latency companion
    to window_funnel's conversion counts. Percentiles are LOWER
    order-statistic picks (the theil_sen contract: rank (n+1)÷2 and
    ceil(0.9·n) under ORDER BY value, doc-id ties impossible on
    integer seconds + unique purchase ids), so no interpolation mode
    can diverge between engines; mean is one exact-integer sum over a
    count.

    Plan: a user-keyed range join (per-purchase fan-in bounded by one
    user-day of views) → per-purchase max-view aggregate → one global
    rank window over |conversions| rows. Output: (n_conversions,
    p50_s, p90_s, mean_s).
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    sec = epoch_seconds("ts")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("u"),
        sec.alias("p_sec"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"), sec.alias("v_sec")
    )
    tt = (
        p.join(v, "u")
        .filter(
            (F.col("v_sec") < F.col("p_sec"))
            & (F.col("v_sec") >= F.col("p_sec") - F.lit(window_s))
        )
        .groupBy("p_id", "p_sec")
        .agg(F.max("v_sec").alias("v_sec"))
        .select(
            "p_id", (F.col("p_sec") - F.col("v_sec")).alias("tt")
        )
    )
    w = Window.partitionBy().orderBy("tt", "p_id")
    ranked = tt.withColumn("rk", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy())
    )
    picks = ranked.select(
        "n",
        F.when(
            F.col("rk") == F.floor((F.col("n") + 1) / 2), F.col("tt")
        ).alias("p50"),
        F.when(
            F.col("rk") == F.ceil(0.9 * F.col("n")), F.col("tt")
        ).alias("p90"),
        "tt",
    )
    return picks.groupBy().agg(
        F.max("n").cast("long").alias("n_conversions"),
        F.max("p50").cast("long").alias("p50_s"),
        F.max("p90").cast("long").alias("p90_s"),
        F.round(F.sum("tt") / F.max("n"), 4).alias("mean_s"),
    )


def user_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user SHANNON ENTROPY of the event-type mix — the diversity
    feature beside user_activity_profile's n_types (a 5-type user who
    is 96% 'view' looks like a 1-type user to entropy but not to
    n_types): H = −Σ p·ln p over the user's type distribution, plus
    the normalized H/ln(n_types) in [0, 1].

    Plan: one map-side-combined (user, type) count, one user-keyed
    fold over ≤ |types| rows per user — both shuffles bounded by the
    key space. Portability: p = exact integer ratio; ln follows the
    bigram_logppl contract (libm parity at 6dp); single-type users
    emit H = 0 exactly — their one term is −1·ln(1) = −0.0, and the
    sum's +0.0 seed absorbs the sign (−0.0 + 0.0 = +0.0 in IEEE 754,
    identically in both engines); a p = 0 cell never exists because
    counts come from observed rows, so 0·ln 0 cannot arise. The
    explicit guard is only on norm_entropy (ln(1) division).
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    cell = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = Window.partitionBy("user_id")
    p = F.col("c").cast("double") / F.sum("c").over(tot).cast("double")
    per_user = (
        cell.withColumn("term", -p * F.log(p))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum("c").cast("long").alias("n_events"),
            F.round(F.sum("term"), 6).alias("entropy"),
        )
    )
    return per_user.select(
        "user_id",
        "n_types",
        "n_events",
        "entropy",
        F.when(F.col("n_types") == 1, F.lit(0.0))
        .otherwise(
            F.round(
                F.col("entropy") / F.log(F.col("n_types").cast("double")),
                6,
            )
        )
        .alias("norm_entropy"),
    )
