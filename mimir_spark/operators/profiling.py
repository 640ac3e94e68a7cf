"""Data-profiling operators — the first pass anyone runs on an
unfamiliar table: per-column row/null/distinct counts.

Shape: one aggregate per column over a COLUMN-PRUNED scan, unioned.
Eleven tiny single-column scans beat one scan with eleven
count-distincts: multiple exact DISTINCT aggregates in one groupBy
force an Expand (row multiplied per aggregate) — 11× the corpus
through the shuffle — while per-column scans read only that column's
pages (columnar formats make this nearly free) and each aggregate is
partial-combined. At 100 TB you swap exact distinct for
approx_count_distinct per column; the exact form is the oracle-
checkable choice at test SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mimir_spark.sources.tables import load_table

PROFILE_TABLE = "lineitem"


def table_profile(
    spark: SparkSession, sf_dir: str, table: str = PROFILE_TABLE
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct) for every column of the
    table — nulls counted as count(*) − count(col), distinct exact
    (nulls excluded, both engines' COUNT(DISTINCT) semantics)."""
    df = load_table(spark, sf_dir, table)
    parts = []
    for c in df.columns:
        parts.append(
            df.select(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                (F.count(F.lit(1)) - F.count(c)).cast("long").alias("n_nulls"),
                F.countDistinct(c).cast("long").alias("n_distinct"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


K_ANON = 5
QUASI_IDENTIFIERS = ("c_nationkey", "c_mktsegment")


def k_anonymity_report(
    spark: SparkSession, sf_dir: str, k: int = K_ANON
) -> DataFrame:
    """Training-data governance check: k-anonymity of the customer
    table over its quasi-identifier columns (nation, market segment).
    A row is at re-identification risk when its equivalence class
    (identical quasi-identifier tuple) has fewer than k members.
    Returns one summary row: class count, below-k class count, rows
    in risky classes, and the min/max class sizes — the numbers a
    release gate thresholds on before shipping user-derived data.

    Shape: one groupBy on the quasi-identifier tuple (map-side
    combined), then a 1-row aggregate over the (bounded:
    |nations|x|segments|) class table."""
    cust = load_table(spark, sf_dir, "customer")
    classes = cust.groupBy(*QUASI_IDENTIFIERS).agg(
        F.count("*").cast("long").alias("class_size")
    )
    return classes.agg(
        F.count("*").cast("long").alias("n_classes"),
        F.sum((F.col("class_size") < k).cast("long"))
        .cast("long")
        .alias("n_small_classes"),
        F.sum(
            F.when(F.col("class_size") < k, F.col("class_size")).otherwise(0)
        )
        .cast("long")
        .alias("n_risky_rows"),
        F.min("class_size").alias("min_class_size"),
        F.max("class_size").alias("max_class_size"),
    )


L_DIVERSITY = 3
SENSITIVE_COL = "c_mktsegment"
L_QUASI = ("c_nationkey",)


def l_diversity_report(
    spark: SparkSession, sf_dir: str, l_min: int = L_DIVERSITY
) -> DataFrame:
    """The companion governance check to k_anonymity_report:
    k-anonymity alone doesn't stop attribute disclosure — if every
    member of a quasi-identifier class shares one SENSITIVE value, the
    attacker learns it without re-identifying anyone (Machanavajjhala
    et al., "l-Diversity", ICDE 2006). Per QI class (nation), report
    the class size, the number of DISTINCT sensitive values (market
    segment), the dominant value's share, and the below-l flag a
    release gate thresholds on.

    Shape: one (QI, sensitive) groupBy (map-side combined; output is
    |nations|×|segments| bounded), then a class-level re-aggregate —
    the fact table is scanned once at any scale."""
    cust = load_table(spark, sf_dir, "customer")
    cells = cust.groupBy(*L_QUASI, SENSITIVE_COL).agg(
        F.count("*").cast("long").alias("n")
    )
    return (
        cells.groupBy(*L_QUASI)
        .agg(
            F.sum("n").cast("long").alias("class_size"),
            F.count("*").cast("long").alias("n_sensitive_values"),
            F.max("n").cast("long").alias("dominant_count"),
        )
        .select(
            *L_QUASI,
            "class_size",
            "n_sensitive_values",
            F.round(F.col("dominant_count") / F.col("class_size"), 6).alias(
                "dominant_share"
            ),
            (F.col("n_sensitive_values") < l_min)
            .cast("long")
            .alias("below_l"),
        )
    )


T_CLOSENESS = 0.2


def t_closeness_report(
    spark: SparkSession, sf_dir: str, t_max: float = T_CLOSENESS
) -> DataFrame:
    """The third rung of the release-gate ladder (after
    k_anonymity_report and l_diversity_report): l-diversity still
    leaks when a class's sensitive values are DISTINCT but skewed —
    "3 distinct segments" hides that 98% of the class is one of them.
    t-closeness (Li, Li & Venkatasubramanian, ICDE 2007) bounds the
    distance between each quasi-identifier class's sensitive-value
    distribution and the GLOBAL distribution; for a categorical
    sensitive attribute under the equal-ground-distance metric, the
    Earth Mover's Distance reduces to total variation:
    EMD = ½ · Σ_s |p_class(s) − p_global(s)|.

    Per QI class (nation): class size, the EMD against the global
    market-segment distribution, and the above-t flag.

    Engine portability: the per-segment term p_c − p_g =
    n_cs/N_c − g_s/N is computed as the INTEGER numerator
    n_cs·N − g_s·N_c over the common denominator N_c·N, so the
    per-class sum is exact integer arithmetic; one float division +
    round(6) happens at emission only — no float-sum ordering hazard.

    Shape: one (QI, sensitive) groupBy (map-side combined, output
    bounded by |nations|×|segments|), a broadcast of the
    |segments|-row global distribution onto the class×segment grid
    (built from the bounded class table, so classes MISSING a segment
    still contribute that segment's full global mass), then a
    class-keyed re-aggregate — the fact table is scanned once."""
    cust = load_table(spark, sf_dir, "customer")
    cells = cust.groupBy(*L_QUASI, SENSITIVE_COL).agg(
        F.count("*").cast("long").alias("n_cs")
    )
    classes = cells.groupBy(*L_QUASI).agg(
        F.sum("n_cs").cast("long").alias("class_size")
    )
    glob = cells.groupBy(SENSITIVE_COL).agg(
        F.sum("n_cs").cast("long").alias("g_s")
    )
    total = glob.agg(F.sum("g_s").cast("long").alias("n_total"))
    grid = (
        classes.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(total))
        .join(cells, [*L_QUASI, SENSITIVE_COL], "left")
        .select(
            *L_QUASI,
            "class_size",
            "n_total",
            F.abs(
                F.coalesce(F.col("n_cs"), F.lit(0)) * F.col("n_total")
                - F.col("g_s") * F.col("class_size")
            )
            .cast("long")
            .alias("abs_num"),
        )
    )
    return (
        grid.groupBy(*L_QUASI)
        .agg(
            F.max("class_size").cast("long").alias("class_size"),
            F.sum("abs_num").cast("long").alias("_num"),
            F.max("n_total").alias("_n"),
        )
        .select(
            *L_QUASI,
            "class_size",
            F.round(
                F.col("_num") / (2.0 * F.col("class_size") * F.col("_n")), 6
            ).alias("emd"),
            (
                F.col("_num") / (2.0 * F.col("class_size") * F.col("_n"))
                > t_max
            )
            .cast("long")
            .alias("above_t"),
        )
    )


def shuffle_skew_report(
    spark: SparkSession, sf_dir: str, table: str = "lineitem",
    key: str = "l_suppkey", sample_hash_bits: int | None = None,
) -> DataFrame:
    """Join/shuffle SKEW diagnosis — the report a pipeline owner reads
    BEFORE choosing between a plain shuffle join, AQE skew splitting,
    and explicit salting (operators/advanced.skew_join_salted): the
    per-key frequency distribution of a prospective shuffle key,
    summarized as exact discrete percentiles, max/median skew ratio,
    and the Gini coefficient of key mass.

    Shape: one map-side-combined groupBy builds the (key, cnt) table
    (keys-sized, orders of magnitude under the fact table), then ONE
    ordering window over it ranks counts; every percentile is an
    exact element pick (ceil(q·n)-th count), and the Gini numerator
    Σ i·c_(i) is pure integer arithmetic — both engine-portable with
    no float-sum ordering hazard. The window is a single partition BY
    CONSTRUCTION of the keys table, not of the corpus — for a key
    whose distinct count rivals the fact table itself, pass
    ``sample_hash_bits=b`` to run the identical report on the
    2^-b hash-prefix key sample: the xxhash64(key) % 2^b == 0 filter
    is applied BEFORE the groupBy (so it prunes the fact-table
    shuffle, not just the keys table, and a key's count is still its
    EXACT full count — keys are sampled, rows of a kept key never
    are), percentiles / skew_ratio / gini are consistent
    distribution-level estimates as-is, and the two extensive columns
    (n_keys, total_rows) are rescaled by 2^b back to full-table
    estimates. max_cnt is the sample max — a lower bound on the true
    max, which is the one statistic a hash-prefix sample cannot
    certify (the heavy-hitter CMS sketch is the right tool for that
    key)."""
    df = load_table(spark, sf_dir, table)
    if sample_hash_bits is not None:
        df = df.filter(
            F.pmod(F.xxhash64(F.col(key)), F.lit(1 << sample_hash_bits)) == 0
        )
    scale = 1 if sample_hash_bits is None else (1 << sample_hash_bits)
    counts = df.groupBy(F.col(key).alias("k")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cnt"), F.col("k"))
    ranked = counts.select(
        "cnt", F.row_number().over(w).cast("long").alias("i")
    )
    totals = counts.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("total_rows"),
    )
    return (
        ranked.crossJoin(F.broadcast(totals))
        .agg(
            F.max("n_keys").alias("n_keys"),
            F.max("total_rows").alias("total_rows"),
            F.max("cnt").alias("max_cnt"),
            F.max(
                F.when(F.col("i") == F.ceil(F.col("n_keys") * 0.5), F.col("cnt"))
            ).alias("p50_cnt"),
            F.max(
                F.when(F.col("i") == F.ceil(F.col("n_keys") * 0.9), F.col("cnt"))
            ).alias("p90_cnt"),
            F.max(
                F.when(F.col("i") == F.ceil(F.col("n_keys") * 0.99), F.col("cnt"))
            ).alias("p99_cnt"),
            F.sum(F.col("i") * F.col("cnt")).cast("long").alias("_wsum"),
        )
        .select(
            (F.col("n_keys") * scale).cast("long").alias("n_keys")
            if scale != 1
            else F.col("n_keys"),
            (F.col("total_rows") * scale).cast("long").alias("total_rows")
            if scale != 1
            else F.col("total_rows"),
            "max_cnt",
            "p50_cnt",
            "p90_cnt",
            "p99_cnt",
            F.round(F.col("max_cnt") / F.col("p50_cnt"), 6).alias(
                "skew_ratio"
            ),
            F.round(
                (2.0 * F.col("_wsum")) / (F.col("n_keys") * F.col("total_rows"))
                - (F.col("n_keys") + 1) / F.col("n_keys"),
                6,
            ).alias("gini"),
        )
    )


def constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-validation gate: evaluate a fixed constraint suite (the
    checks a pipeline owner runs BEFORE promoting a snapshot) and
    report (constraint, n_checked, n_violations) per rule — not-null,
    domain-range, key-uniqueness, referential-integrity, and
    discount/tax sanity over the TPC-H-ish tables.

    Scale shape: every rule is either a map-side-combined aggregate
    over one scan (range / not-null rules share their table's single
    pass via Catalyst common-subplan reuse) or a broadcast/shuffle
    anti-join for referential rules keyed on the foreign key; the
    report itself is rules-sized. A failed gate costs one boolean
    read; silent corruption costs a training run."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    docs = load_table(spark, sf_dir, "documents")

    def agg_rule(name: str, df: DataFrame, bad) -> DataFrame:
        return df.agg(
            F.lit(name).alias("constraint"),
            F.count(F.lit(1)).cast("long").alias("n_checked"),
            F.sum(bad.cast("long")).cast("long").alias("n_violations"),
        )

    rules = [
        agg_rule(
            "lineitem.quantity in [1,50]",
            li,
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
        ),
        agg_rule(
            "lineitem.discount in [0,1]",
            li,
            (F.col("l_discount") < 0) | (F.col("l_discount") > 1),
        ),
        agg_rule("orders.totalprice > 0", orders, F.col("o_totalprice") <= 0),
        agg_rule("documents.text not null", docs, F.col("text").isNull()),
    ]
    # key uniqueness: violations = rows carrying a duplicated key
    dup = (
        cust.groupBy("c_custkey")
        .agg(F.count("*").alias("n"))
        .agg(
            F.lit("customer.custkey unique").alias("constraint"),
            F.sum("n").cast("long").alias("n_checked"),
            F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0))
            .cast("long")
            .alias("n_violations"),
        )
    )
    # referential integrity: orphan foreign keys via left-anti join
    # (customer is the broadcastable side at any realistic ratio)
    n_orders = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n_checked")
    )
    orphans = (
        orders.join(
            cust.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        .crossJoin(F.broadcast(n_orders))
        .select(
            F.lit("orders.custkey references customer").alias("constraint"),
            "n_checked",
            "n_violations",
        )
    )
    out = rules[0]
    for r in rules[1:] + [dup, orphans]:
        out = out.unionByName(r)
    return out


# ---- Benford first-digit conformance ---------------------------------------


def benford_digit_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit conformance scan of
    orders.o_totalprice — the classic anomaly/fabrication screen for
    positive, scale-spanning amounts (Nigrini's audit test): observed
    digit shares vs p(d) = log10(1 + 1/d), plus the chi-square
    statistic.

    Portability: the first digit is taken via exact INTEGER
    arithmetic — cents = round(price·100) :: bigint, digit =
    floor(cents / 10^(len(str(cents)) − 1)) — never via log10 of the
    value (whose floor can straddle an engine ulp at powers of ten).
    One scan → 9-row aggregate; the digit spine 1..9 is materialized
    so missing digits still contribute their expected mass. chi² is
    summed from ROUNDED 6dp contributions (the chi2_lang_source
    contract).
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    digit = F.floor(
        cents
        / F.pow(F.lit(10.0), (F.length(cents.cast("string")) - 1).cast("double"))
    ).cast("int")
    obs = (
        orders.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("obs"))
    )
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    cells = spine.join(obs, "digit", "left").select(
        "digit", F.coalesce("obs", F.lit(0)).cast("long").alias("obs")
    )
    w_all = Window.partitionBy()
    total = F.sum("obs").over(w_all)
    p_benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    scored = (
        cells.withColumn("total", total.cast("long"))
        .withColumn("p_obs", F.round(F.col("obs") / F.col("total"), 6))
        .withColumn("p_benford", F.round(p_benford, 6))
        .withColumn(
            "contribution",
            F.round(
                (F.col("obs") - F.col("total") * p_benford) ** 2
                / (F.col("total") * p_benford),
                6,
            ),
        )
    )
    return (
        scored.withColumn(
            "chi2", F.round(F.sum("contribution").over(w_all), 4)
        )
        .withColumn("dof", F.lit(8).cast("long"))
        .select(
            "digit", "obs", "total", "p_obs", "p_benford",
            "contribution", "chi2", "dof",
        )
    )


# ---- differentially-private counts (Laplace mechanism) ---------------------

DP_EPSILON = 1.0


def dp_count_laplace(
    spark: SparkSession, sf_dir: str, epsilon: float = DP_EPSILON
) -> DataFrame:
    """ε-differentially-private (lang, source) document counts via the
    Laplace mechanism — the release step after the k-anonymity /
    l-diversity / t-closeness DIAGNOSTICS: count + Lap(Δf/ε) noise
    with sensitivity Δf = 1 (one document moves one cell count by 1).

    The noise draw is COUNTER-BASED and deterministic: u = (md5-31
    hash of 'lang:source:dp' + 0.5) / 2^31 ∈ (0,1), then the inverse
    Laplace CDF −(1/ε)·sign(u−½)·ln(1−2|u−½|). A pure function of the
    cell key — reproducible across engines, partitionings and reruns
    (the bootstrap_ci_poisson randomness contract; production swaps a
    per-release salt into the hash input to re-randomize). Everything
    after the one map-side-combined groupBy is |cells|-sized.

    NOTE: deterministic noise keyed only by the cell is NOT a real DP
    release (re-running leaks the same draw; a salt per release
    restores it) — this op pins the MECHANISM arithmetic the release
    pipeline runs.
    """
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    seed = F.concat(F.col("lang"), F.lit(":"), F.col("source"), F.lit(":dp"))
    h = (
        F.conv(F.substring(F.md5(seed), 1, 8), 16, 10)
        .cast("long")
        .bitwiseAND(F.lit(2_147_483_647))
    )
    u = (h.cast("double") + F.lit(0.5)) / F.lit(2147483648.0)
    centered = u - F.lit(0.5)
    noise = (
        F.lit(-1.0 / epsilon)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    return cells.select(
        "lang",
        "source",
        F.lit(float(epsilon)).alias("epsilon"),
        F.round(F.col("n") + noise, 4).alias("noised_n"),
    )
