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
