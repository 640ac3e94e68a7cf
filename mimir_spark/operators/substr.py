"""Exact variable-length substring duplication — the suffix-sorting
refinement of the fixed-n span family (dup_span_fraction /
dedup_span_removal approximate Lee et al. 2022 suffix-array dedup at
one window size; this module recovers VARIABLE span lengths exactly,
up to a cap).

Method (distributed suffix-array-lite): every token position emits
its suffix PREFIX (the next ≤ L tokens, as a token array). Suffixes
are grouped by their leading 3-gram and sorted within the group by
the prefix array; the token-level LCP with the adjacent suffix from a
DIFFERENT document is computed per row, and the per-document MAXIMUM
over those adjacent LCPs is returned.

Exactness argument (why adjacent-only suffices for the per-doc max):
if any suffix of doc A shares an m-token prefix (3 ≤ m ≤ L) with any
suffix of doc B, all suffixes sharing that m-prefix form a CONTIGUOUS
run in the sorted order (token-array order is prefix-compatible), the
run contains suffixes of ≥ 2 documents, and every document with a
suffix in the run has a block boundary inside the run — an ADJACENT
cross-document pair with LCP ≥ m. No adjacent pair can exceed the
true maximum, so per-doc max(adjacent cross-doc LCP) EQUALS the true
max over all cross-doc suffix pairs. The result is also independent
of tie order, which is what lets a DuckDB oracle replicate it without
replicating the engine's sort tie-breaking.

Scale shape: the suffix table is corpus-tokens rows × ≤L-token
arrays (the ~L× token-bytes blow-up is inherent to suffix sorting —
the same factor a suffix-array build pays); the only shuffle is the
3-gram-keyed sort (window partitionBy, skew bounded by hot-3-gram
group sizes, sort not self-join — O(g log g) per group, never g²).
No driver-side iteration, no all-pairs anything.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mimir_spark.functions.text import tokens_col
from mimir_spark.operators.dedup import _spread
from mimir_spark.sources.tables import load_table

LCP_CAP = 16  # longest reported span; repeats longer than this report the cap
MIN_SPAN = 3  # grouping 3-gram = the shortest detectable duplicated span


def _token_lcp(a: Column, b: Column) -> Column:
    """Token-level longest-common-prefix length of two token arrays:
    position of the first mismatch in the zipped equality array
    (null-padded tails count as mismatches), or the shorter length
    when no mismatch exists."""
    eq = F.zip_with(a, b, lambda x, y: F.coalesce(x == y, F.lit(False)))
    first_false = F.array_position(eq, F.lit(False))
    return F.when(first_false == 0, F.least(F.size(a), F.size(b))).otherwise(
        (first_false - 1).cast("long")
    )


def max_dup_span(
    spark: SparkSession, sf_dir: str, cap: int = LCP_CAP
) -> DataFrame:
    """Per document: the EXACT length (in tokens, capped at `cap`) of
    the longest token span that also occurs in at least one OTHER
    document — 0 when no cross-document span of ≥ MIN_SPAN tokens
    exists. The variable-length exact answer the fixed-n ops
    approximate; see the module docstring for the adjacency-exactness
    argument."""
    docs = load_table(spark, sf_dir, "documents")
    return max_span_from_suffixes(
        suffix_rows(docs, cap), docs.select("doc_id")
    )


def suffix_rows(docs: DataFrame, cap: int = LCP_CAP) -> DataFrame:
    """(doc_id, g, pfx) suffix table — one row per token position with
    >= MIN_SPAN remaining tokens; the leading 3-gram is the group key
    (hash-folded: the shuffle moves 8 bytes, the grouping only needs
    equality), the <=cap token prefix array is the sort key and LCP
    operand. A SET monoid over disjoint doc batches — the state table
    the streaming twin persists per micro-batch."""
    toks = (
        _spread(docs)
        .select("doc_id", tokens_col("text").alias("t"))
        # docs shorter than the group 3-gram can't hold a >=3-token
        # span (and Spark's sequence(1, 0) would run DESCENDING)
        .filter(F.size("t") >= MIN_SPAN)
    )
    return toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - (MIN_SPAN - 1)),
                lambda i: F.struct(
                    F.xxhash64(F.concat_ws(" ", F.slice("t", i, MIN_SPAN))).alias(
                        "g"
                    ),
                    F.slice("t", i, cap).alias("pfx"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", "s.g", "s.pfx")


def max_span_from_suffixes(sfx: DataFrame, doc_ids: DataFrame) -> DataFrame:
    """The sort + adjacent-LCP + per-doc max over a suffix table — the
    only scoring code path, shared by the batch operator and the
    streaming finalizer so the two are bit-identical."""
    w = Window.partitionBy("g").orderBy("pfx")
    neighbored = sfx.select(
        "doc_id",
        "pfx",
        F.lag("pfx").over(w).alias("prev_pfx"),
        F.lag("doc_id").over(w).alias("prev_doc"),
        F.lead("pfx").over(w).alias("next_pfx"),
        F.lead("doc_id").over(w).alias("next_doc"),
    )
    lcp = F.greatest(
        F.when(
            F.col("prev_doc").isNotNull() & (F.col("prev_doc") != F.col("doc_id")),
            _token_lcp(F.col("pfx"), F.col("prev_pfx")),
        ).otherwise(F.lit(0)),
        F.when(
            F.col("next_doc").isNotNull() & (F.col("next_doc") != F.col("doc_id")),
            _token_lcp(F.col("pfx"), F.col("next_pfx")),
        ).otherwise(F.lit(0)),
    )
    per_doc = (
        neighbored.select("doc_id", lcp.alias("lcp"))
        .groupBy("doc_id")
        .agg(F.max("lcp").alias("m"))
    )
    return doc_ids.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.when(F.coalesce("m", F.lit(0)) >= MIN_SPAN, F.coalesce("m", F.lit(0)))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("max_dup_span"),
    )
