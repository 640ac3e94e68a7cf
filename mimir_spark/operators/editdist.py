"""Exact edit-distance dedup via PassJoin partitioning (Li, Deng,
Wang, Feng, "PassJoin: A Partition-based Method for Similarity Joins",
PVLDB 2011).

Why not a brute-force levenshtein self-join: lev() is O(len²) per
pair and the pair space is O(n²) — at corpus scale both are fatal.
PassJoin's pigeonhole guarantee makes the candidate set EXACT: split
every indexed string into K+1 chunks; any string within K edits must
contain at least one chunk VERBATIM (K edits can destroy at most K
chunks), and the matching occurrence's start can drift at most K
positions from the chunk's home position (each edit shifts alignment
by ≤1). So candidates = an equi-join between indexed chunks and probe
substrings drawn from a bounded position window — hot-text popularity
never squares, because the join key is a ~len/(K+1)-char substring
(30-ish chars here), not a frequent token.

Scale shape: chunk and substring generation are map-only explodes
(arrays built per row, no shuffle); the join is keyed on
(chunk_index, xxhash64(substring)) — an 8-byte shuffle key; a hash
collision only ADDS a candidate, which verification removes. Probe
fan-out is O(K²) substrings per doc — independent of corpus size — so
the operator is one equi-join plus a candidate-bounded verify
(one levenshtein per DISTINCT candidate pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimir_spark.operators.dedup import _spread
from mimir_spark.sources.tables import load_table

EDIT_K = 8  # max edit distance — near-identical revision dedup
N_CHUNKS = EDIT_K + 1


def _guarded_seq(lo, hi):
    """F.sequence that yields an EMPTY array when lo > hi — Spark's
    sequence(5, 3) silently counts DOWN, which here would emit
    out-of-range probe starts instead of none."""
    return F.when(lo <= hi, F.sequence(lo, hi)).otherwise(
        F.array().cast("array<int>")
    )


def edit_pairs(
    docs_all: DataFrame, probe_docs: DataFrame, k: int = EDIT_K
) -> DataFrame:
    """All (doc_a, doc_b, edit_distance) pairs with lev ≤ k where at
    least one side is in `probe_docs` — the PassJoin core shared by the
    batch operator (probe = everything) and the streaming twin (probe
    = the arriving micro-batch; the pigeonhole lemma is symmetric, so
    indexing ALL docs' chunks and probing only the NEW side still
    finds every pair that touches a new doc).

    Chunk rule (shared by both sides' arithmetic): base = len // (K+1),
    rem = len % (K+1); the FIRST rem chunks are base+1 chars, so chunk
    i starts at 1 + i·base + min(i, rem) (1-based) with length
    base + (i < rem).

    Probe windows are a SUPERSET of the lemma's: substrings of every
    chunk length admissible for partners within ±K length (lengths
    (len±K)//(K+1) … +1) starting within ±2K of the probe's own chunk-i
    home position (alignment drift ≤K plus chunk-position drift ≤K
    across the admissible length range). Post-join filters re-check
    the tight constraints (|len_a − len_b| ≤ K, |probe_start −
    chunk_start| ≤ K); the final levenshtein keeps only true pairs.
    The brute-force oracle makes any window/chunk off-by-one a missing
    pair at the driver gate, not a silent recall loss.

    Short-doc escape hatch: the pigeonhole argument needs all K+1
    indexed chunks nonempty, i.e. len ≥ K+1. A doc with len ≤ K has
    ≤ K nonempty chunks, all destructible by K edits, so PassJoin can
    miss its pairs. Those docs are routed around the chunk join: every
    pair touching a len ≤ K doc has its partner at len ≤ 2K (length
    filter), so the direct path is a broadcast nested-loop join of the
    tiny short set against the len ≤ 2K slice — candidate count
    |short|·|≤2K-slice|, bounded by the corpus's short-text mass, and
    both paths share the single levenshtein verify. PassJoin itself
    then runs on the len ≥ K+1 docs only, where the lemma holds."""
    n = F.lit(N_CHUNKS)
    all_docs = docs_all.select(
        "doc_id", "text", F.length("text").alias("len")
    )
    all_pdocs = probe_docs.select(
        "doc_id", "text", F.length("text").alias("len")
    )
    # PassJoin runs where its lemma holds (len ≥ K+1); pairs touching
    # shorter docs go through the direct short-doc path below.
    docs = all_docs.filter(F.col("len") >= n)
    pdocs = all_pdocs.filter(F.col("len") >= n)
    base = (F.col("len") / n).cast("int")
    rem = (F.col("len") % n).cast("int")

    def chunk_start(i):  # 1-based home position of chunk i
        return (i * base + F.least(i, rem) + F.lit(1)).cast("int")

    # ---- index side: the K+1 chunks of every doc --------------------
    chunks = F.transform(
        F.sequence(F.lit(0), F.lit(N_CHUNKS - 1)),
        lambda i: F.struct(
            i.cast("int").alias("ci"),
            chunk_start(i).alias("cstart"),
            (base + (i < rem).cast("int")).alias("clen"),
        ),
    )
    idx = (
        docs.select(
            F.col("doc_id").alias("id_s"),
            F.col("len").alias("len_s"),
            "text",
            F.explode(chunks).alias("c"),
        )
        .select(
            "id_s",
            "len_s",
            F.col("c.ci").alias("ci"),
            F.col("c.cstart").alias("cstart"),
            F.xxhash64(
                F.expr("substring(text, c.cstart, c.clen)")
            ).alias("h"),
        )
    )

    # ---- probe side: candidate substrings per (chunk index, length) -
    lmin = ((F.col("len") - k) / n).cast("int")
    lmax = ((F.col("len") + k) / n).cast("int") + 1
    cand_subs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(N_CHUNKS - 1)),
            lambda i: F.flatten(
                F.transform(
                    _guarded_seq(F.greatest(lmin, F.lit(1)), lmax),
                    lambda L: F.transform(
                        _guarded_seq(
                            F.greatest(
                                chunk_start(i) - F.lit(2 * k), F.lit(1)
                            ),
                            F.least(
                                chunk_start(i) + F.lit(2 * k),
                                (F.col("len") - L + 1).cast("int"),
                            ),
                        ),
                        lambda st: F.struct(
                            i.cast("int").alias("ci"),
                            st.cast("int").alias("pstart"),
                            L.cast("int").alias("plen"),
                        ),
                    ),
                )
            ),
        )
    )
    probe = (
        pdocs.select(
            F.col("doc_id").alias("id_r"),
            F.col("len").alias("len_r"),
            "text",
            F.explode(cand_subs).alias("p"),
        )
        .select(
            "id_r",
            "len_r",
            F.col("p.ci").alias("ci"),
            F.col("p.pstart").alias("pstart"),
            F.xxhash64(
                F.expr("substring(text, p.pstart, p.plen)")
            ).alias("h"),
        )
    )

    # SHUFFLE_HASH with the chunk table as build side (guide §3.1):
    # left alone, Catalyst BROADCASTS the probe side — the explode's
    # size estimate hides that it is ~K² substrings per doc, so the
    # planner collected the ~900×|docs|-row probe relation to the
    # driver and rebroadcast it (measured: a 12 s build stage plus a
    # 3.3 s single-threaded driver stall per run). Both sides grow
    # with the corpus, so the scale-correct plan is the (ci, h)-keyed
    # shuffle the module docstring promises; the chunk side is K+1
    # rows/doc, a small per-partition hash build.
    passjoin_cand = (
        idx.hint("shuffle_hash").join(probe, ["ci", "h"])
        .filter(
            (F.col("id_s") != F.col("id_r"))
            & (F.abs(F.col("len_s") - F.col("len_r")) <= k)
            & (F.abs(F.col("pstart") - F.col("cstart")) <= k)
        )
        .select(
            F.least("id_s", "id_r").alias("doc_a"),
            F.greatest("id_s", "id_r").alias("doc_b"),
        )
    )

    # ---- short-doc direct path (len ≤ K on at least one side) -------
    # Any qualifying pair touching probe_docs with a short member is
    # (short ∈ all) × (≤2K ∈ probe)  ∪  (short ∈ probe) × (≤2K ∈ all);
    # the short side broadcasts, the length predicate bounds fan-out,
    # and the shared verify below discharges the candidates exactly.
    def _short_cand(short_side: DataFrame, compat_side: DataFrame):
        s = short_side.filter(F.col("len") < n).select(
            F.col("doc_id").alias("id_s"), F.col("len").alias("len_s")
        )
        t = compat_side.filter(
            F.col("len") <= F.lit(N_CHUNKS - 1 + k)
        ).select(
            F.col("doc_id").alias("id_r"), F.col("len").alias("len_r")
        )
        return t.join(
            F.broadcast(s),
            (F.col("id_s") != F.col("id_r"))
            & (F.abs(F.col("len_s") - F.col("len_r")) <= k),
        ).select(
            F.least("id_s", "id_r").alias("doc_a"),
            F.greatest("id_s", "id_r").alias("doc_b"),
        )

    cand = (
        passjoin_cand.unionByName(_short_cand(all_docs, all_pdocs))
        .unionByName(_short_cand(all_pdocs, all_docs))
        .distinct()
    )

    ta = docs_all.select(
        F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a")
    )
    tb = docs_all.select(
        F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b")
    )
    # BANDED verify (guide §1.2 per-task work): levenshtein with a
    # threshold runs the O(len·k) diagonal band instead of the full
    # O(len²) DP — for ~3000-char docs and k=8 that is ~150× less work
    # per candidate. Semantics are exact below the band: the 3-arg form
    # returns the true distance when it is ≤ k and −1 otherwise, so
    # `>= 0` keeps exactly the rows `<= k` kept, with identical values.
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn(
            "edit_distance",
            F.levenshtein("text_a", "text_b", k).cast("long"),
        )
        .filter(F.col("edit_distance") >= 0)
        .select("doc_a", "doc_b", "edit_distance")
    )


def dedup_edit_distance(
    spark: SparkSession, sf_dir: str, k: int = EDIT_K
) -> DataFrame:
    """All document pairs within `k` character edits (Levenshtein),
    exact, via PassJoin — see edit_pairs for the algorithm and the
    completeness argument; here both sides are the documents table."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    return edit_pairs(docs, docs, k)

def dedup_edit_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the edit-distance pair graph — the
    revision-family grouping step (docs transitively within K edits
    share a cluster_id). Pair generation is the PassJoin operator;
    the component finisher is the shared min-label propagation."""
    from mimir_spark.operators.dedup import min_label_components

    return min_label_components(
        dedup_edit_distance(spark, sf_dir).select("doc_a", "doc_b")
    )


def dedup_edit_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-list over the edit-distance clusters: per revision family
    keep the LONGEST document (ties → lowest doc_id) — the same
    survivor rule every other dedup family uses, so keep-lists from
    different pair sources are directly comparable."""
    from pyspark.sql import Window

    clusters = dedup_edit_clusters(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        clusters.join(docs, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_members", F.count("*").over(Window.partitionBy("cluster_id"))
        )
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("survivor_doc_id"),
            "n_members",
        )
    )
