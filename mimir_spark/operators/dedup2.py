"""Second-generation dedup operators: prefix-filtered exact set-
similarity join (AllPairs/PPJoin family) and SemDeDup-style semantic
dedup over embeddings.

Why another exact-Jaccard path: `dedup_ngram_jaccard` self-joins the
full shingle table, so one boilerplate shingle shared by k documents
produces k² join rows — quadratic in hot-shingle popularity. Prefix
filtering (Chaudhuri et al. 2006 "A Primitive Operator for Similarity
Joins"; Bayardo et al. 2007 "Scaling Up All Pairs Similarity Search")
keeps the output EXACT while joining only on each document's RAREST
shingles: order the universe by document frequency, take the first
|x| − ⌈t·|x|⌉ + 1 shingles of each doc, and any pair with J ≥ t is
guaranteed to collide on at least one prefix element. Hot boilerplate
shingles sit at the END of every prefix ordering, so they never
generate candidates — the exact-path answer to the skew blowup,
complementary to MinHash-LSH (which is probabilistic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimir_spark.functions.text import word_shingles
from mimir_spark.operators.dedup import (
    SHINGLE_WORDS,
    N_EMB_CELLS,
    _spread,
    assign_nearest_cell,
)
from mimir_spark.sources.tables import load_table


def dedup_jaccard_prefix(
    spark: SparkSession, sf_dir: str, threshold: float = 0.5
) -> DataFrame:
    """Exact Jaccard ≥ threshold pairs via PREFIX-FILTERED join —
    output identical to `dedup_ngram_jaccard` (same oracle), different
    plan shape:

    1. per-doc distinct shingle set (one corpus scan);
    2. global shingle document-frequency (vocabulary-sized aggregate,
       map-side combined);
    3. each doc's shingles ordered (df, shingle) ascending — rarest
       first, deterministic tie-break — and cut to the prefix length
       p = n − ⌈t·n⌉ + 1;
    4. candidates = prefix self-join (keyed on the shingle's xxhash64 —
       8-byte shuffle key; a hash collision only ADDS a candidate,
       verification removes it) + the length filter
       min(|A|,|B|) ≥ t·max(|A|,|B|) that J ≥ t implies;
    5. exact verification: one array_intersect over the full string
       shingle sets per candidate pair.

    Guarantee (standard prefix-filter lemma): if J(A,B) ≥ t then A and
    B share an element inside BOTH prefixes under any common total
    order — pairs sharing only suffix (frequent) shingles cannot reach
    the threshold. At 100 TB the candidate join's fan-out is bounded by
    rare-shingle collisions instead of hot-shingle popularity²; the df
    table is vocabulary-sized and the ordering sort is per-document
    (array_sort inside the row, not a shuffle).

    No shingle STRING ever leaves the row that built it: each shingle
    is xxhash64-folded once and the df count, ordering, prefix join,
    and set verification all run over 64-bit longs (~3× faster than
    the string form; same move as the span ops). Distinct strings
    collide at ~(set size)²/2^64 ≈ 1e-14 per pair — far below the
    6dp rounding already applied to the score — so hashed Jaccard is
    string Jaccard for every practical purpose, and the (df, hash)
    order is just as valid a total order for the lemma.

    Rounding-boundary asymmetry (shared with dedup_containment_prefix):
    the prefix lemma guarantees a collision only for pairs whose TRUE
    score ≥ t, while the output filter keys on the 6dp-ROUNDED score —
    a pair with true score in [t − 5e-7, t) that rounds up to t could
    pass the self-join twin's filter yet miss the prefix. Reaching
    that half-ulp band needs a true-score resolution below 1e-6, i.e.
    shingle-set sizes ~10⁶ (megaword documents) — impossible at any
    test SF and pathological in practice; at such sizes, widen the
    prefix by one element (p+1 covers the band) if bit-equality with
    the rounded filter must hold."""
    docs = load_table(spark, sf_dir, "documents")
    # hsets feeds FOUR branches (df explode, the ordered join, and
    # both verify sides); un-cut, each branch re-runs the tokenize +
    # shingle-concat + hash pass (the before-plan held 12 parquet
    # scans). One lazy lineage cut computes it once (guide §3.3/§5);
    # lazy, so materialization rides the first consuming job.
    hsets = (
        _spread(docs)
        .select(
            "doc_id",
            F.transform(
                word_shingles("text", SHINGLE_WORDS), lambda s: F.xxhash64(s)
            ).alias("hs"),
        )
        .localCheckpoint(eager=False)
    )
    ex = hsets.select("doc_id", F.explode("hs").alias("h"))
    df_tbl = ex.groupBy("h").agg(F.count("*").alias("df"))
    ordered = (
        ex.join(df_tbl, "h")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "h"))).alias("ord"))
    )
    n = F.size("ord")
    p = (n - F.ceil(F.lit(threshold) * n) + 1).cast("int")
    prefix = ordered.select(
        "doc_id",
        n.alias("n_sh"),
        F.explode(
            F.slice(F.transform("ord", lambda s: s["h"]), F.lit(1), p)
        ).alias("h"),
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.least("a.n_sh", "b.n_sh")
                >= F.lit(threshold) * F.greatest("a.n_sh", "b.n_sh")
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = hsets.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("sh_a"))
    sb = hsets.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("sh_b"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.size("sh_a") + F.size("sh_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


SEMDEDUP_THRESHOLD = 0.5


def semdedup(
    spark: SparkSession, sf_dir: str, threshold: float = SEMDEDUP_THRESHOLD
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, "SemDeDup:
    Data-efficient learning at web-scale through semantic
    deduplication"): cluster embeddings with k-means-lite, then flag
    WITHIN-CLUSTER semantic duplicates — a vector is a duplicate if
    some LOWER-id member of its cell has cosine ≥ threshold (the
    lowest-id member of every dup group survives, deterministic).
    Output: (vec_id, cell, max_sim_prior, is_dup).

    This is the approximation `dedup_embedding` is the exact twin of:
    clustering makes the quadratic verification per-cell instead of
    per-corpus, at the cost of missing cross-cell pairs — the trade
    the published method makes deliberately (cross-cluster neighbours
    are far by construction when clusters are tight).

    Scale shape: centroid assignment is one NumPy GEMM per Arrow
    batch (assign_nearest_cell — map-only, no ×cells fan-out, same
    kernel as dedup_embedding); the per-cell
    kernel is ONE NumPy matmul of the cell's normalized block via
    applyInPandas — shuffle keyed on cell, corpus moved exactly once.
    At 100 TB you raise the cell count so every cell fits an executor
    (the paper runs 50k clusters for LAION-scale corpora); AQE splits
    a skewed cell's shuffle partition but the kernel itself needs the
    whole cell, which is why cell count — not partition count — is
    the knob."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    cents = (
        emb.filter(F.col("vec_id") % 31 == 0)
        .orderBy("vec_id")
        .limit(N_EMB_CELLS)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("cent"))
    )
    if not cents.take(1):  # tiny-input fallback, same as dedup_embedding
        cents = (
            emb.orderBy("vec_id")
            .limit(N_EMB_CELLS)
            .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("cent"))
        )
    assigned = assign_nearest_cell(emb, cents)

    def _cell_dups(key, pdf):
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy(np.int64)
        E = np.array(list(pdf["embedding"]), dtype=np.float64)
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        S = np.round(En @ En.T, 6)
        # max similarity to any STRICTLY LOWER-id member (ids sorted)
        tril = np.tril(S, k=-1)
        tril[np.triu_indices_from(S)] = -np.inf
        max_prior = tril.max(axis=1)
        max_prior[0] = -np.inf
        out_max = np.where(np.isfinite(max_prior), max_prior, -1.0)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cell": key[0],
                "max_sim_prior": out_max,
                "is_dup": (out_max >= threshold).astype(np.int64),
            }
        )

    return assigned.groupBy("cell").applyInPandas(
        _cell_dups, "vec_id long, cell long, max_sim_prior double, is_dup long"
    )


def dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-method near-dup AGREEMENT matrix: for every pair of pair
    sources (exact shingle Jaccard, prefix-filtered Jaccard,
    MinHash+LSH, SimHash), how many duplicate pairs each finds and how
    many they share — the calibration artifact a pipeline owner reads
    before choosing the production method/threshold (the dedup-wide
    generalization of `minhash_dedup_recall`'s two-method report).

    All four pair sets are candidate-sized (orders of magnitude
    smaller than the corpus), so the comparison joins are trivial next
    to pair generation; the expensive generators run once each and are
    localCheckpointed so the 6 pairwise comparisons don't re-run them.
    Oracle-checked: all four pair sources are engine-portable (the
    MinHash/SimHash chains use the pinned-seed md5-portable hash
    family), so the full matrix is value-hash-checked in DuckDB."""
    from mimir_spark.operators.dedup import (
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
        dedup_simhash,
    )

    methods = {
        "jaccard": dedup_ngram_jaccard,
        "prefix": dedup_jaccard_prefix,
        "minhash": dedup_minhash_lsh,
        "simhash": dedup_simhash,
    }
    pair_sets = {
        name: fn(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
        for name, fn in methods.items()
    }
    counts = {name: df.count() for name, df in pair_sets.items()}
    rows = []
    names = sorted(methods)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            n_common = (
                pair_sets[a]
                .join(pair_sets[b], ["doc_a", "doc_b"], "left_semi")
                .count()
            )
            union = counts[a] + counts[b] - n_common
            rows.append(
                (
                    a,
                    b,
                    counts[a],
                    counts[b],
                    n_common,
                    round(n_common / union, 6) if union else 1.0,
                )
            )
    return spark.createDataFrame(
        rows,
        "method_a string, method_b string, n_a long, n_b long, "
        "n_common long, pair_jaccard double",
    )


def dedup_containment_prefix(
    spark: SparkSession, sf_dir: str, threshold: float = 0.8
) -> DataFrame:
    """Exact shingle CONTAINMENT ≥ threshold pairs via ASYMMETRIC
    prefix filtering — output identical to `dedup_containment` (same
    oracle), without its full shingle self-join.

    Containment C(A,B) = |A∩B| / min(|A|,|B|) only constrains the
    SMALLER set, so the prefix lemma applies one-sided: if the
    intersection avoided the smaller set's (df-ordered) prefix of
    length n − ⌈t·n⌉ + 1, then |A∩B| ≤ ⌈t·n⌉ − 1 < t·min — so every
    qualifying pair collides between the smaller doc's PREFIX and the
    other doc's FULL set. Candidates therefore come from
    prefix-table ⋈ full-occurrence-table (size_prefix ≤ size_other;
    the equal-size tie keeps doc-id order to avoid double emission),
    and the prefix side only ever carries RARE shingles — the df
    ordering pushes boilerplate shingles out of prefixes, which is
    what bounds the join against hot-shingle fan-out. Verification is
    one array_intersect per candidate over the hashed sets (64-bit
    collision odds ~1e-14/pair — see dedup_jaccard_prefix, including
    the note on the 6dp rounding-boundary asymmetry, which applies
    here one-sided too)."""
    docs = load_table(spark, sf_dir, "documents")
    # shared-shingle-table lineage cut — see dedup_jaccard_prefix
    hsets = (
        _spread(docs)
        .select(
            "doc_id",
            F.transform(
                word_shingles("text", SHINGLE_WORDS), lambda s: F.xxhash64(s)
            ).alias("hs"),
        )
        .localCheckpoint(eager=False)
    )
    ex = hsets.select(
        "doc_id", F.size("hs").alias("n_sh"), F.explode("hs").alias("h")
    )
    df_tbl = ex.groupBy("h").agg(F.count("*").alias("df"))
    ordered = (
        ex.join(df_tbl, "h")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "h"))).alias("ord"))
    )
    n = F.size("ord")
    p = (n - F.ceil(F.lit(threshold) * n) + 1).cast("int")
    prefix = ordered.select(
        F.col("doc_id").alias("small_id"),
        n.alias("n_small"),
        F.explode(
            F.slice(F.transform("ord", lambda s: s["h"]), F.lit(1), p)
        ).alias("h"),
    )
    full = ex.select(
        F.col("doc_id").alias("big_id"), F.col("n_sh").alias("n_big"), "h"
    )
    pa, fb = prefix.alias("p"), full.alias("f")
    cand = (
        pa.join(
            fb,
            (F.col("p.h") == F.col("f.h"))
            & (F.col("p.small_id") != F.col("f.big_id"))
            & (
                (F.col("p.n_small") < F.col("f.n_big"))
                | (
                    (F.col("p.n_small") == F.col("f.n_big"))
                    & (F.col("p.small_id") < F.col("f.big_id"))
                )
            ),
        )
        .select(
            F.least("p.small_id", "f.big_id").alias("doc_a"),
            F.greatest("p.small_id", "f.big_id").alias("doc_b"),
        )
        .distinct()
    )
    sa = hsets.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("sh_a"))
    sb = hsets.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("sh_b"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "containment",
            F.round(F.col("n_common") / F.least(F.size("sh_a"), F.size("sh_b")), 6),
        )
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "containment")
    )


def embedding_clusters(
    spark: SparkSession, sf_dir: str, threshold: float = 0.45
) -> DataFrame:
    """Semantic clusters: connected components over the EXACT
    embedding near-dup pair graph (`dedup_embedding`, cosine ≥
    threshold) — every vector in a qualifying pair gets its
    component's min vec_id as cluster_id. The embedding-space twin of
    `dedup_clusters`: where SemDeDup prunes within k-means cells,
    this materializes the actual similarity components (transitive
    closure), the unit a curation pass keeps one representative from.

    Components come from the O(log n)-round alternating star
    contraction (graph.connected_components_star) — near-dup chains in
    embedding space (A≈B≈C with cos(A,C) below threshold) are exactly
    the shape that makes label propagation pay diameter-many rounds.
    Pair generation is the cell-blocked exact plan (no cartesian);
    everything after is pair-sized."""
    from mimir_spark.operators.dedup import dedup_embedding
    from mimir_spark.operators.graph import connected_components_star

    pairs = dedup_embedding(spark, sf_dir, threshold).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    return connected_components_star(pairs).select(
        F.col("node").alias("vec_id"), F.col("component").alias("cluster_id")
    )


LSH_CONFIGS = ((8, 16), (16, 8), (32, 4), (64, 2))


def lsh_tuning_curve(
    spark: SparkSession, sf_dir: str, threshold: float = 0.5
) -> DataFrame:
    """Banding-configuration tuning curve for the MinHash-LSH dedup
    path: for each (bands b, rows-per-band r) split of the 128-hash
    signature, the expected candidate recall over the corpus's OBSERVED
    duplicate pairs — E[1 − (1 − J^r)^b] averaged over the exact pair
    set — plus the analytic threshold (1/b)^(1/r) where the S-curve
    crosses 50%. This is the number you read before committing a
    banding config (the dedup twin of ann_ivf_recall's probe tuning),
    computed from the S-curve formula instead of re-running LSH per
    config.

    Cost: the exact pair set (tuning scale only) × 4 config rows —
    a broadcast cross join over a candidate-sized table; at production
    scale you feed the same curve from a SAMPLE of pairs."""
    from mimir_spark.operators.dedup import dedup_ngram_jaccard

    pairs = dedup_ngram_jaccard(spark, sf_dir, threshold).select("jaccard")
    conf = spark.createDataFrame(
        [(b, r) for b, r in LSH_CONFIGS], "n_bands long, rows_per_band long"
    )
    p_catch = 1.0 - F.pow(
        1.0 - F.pow(F.col("jaccard"), F.col("rows_per_band")), F.col("n_bands")
    )
    return (
        pairs.crossJoin(F.broadcast(conf))
        .groupBy("n_bands", "rows_per_band")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.avg(p_catch), 6).alias("expected_recall"),
        )
        .withColumn(
            "s_curve_threshold",
            F.round(
                F.pow(1.0 / F.col("n_bands"), 1.0 / F.col("rows_per_band")), 6
            ),
        )
    )


# ---- Asymmetric containment LSH (size-class-tuned banding) --------------
#
# Symmetric Jaccard banding cannot see a paragraph inside a book:
# containment C = |A∩B|/min can be 1.0 while J = |A∩B|/|A∪B| ~ na/nb
# sits far below any Jaccard-tuned banding threshold. But C >= t and
# sizes (na <= nb) IMPLY a Jaccard floor J >= t*na/(na + nb - t*na) -
# so group documents into geometric size classes and tune rows-per-band
# PER CLASS PAIR from that implied floor: extreme-ratio pairs get
# permissive bands (down to r=1 - collision probability per band is
# exactly J, so 128 single-row bands catch J=0.05 pairs with
# probability 1-(1-J)^128 ~ 0.999), near-equal-size pairs keep the
# selective Jaccard config. This is the sketch-side answer to the same
# asymmetry the (exact) one-sided prefix lemma exploits in
# dedup_containment_prefix. The element universe is unweighted shingle
# sets, so the size asymmetry - not element weights - is the recall
# gap; class-tuned banding closes it without the ICWS weighted-MinHash
# machinery.

CONTAINMENT_LSH_THRESHOLD = 0.8


def _containment_band_configs(
    classes: list[int], threshold: float, n_hashes: int = 128
) -> list[tuple[int, int, int]]:
    """(class_small, class_big, rows_per_band) for every ordered class
    pair: the largest power-of-two r whose S-curve threshold
    (1/b)^(1/r) still sits at or below the pair's implied Jaccard
    floor (worst case: smallest |A| in the small class vs largest |B|
    in the big class). Driver-side over O(log(max_doc)^2) pairs -
    bounded metadata."""
    out = []
    rs = [r for r in (32, 16, 8, 4, 2, 1) if n_hashes % r == 0]
    for i in classes:
        for j in classes:
            if i > j:
                continue
            na_min = 1 << i
            nb_max = (1 << (j + 1)) - 1
            j_floor = threshold * na_min / (na_min + nb_max - threshold * na_min)
            r_sel = 1
            for r in rs:
                b = n_hashes // r
                if (1.0 / b) ** (1.0 / r) <= j_floor:
                    r_sel = r
                    break
            out.append((i, j, r_sel))
    return out


R1_MIN_COLLISIONS = 2  # band hits required at the r=1 tier


def containment_lsh_pairs(
    docs: DataFrame, threshold: float = CONTAINMENT_LSH_THRESHOLD
) -> DataFrame:
    """Containment >= threshold pairs with LSH-banded candidates and
    EXACT hashed-set verification — the scalable sketch twin of
    `dedup_containment_prefix` (output contract identical to
    `dedup_containment`; recall < 1 only through banding misses,
    precision 1 by construction since verification is exact).

    Plan: one doc-table pass (shared _minhash_doc_table), size-class
    tag per doc, bucket explosion at EVERY rows-per-band value the
    class-pair table needs (≤ |{r}| band sets per doc — constant
    fan-out), folded into ONE (r, band, bucket)-keyed self-join: the
    a-side holds each doc's bucket rows at the r values where its
    class can be the SMALL side of some class pair, the b-side where
    it can be the BIG side. The per-r per-side class restriction
    stays PRE-join — at r=1 the bulk of bucket collisions are
    large×large docs sharing a hot signature minimum, every one
    invalid for r=1 (near-equal sizes demand a selective r), so
    keeping them out of the join sides bounds a hot bucket's pair
    count to |small|×|big| instead of |all|² (measured at sf0.1:
    757k unrestricted vs 110k restricted r=1 pairs). Exact
    (cls_a, cls_b, r) validity rides a broadcast semi-join, so a
    collision whose class pair was assigned a different r dies
    pipelined, never shuffled. One join + one distinct replaces the
    previous per-r join pair (up to 12 joins / ~24 exchanges — pure
    stage overhead at bench scale, and 12 recomputes of the shared
    bucket table at any scale). The exact verify is one
    array_intersect per survivor."""
    from mimir_spark.operators.dedup import (
        N_HASHES,
        _minhash_doc_table,
    )

    # ONE shuffle-free Arrow pass yields the signatures AND the
    # portable folded shingle sets (sizes/classes + exact verify) —
    # this replaces two separate corpus passes (a string-shingle +
    # xxhash64 fold for verification and a signature pass). Both
    # engines now verify on the SAME md5-31 folded family, so a
    # 31-bit merge happens identically on both sides. LAZY cut: the
    # classes collect just below materializes it, so the kernel pass
    # and the class scan share ONE job instead of two barriers.
    tbl = _minhash_doc_table(docs).localCheckpoint(eager=False)
    hsets = tbl.select("doc_id", F.col("sh_set").alias("hs"))
    side = tbl.select(
        "doc_id",
        "sig",
        F.floor(F.log2(F.greatest(F.size("sh_set"), F.lit(1))))
        .cast("int")
        .alias("cls"),
    )
    classes = sorted(
        r.cls for r in side.select("cls").distinct().collect()
    )  # ≤ log2(longest doc) rows — bounded metadata
    cfg = _containment_band_configs(classes, threshold, N_HASHES)
    rs = sorted({r for _, _, r in cfg})
    # Which classes can play which side at each r (same-class pairs
    # put the class on both sides).
    a_cls = {r: sorted({i for i, _, rr in cfg if rr == r}) for r in rs}
    b_cls = {r: sorted({j for _, j, rr in cfg if rr == r}) for r in rs}

    # Bucket rows as ONE Arrow kernel per side (round 14 — the
    # _icws_bucket_rows precedent applied to the set-sketch side, for
    # a different reason: the expression form built an
    # (N_HASHES//r)-struct literal array per r tier, and Catalyst
    # spent a measured ~6.7 s PER RUN re-optimizing that tree — a
    # driver-side stall between jobs (guide §7.3) longer than all the
    # stages combined. The kernel computes the identical
    # fixed-coefficient int64 arithmetic (Σ sig[b·r+j]·C[j]; integer
    # adds are associative, so the vectorized sum is bit-exact) with
    # the per-r class restriction applied as a mask, emitting every
    # tier from one pass over the checkpointed doc table.)
    import numpy as np
    import pandas as pd

    from mimir_spark.operators.dedup import BUCKET_COEFFS

    coeff = {
        r: np.array(
            [BUCKET_COEFFS[p % r] for p in range(N_HASHES)], dtype=np.int64
        )
        for r in rs
    }

    def _bucket_rows(side_cls: dict[int, list[int]]) -> DataFrame:
        cls_lists = {r: np.array(side_cls[r], dtype=np.int64) for r in rs}

        def _k(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                sig = np.array(list(pdf["sig"]), dtype=np.int64)
                cls = pdf["cls"].to_numpy(np.int64)
                ids = pdf["doc_id"].to_numpy(np.int64)
                outs = []
                for r in rs:
                    if len(cls_lists[r]) == 0:
                        continue
                    mask = np.isin(cls, cls_lists[r])
                    if not mask.any():
                        continue
                    S = sig[mask]
                    nb = N_HASHES // r
                    b = (S * coeff[r][None, :]).reshape(
                        len(S), nb, r
                    ).sum(axis=2)
                    outs.append(
                        pd.DataFrame(
                            {
                                "doc_id": np.repeat(ids[mask], nb),
                                "cls": np.repeat(cls[mask], nb),
                                "r": np.full(
                                    len(S) * nb, r, dtype=np.int64
                                ),
                                "band": np.tile(
                                    np.arange(nb, dtype=np.int64), len(S)
                                ),
                                "bucket": b.reshape(-1),
                            }
                        )
                    )
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        return side.mapInPandas(
            _k, "doc_id long, cls int, r int, band int, bucket long"
        )

    # (cls_a, cls_b, r) validity as ONE packed-int isin (cls <= 20,
    # r <= 32, so cls_a*4096 + cls_b*64 + r is collision-free and far
    # from overflow): a single IN over <=|cfg| literals is a tiny
    # codegen fragment — unlike the OR-chain predicate that risked
    # the janino rejection the ICWS kernel hit — and it drops the
    # broadcast exchange + semi-join the previous cfg-table carried.
    valid_keys = [i * 4096 + j * 64 + rr for i, j, rr in cfg]
    a = _bucket_rows(a_cls).alias("a")
    b = _bucket_rows(b_cls).alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.r") == F.col("b.r"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (
                (F.col("a.cls") < F.col("b.cls"))
                | (
                    (F.col("a.cls") == F.col("b.cls"))
                    & (F.col("a.doc_id") < F.col("b.doc_id"))
                )
            ),
        )
        .filter(
            (
                F.col("a.cls") * 4096 + F.col("b.cls") * 64 + F.col("a.r")
            ).isin(valid_keys)
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.r").alias("r"),
            F.col("a.band").alias("band"),
        )
        # r=1 needs >= R1_MIN_COLLISIONS distinct band hits: its
        # single-hash S-curve threshold ((1/128)^1 ~ 0.008) sits ~6x
        # below every class pair's J floor (>= ~0.05), so one-band
        # collisions are overwhelmingly background noise (measured at
        # sf0.1: ~169k single-hit candidates -> 256 true pairs).
        # Requiring 2 of 128 bands moves the operating point to
        # P(miss) = (1-J)^128 + 128 J (1-J)^127 <= ~1% at the worst
        # J floor, while the r >= 2 tiers keep their one-hit rule.
        # The same aggregation replaces the pair distinct, so the
        # shuffle count is unchanged — only the verify input shrinks.
        .select(
            F.least("doc_a", "doc_b").alias("pa"),
            F.greatest("doc_a", "doc_b").alias("pb"),
            "r",
            "band",
        )
        .groupBy("pa", "pb")
        .agg(
            F.max("r").alias("r"),  # a pair has exactly one valid r
            # size(collect_set) instead of countDistinct: ONE exchange
            # (countDistinct expands to two); bands per pair <= 128 so
            # the set state is bounded.
            F.size(F.collect_set("band")).alias("nb"),
        )
        .filter((F.col("r") >= 2) | (F.col("nb") >= R1_MIN_COLLISIONS))
        .select(F.col("pa").alias("doc_a"), F.col("pb").alias("doc_b"))
    )
    sa = hsets.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("sh_a"))
    sb = hsets.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("sh_b"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "containment",
            F.round(
                F.col("n_common")
                / F.least(F.size("sh_a"), F.size("sh_b")),
                6,
            ),
        )
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "containment")
    )


def dedup_containment_lsh(
    spark: SparkSession, sf_dir: str,
    threshold: float = CONTAINMENT_LSH_THRESHOLD,
) -> DataFrame:
    """`containment_lsh_pairs` over the documents table — the 100 TB
    containment path (candidates bounded by banding, never a shingle
    self-join)."""
    return containment_lsh_pairs(
        load_table(spark, sf_dir, "documents"), threshold
    )


def containment_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-generation quality report for the asymmetric
    containment banding: precision/recall of the LSH-verified pair
    set against the exact containment pair set (`dedup_containment`),
    the banding-tuning signal — twin of `minhash_dedup_recall` on the
    containment side. Verification is exact, so precision is 1.0 by
    construction; recall counts banding misses."""
    from mimir_spark.operators.dedup import dedup_containment

    exact = dedup_containment(spark, sf_dir).select("doc_a", "doc_b")
    lsh = dedup_containment_lsh(spark, sf_dir).select("doc_a", "doc_b")
    n_exact = exact.count()
    n_lsh = lsh.count()
    n_hit = exact.join(lsh, ["doc_a", "doc_b"], "left_semi").count()
    return spark.createDataFrame(
        [
            (
                n_exact,
                n_lsh,
                n_hit,
                round(n_hit / n_lsh, 6) if n_lsh else 1.0,
                round(n_hit / n_exact, 6) if n_exact else 1.0,
            )
        ],
        "n_exact_pairs long, n_lsh_pairs long, n_hit long, "
        "precision double, recall double",
    )
