"""Weighted (multiset) similarity: exact weighted Jaccard and its
ICWS weighted-MinHash sketch twin.

Set-Jaccard treats a shingle that occurs 40 times in both documents
the same as one that occurs once — repeated-boilerplate similarity
(navigation blocks, legal footers, chat-log templates) is
systematically undercounted. Weighted Jaccard over shingle
MULTIPLICITIES, J_w(A,B) = Σ_g min(a_g, b_g) / Σ_g max(a_g, b_g),
is the standard correction, and Σ max = |A| + |B| − Σ min keeps the
plan the exact same self-join shape as set-Jaccard (per-doc totals +
a Σ min aggregate over shared shingles).

The sketch twin is Ioffe's Improved Consistent Weighted Sampling
(ICWS; ICDM 2010): per (element, hash) draw r, c ~ Gamma(2, 1) and
β ~ U(0,1) from element-seeded randomness, then
    t = ⌊ln(w)/r + β⌋,  y = exp(r·(t − β)),  a = c / (y·exp(r)),
and the sample is the (g, t) of the minimal a. Two documents agree on
a sample with probability exactly J_w — the weighted analogue of the
MinHash collision identity — so LSH banding over (g, t) pairs works
unchanged. Randomness is COUNTER-BASED (splitmix64 of (element, hash,
draw) — Gamma(2,1) is the sum of two exponentials, so every draw is
−ln(u·u') of two such uniforms): no RNG objects, fully vectorized,
and the signature is a pure function of the document's weighted set —
partition- and engine-independent. ENGINE-portable too: element ids
are the md5-31 portable hash, band buckets are fixed-coefficient
integer arithmetic, and the DuckDB oracle replicates the whole
kernel (splitmix64 as 32-bit-limb UBIGINT arithmetic; the ln() calls
receive identical dyadic-rational inputs and the pipeline is
empirically invariant under 1-ulp log perturbation), so every ICWS
key is value-hash-checked at the driver gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimir_spark.operators.dedup import (
    BUCKET_COEFFS,
    SHINGLE_WORDS,
    _spread,
)
from mimir_spark.sources.tables import load_table

# The tokenize / memoized-md5 / shingle-fold kernels are shared with
# the set-sketch family — see functions/pykernels.py for the
# bit-exactness contract (and the fix rationale for the round-5
# portable-id regression: one md5 per DISTINCT token per worker).
from mimir_spark.functions.pykernels import (  # noqa: E402
    doc_weighted_set as _doc_weighted_set,
)

WJ_THRESHOLD = 0.5
ICWS_HASHES = 128
ICWS_BANDS = 32  # 4 rows/band — same S-curve operating point as set-LSH


T_CLAMP = 1 << 32  # sample-level clamp — see _icws_bucket_rows


def _icws_bucket_rows(
    sig: DataFrame, rows: int, carry: tuple = ()
) -> DataFrame:
    """(doc_id, band, bucket) rows from ICWS signatures with `rows`
    samples per band: a fixed-coefficient linear combination of the
    band's (g, t) consistent-sample pairs (g and t interleave over the
    shared BUCKET_COEFFS family — a bucket collision needs the full
    consistent sample to agree), computed for every band at once.
    The JVM expression tree for 128/rows bands × 2·rows clamped
    terms is large enough that janino REJECTS the
    generated explode method (observed at rows=4: whole-stage codegen
    falls back to interpreted eval — silently ~an order of magnitude
    slower on the hot candidate path), so the same integer arithmetic
    runs as one (128,)-vector multiply-add per doc inside the Arrow
    pass instead. Identical values: same BUCKET_COEFFS layout
    (position-within-band indexed), same t clamp, int64 throughout.
    The overflow bound is UNCONDITIONAL: g < 2^31, t clamped to
    T_CLAMP = 2^32 (t = ⌊ln(w)/r + β⌋ is typically single-digit but
    unbounded as the Gamma draw r → 0), coefficients < 2^25, rows ≤
    32 ⇒ band sum < 32·2^56 + 32·2^57 < 2^63. A clamped t only MERGES
    buckets — an extra candidate that exact verification removes —
    and the DuckDB oracle applies the identical least() clamp.

    ``carry`` names extra long/int columns of ``sig`` to replicate
    onto every bucket row (e.g. the containment path's size class) —
    carrying them through the kernel keeps the per-r bucket tables
    join-free instead of re-joining a doc-keyed table per r value."""
    import numpy as np
    import pandas as pd

    n = ICWS_HASHES
    cg = np.array(
        [BUCKET_COEFFS[2 * (p % rows)] for p in range(n)], dtype=np.int64
    )
    ct = np.array(
        [BUCKET_COEFFS[2 * (p % rows) + 1] for p in range(n)],
        dtype=np.int64,
    )
    n_bands = n // rows
    clamp = np.int64(T_CLAMP)

    def _buckets(batches):
        for pdf in batches:
            out: dict = {"doc_id": [], "band": [], "bucket": []}
            for c in carry:
                out[c] = []
            for row in pdf.itertuples(index=False):
                g = np.asarray(row.sig_g, dtype=np.int64)
                t = np.minimum(np.asarray(row.sig_t, dtype=np.int64), clamp)
                b = (g * cg + t * ct).reshape(n_bands, rows).sum(axis=1)
                out["doc_id"].extend([int(row.doc_id)] * n_bands)
                out["band"].extend(range(n_bands))
                out["bucket"].extend(b.tolist())
                for c in carry:
                    out[c].extend([getattr(row, c)] * n_bands)
            if out["doc_id"]:
                yield pd.DataFrame(out)

    # Carry columns keep their source dtype (a hardcoded int would
    # overflow a long carry, e.g. a doc-derived id, at Arrow conversion).
    carry_types = {
        f.name: "long" if f.dataType.typeName() in ("long", "bigint") else "int"
        for f in sig.schema.fields
    }
    schema = "doc_id long, band int, bucket long" + "".join(
        f", {c} {carry_types[c]}" for c in carry
    )
    return sig.mapInPandas(_buckets, schema)


def _weighted_arrays(docs: DataFrame) -> DataFrame:
    """(doc_id, gs: array<long>, cs: array<long>): each document's
    weighted set as parallel sorted arrays, computed in ONE Arrow
    pass — tokenize, memoized portable hash, positional-shingle fold,
    per-doc multiset counts. The per-doc count replaces the
    (doc, g)-keyed shuffle the row form needed: shingle multiplicity
    is a row-local fact, so at 100 TB this stage is shuffle-free (the
    old explode + groupBy moved ~the token count through an
    exchange)."""
    import pandas as pd

    def _arrays(batches):
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                ws = _doc_weighted_set(text)
                if ws is None:
                    continue
                out.append((int(doc_id), ws[0].tolist(), ws[1].tolist()))
            if out:
                yield pd.DataFrame(out, columns=["doc_id", "gs", "cs"])

    return _spread(docs.select("doc_id", "text")).mapInPandas(
        _arrays, "doc_id long, gs array<long>, cs array<long>"
    )


def _weighted_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, g, c): per-doc shingle multiplicities over POSITIONAL
    shingles (hashed to int64 — the string never leaves the row).
    Derived from `_weighted_arrays` by a shuffle-free explode (the
    multiset count already happened inside the row)."""
    # element ids are the PORTABLE folded md5-31 hash (not xxhash64):
    # they enter the ICWS counter-based randomness and the banding
    # buckets, so the DuckDB oracle must compute the identical ids.
    # 31-bit collisions only MERGE elements (weights add) — both
    # engines merge identically.
    return (
        _weighted_arrays(docs)
        .select("doc_id", F.explode(F.arrays_zip("gs", "cs")).alias("e"))
        .select(
            "doc_id",
            F.col("e.gs").alias("g"),
            F.col("e.cs").alias("c"),
        )
    )


def _wj_score(threshold: float):
    """(wmin, na, nb) → rounded J_w with the threshold filter — shared
    by both verification paths so the score arithmetic cannot drift."""

    def apply(df: DataFrame) -> DataFrame:
        return (
            df.withColumn(
                "wjaccard",
                F.round(
                    F.col("wmin") / (F.col("na") + F.col("nb") - F.col("wmin")),
                    6,
                ),
            )
            .filter(F.col("wjaccard") >= threshold)
            .select("doc_a", "doc_b", "wjaccard")
        )

    return apply


def fold_weighted_sets(wc: DataFrame) -> DataFrame:
    """(doc_id, g, c) rows → one (doc_id, m: map<g → c>, n) row per
    doc — the verification representation (shared with the streaming
    twin's signature store)."""
    return wc.groupBy("doc_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("g", "c")))
        ).alias("m"),
        F.sum("c").alias("n"),
    )


def fold_weighted_arrays(arr: DataFrame) -> DataFrame:
    """`fold_weighted_sets` from the `_weighted_arrays` form — a
    row-local select (map_from_arrays + an array sum), no shuffle;
    gs is sorted ascending so the map iterates in the same order the
    row-form fold produces."""
    return arr.select(
        "doc_id",
        F.map_from_arrays("gs", "cs").alias("m"),
        F.aggregate(
            "cs", F.lit(0).cast("long"), lambda acc, v: acc + v
        ).alias("n"),
    )


def _wj_verify(cand: DataFrame, sets: DataFrame, threshold: float) -> DataFrame:
    """Exact J_w over candidate (doc_a, doc_b) pairs from folded sets:
    Σ min is one JVM map_zip_with/aggregate expression per candidate
    row — work is |candidates| × set size, shuffle candidate-bounded
    (never the element self-join the sketch path exists to avoid)."""
    sa = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("m").alias("ma"),
        F.col("n").alias("na"),
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("m").alias("mb"),
        F.col("n").alias("nb"),
    )
    wmin = F.aggregate(
        F.map_values(
            F.map_zip_with(
                "ma",
                "mb",
                lambda k, x, y: F.when(
                    x.isNotNull() & y.isNotNull(), F.least(x, y)
                ).otherwise(F.lit(0).cast("long")),
            )
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return _wj_score(threshold)(
        cand.join(sa, "doc_a").join(sb, "doc_b").withColumn("wmin", wmin)
    )


def _weighted_jaccard_pairs(
    wc: DataFrame, cand: DataFrame | None, threshold: float
) -> DataFrame:
    """Exact J_w for either every co-occurring pair (cand=None — the
    self-join correctness path) or a candidate pair set (the verify
    step of the sketch path). Σ max folds to |A|+|B|−Σ min, so only
    the Σ min aggregate ever touches pair-level rows.

    The candidate path NEVER runs the element self-join (that would be
    the quadratic shape the sketch exists to avoid): each doc's
    weighted set folds once to a map<g → c>, candidates join the two
    maps, and Σ min is one JVM map_zip_with/aggregate expression per
    candidate row — work is |candidates| × set size, shuffle is
    candidate-bounded."""
    tot = wc.groupBy("doc_id").agg(F.sum("c").alias("n"))
    score = _wj_score(threshold)
    if cand is not None:
        return _wj_verify(cand, fold_weighted_sets(wc), threshold)
    a, b = wc.alias("a"), wc.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.sum(F.least("a.c", "b.c")).alias("wmin"))
    )
    ta = tot.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    tb = tot.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return score(inter.join(ta, "doc_a").join(tb, "doc_b"))


def dedup_weighted_jaccard(
    spark: SparkSession, sf_dir: str, threshold: float = WJ_THRESHOLD
) -> DataFrame:
    """Exact weighted-Jaccard ≥ threshold pairs over the documents
    table — the multiset upgrade of `dedup_ngram_jaccard` (oracle-
    checked; the self-join is the correctness path, `dedup_icws` is
    the sketch path at scale)."""
    docs = load_table(spark, sf_dir, "documents")
    return _weighted_jaccard_pairs(_weighted_sets(docs), None, threshold)


def _splitmix(x):
    import numpy as np

    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
    return z


def _uniforms(key, j):
    """U(0,1) from a counter-based hash — open interval (never 0, so
    logs are safe): (mantissa + 0.5) / 2^53."""
    import numpy as np

    with np.errstate(over="ignore"):
        h = _splitmix(key + np.uint64(j) * np.uint64(0xD1B54A32D192ED03))
    return ((h >> np.uint64(11)).astype(np.float64) + 0.5) / float(1 << 53)


def _icws_sample(gs, ws, hash_keys, n_hashes: int):
    """The ICWS consistent-sample math for one document: (gs, ws)
    numpy arrays → (sample element ids, sample t levels)."""
    import numpy as np

    key = _splitmix(gs.astype(np.uint64))[:, None] ^ hash_keys[None, :]
    r = -np.log(_uniforms(key, 1) * _uniforms(key, 2))
    c = -np.log(_uniforms(key, 3) * _uniforms(key, 4))
    beta = _uniforms(key, 5)
    t = np.floor(np.log(ws)[:, None] / r + beta)
    # a = c / (y * exp(r)) with y = exp(r*(t - beta));
    # compare in log space: ln a = ln c - r*(t - beta + 1)
    log_a = np.log(c) - r * (t - beta + 1.0)
    kstar = log_a.argmin(axis=0)
    ar = np.arange(n_hashes)
    return gs[kstar], t[kstar, ar].astype(np.int64)


def icws_signatures_arrays(
    arr: DataFrame, n_hashes: int = ICWS_HASHES
) -> DataFrame:
    """doc_id → ICWS signature straight from the `_weighted_arrays`
    form — NO shuffle: the weighted set is already a row-local pair
    of arrays, so the (elements × hashes) Gamma/exp kernel runs in
    the same Arrow pass that reads them."""
    import numpy as np
    import pandas as pd

    hash_keys = _splitmix(
        np.arange(n_hashes, dtype=np.uint64)
        * np.uint64(0xA0761D6478BD642F)
    )

    def _sign(batches):
        for pdf in batches:
            out_rows = []
            for doc_id, gs, cs in zip(pdf["doc_id"], pdf["gs"], pdf["cs"]):
                g = np.asarray(gs, dtype=np.int64)
                w = np.asarray(cs, dtype=np.float64)
                sg, st = _icws_sample(g, w, hash_keys, n_hashes)
                out_rows.append((int(doc_id), sg.tolist(), st.tolist()))
            if out_rows:
                yield pd.DataFrame(
                    out_rows, columns=["doc_id", "sig_g", "sig_t"]
                )

    return arr.mapInPandas(
        _sign, "doc_id long, sig_g array<long>, sig_t array<long>"
    )


def icws_signatures(
    wsets: DataFrame, n_hashes: int = ICWS_HASHES
) -> DataFrame:
    """doc_id → ICWS signature from (doc_id, g, c) ROWS: one groupBy
    folds them to per-doc arrays, then the shared `_icws_sample`
    kernel runs per document. Kept for row-shaped inputs; the batch
    operators feed `icws_signatures_arrays` instead, which skips this
    fold shuffle entirely."""
    folded = wsets.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("g", "c"))).alias("els")
    )
    arr = folded.select(
        "doc_id",
        F.col("els.g").alias("gs"),
        F.col("els.c").alias("cs"),
    )
    return icws_signatures_arrays(arr, n_hashes)


def dedup_icws(
    spark: SparkSession, sf_dir: str, threshold: float = WJ_THRESHOLD
) -> DataFrame:
    """Weighted-Jaccard pairs via ICWS banding + exact verification —
    the scale path for `dedup_weighted_jaccard` (same output contract;
    recall < 1 only through banding misses, precision 1 because the
    verify recomputes exact J_w on candidates only). Banding buckets
    hash the band's (g, t) sample pairs — a collision needs the full
    consistent sample to agree, which happens with probability J_w per
    hash position, so the set-LSH S-curve tuning carries over."""
    docs = load_table(spark, sf_dir, "documents")
    arr = _weighted_arrays(docs).localCheckpoint(eager=True)
    cand = icws_candidates(icws_signatures_arrays(arr))
    return _wj_verify(cand, fold_weighted_arrays(arr), threshold)


def icws_candidates(
    sig: DataFrame, probe: DataFrame | None = None
) -> DataFrame:
    """LSH banding over the ICWS consistent samples: band buckets hash
    the band's (g, t) pairs; docs sharing any bucket are candidates.
    With ``probe`` (a (doc_id, sig_g, sig_t) subset — e.g. one
    micro-batch), only pairs touching a probe doc are generated: the
    join is probe-buckets × sig-buckets, so the incremental per-batch
    cost is O(batch × history) bucket collisions, never O(history²)
    — the same contract as dedup.lsh_candidates."""
    rows = ICWS_HASHES // ICWS_BANDS

    def _buckets(df: DataFrame) -> DataFrame:
        return _icws_bucket_rows(df, rows)

    b = _buckets(sig).alias("b")
    if probe is None:
        a = _buckets(sig).alias("a")
        return (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
        )
    p = _buckets(probe).alias("p")
    return (
        p.join(
            b,
            (F.col("p.band") == F.col("b.band"))
            & (F.col("p.bucket") == F.col("b.bucket"))
            & (F.col("p.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least("p.doc_id", "b.doc_id").alias("doc_a"),
            F.greatest("p.doc_id", "b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def icws_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall of the ICWS-banded pair set against the exact
    weighted-Jaccard pair set — the banding-tuning signal, twin of
    `minhash_dedup_recall` on the weighted side. Precision is 1.0 by
    construction (exact verify); recall counts banding misses."""
    exact = dedup_weighted_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    lsh = dedup_icws(spark, sf_dir).select("doc_a", "doc_b")
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


WC_THRESHOLD = 0.8


def dedup_weighted_containment(
    spark: SparkSession, sf_dir: str, threshold: float = WC_THRESHOLD
) -> DataFrame:
    """Exact WEIGHTED containment Σ_g min(a_g, b_g) / min(|A|, |B|)
    over positional-shingle multiplicities — the multiset upgrade of
    `dedup_containment` (a paragraph pasted into a book three times
    still counts fully against the paragraph's mass, where set
    containment saturates at one occurrence). Same self-join shape as
    the weighted-Jaccard exact path; only the normalizer differs.
    Oracle-checked; `dedup_weighted_containment_lsh` is the per-class
    ICWS scale path (also oracle-checked)."""
    wc = _weighted_sets(load_table(spark, sf_dir, "documents"))
    tot = wc.groupBy("doc_id").agg(F.sum("c").alias("n"))
    a, b = wc.alias("a"), wc.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.sum(F.least("a.c", "b.c")).alias("wmin"))
    )
    ta = tot.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    tb = tot.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn(
            "wcontainment",
            F.round(F.col("wmin") / F.least("na", "nb"), 6),
        )
        .filter(F.col("wcontainment") >= threshold)
        .select("doc_a", "doc_b", "wcontainment")
    )


def _wc_verify(
    cand: DataFrame, sets: DataFrame, threshold: float
) -> DataFrame:
    """Exact weighted CONTAINMENT over candidate pairs from folded
    sets — same map-zip Σ min as _wj_verify, containment normalizer."""
    sa = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("m").alias("ma"),
        F.col("n").alias("na"),
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("m").alias("mb"),
        F.col("n").alias("nb"),
    )
    wmin = F.aggregate(
        F.map_values(
            F.map_zip_with(
                "ma",
                "mb",
                lambda k, x, y: F.when(
                    x.isNotNull() & y.isNotNull(), F.least(x, y)
                ).otherwise(F.lit(0).cast("long")),
            )
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("wmin", wmin)
        .withColumn(
            "wcontainment",
            F.round(F.col("wmin") / F.least("na", "nb"), 6),
        )
        .filter(F.col("wcontainment") >= threshold)
        .select("doc_a", "doc_b", "wcontainment")
    )


def weighted_containment_pairs(
    docs: DataFrame, threshold: float = WC_THRESHOLD
) -> DataFrame:
    """Weighted containment ≥ threshold pairs via PER-CLASS ICWS
    banding + exact verification — the weighted analogue of
    `dedup2.containment_lsh_pairs`, and the scale path for
    `dedup_weighted_containment`.

    The algebra carries over verbatim with weighted masses: C_w ≥ t
    and masses (na ≤ nb) imply J_w ≥ t·na/(na + nb − t·na), ICWS
    samples collide per position with probability exactly J_w, so the
    SAME size-class → rows-per-band table
    (dedup2._containment_band_configs) tunes the banding — classes on
    log2 of the weighted mass instead of the set size. Per r: a
    cross-class join (small side × big side) and a same-class
    self-join, candidates exact-verified (precision 1 by
    construction)."""
    from mimir_spark.operators.dedup2 import _containment_band_configs

    spark = docs.sparkSession
    arr = _weighted_arrays(docs).localCheckpoint(eager=True)
    sets = fold_weighted_arrays(arr).localCheckpoint(eager=True)
    cls_tbl = sets.select(
        "doc_id",
        F.floor(F.log2(F.greatest(F.col("n"), F.lit(1))))
        .cast("int")
        .alias("cls"),
    )
    classes = sorted(
        r.cls for r in cls_tbl.select("cls").distinct().collect()
    )  # ≤ log2(heaviest doc) rows — bounded metadata
    cfg = _containment_band_configs(classes, threshold, ICWS_HASHES)
    rs = sorted({r for _, _, r in cfg})

    side = icws_signatures_arrays(arr).join(
        cls_tbl, "doc_id"
    ).localCheckpoint(eager=False)
    cand_parts = []
    for r in rs:
        cross = [(i, j) for (i, j, rr) in cfg if rr == r and i != j]
        same = [i for (i, j, rr) in cfg if rr == r and i == j]
        bk = _icws_bucket_rows(side, r, carry=("cls",))
        if cross:
            small_cls = sorted({i for i, _ in cross})
            big_cls = sorted({j for _, j in cross})
            pair_ok = F.lit(False)
            for i, j in cross:
                pair_ok = pair_ok | (
                    (F.col("a.cls") == i) & (F.col("b.cls") == j)
                )
            a = bk.filter(F.col("cls").isin(small_cls)).alias("a")
            b = bk.filter(F.col("cls").isin(big_cls)).alias("b")
            cand_parts.append(
                a.join(
                    b,
                    (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.bucket") == F.col("b.bucket"))
                    & pair_ok,
                ).select(
                    F.least("a.doc_id", "b.doc_id").alias("doc_a"),
                    F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
                )
            )
        if same:
            s = bk.filter(F.col("cls").isin(same))
            a, b = s.alias("a"), s.alias("b")
            cand_parts.append(
                a.join(
                    b,
                    (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.bucket") == F.col("b.bucket"))
                    & (F.col("a.cls") == F.col("b.cls"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")),
                ).select(
                    F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                )
            )
    cand = cand_parts[0]
    for part in cand_parts[1:]:
        cand = cand.unionByName(part)
    return _wc_verify(cand.distinct(), sets, threshold)


def dedup_weighted_containment_lsh(
    spark: SparkSession, sf_dir: str, threshold: float = WC_THRESHOLD
) -> DataFrame:
    """`weighted_containment_pairs` over the documents table — the
    100 TB weighted-containment path."""
    return weighted_containment_pairs(
        load_table(spark, sf_dir, "documents"), threshold
    )


def weighted_containment_lsh_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Precision/recall of the per-class ICWS banding vs the exact
    weighted containment pair set — completes the recall-report family
    (set Jaccard / weighted Jaccard / set containment / weighted
    containment)."""
    exact = dedup_weighted_containment(spark, sf_dir).select(
        "doc_a", "doc_b"
    )
    lsh = dedup_weighted_containment_lsh(spark, sf_dir).select(
        "doc_a", "doc_b"
    )
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


def dedup_survivors_icws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_survivors on the ICWS weighted-MinHash pair source —
    completes the survivors family across pair generators (exact
    set-Jaccard, set-LSH, and now weighted): per weighted-near-dup
    cluster keep the longest document (ties → lowest doc_id). The
    clustering/survivor machinery is dedup.dedup_survivors verbatim
    via its callable pair_source; only the pair generator differs,
    so boilerplate-heavy duplicate groups that set-Jaccard
    undercounts land in the keep-list too."""
    from mimir_spark.operators.dedup import dedup_survivors

    return dedup_survivors(
        spark,
        sf_dir,
        threshold=WJ_THRESHOLD,
        pair_source=lambda sp, sd, th: dedup_icws(sp, sd, th),
    )
