"""Text-analysis operators for training-data pipelines: char-trigram
naive-Bayes language ID (model + argmax + confidence margins), quality
scoring, token counting, document fingerprinting.

Everything is pure Column expressions (codegen'd, no Python), and every
formula is written in engine-portable arithmetic so the DuckDB oracle
can compute the identical answer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mimir_spark.functions.spread import spread_small_scan
from mimir_spark.functions.text import MOD, BASE, tokens_col
from mimir_spark.sources.tables import load_table

# Built-in multilingual seed sentences for the char-trigram language
# model — one deterministic high-frequency-function-word passage per
# language, written for this repo (lowercase, no apostrophes, so no
# engine case-folding is ever needed). They anchor each language's
# SCRIPT and function-word trigrams in the model even when the labeled
# training slice is domain-skewed; zh/ja/ko exist only here (the
# corpus has no real CJK text), which is exactly what lets the model
# identify genuinely CJK documents.
LANG_SEED: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog and then it runs"
        " to the house of the old man with a friend that is always"
        " there for them because they want to see what happens when"
        " the sun goes down and the night comes with all of its stars"
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund und"
        " dann läuft er zu dem haus des alten mannes mit einem freund"
        " der immer für sie da ist weil sie sehen wollen was passiert"
        " wenn die sonne untergeht und die nacht mit allen sternen kommt"
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso y luego"
        " corre hacia la casa del viejo hombre con un amigo que siempre"
        " está allí para ellos porque quieren ver lo que pasa cuando el"
        " sol se pone y la noche llega con todas sus estrellas"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux et"
        " puis il court vers la maison du vieil homme avec un ami qui"
        " est toujours là pour eux parce que ils veulent voir ce qui se"
        " passe quand le soleil se couche et la nuit vient avec toutes"
        " ses étoiles"
    ),
    "zh": (
        "敏捷的棕色狐狸跳过了懒惰的狗然后它跑到老人的房子那里和一个朋友在一起"
        "因为他们想看看当太阳下山的时候会发生什么事情夜晚带着所有的星星来了"
        "我们的世界是一个很大的地方每个人都在这里生活和工作"
    ),
    "ja": (
        "すばやい茶色のきつねはなまけものの犬をとびこえてそれからふるい男の家に"
        "はしりますともだちはいつもそこにいますなぜならたいようがしずむときに"
        "なにがおこるかをみたいからですよるはすべてのほしとともにやってきます"
    ),
    "ko": (
        "빠른 갈색 여우가 게으른 개를 뛰어넘고 그리고 나서 오래된 남자의 집으로"
        " 달려갑니다 친구는 항상 거기에 있습니다 왜냐하면 해가 질 때 무슨 일이"
        " 일어나는지 보고 싶기 때문입니다 밤은 모든 별들과 함께 찾아옵니다"
    ),
}

# Model shape: per language keep the top LANG_TOPT trigrams by count
# (ties on the trigram string); the scoring vocabulary V is the union
# across languages, so |model| ≤ |langs| · |V| — bounded and
# broadcastable regardless of corpus size.
LANG_TOPT = 200
# labeled training slice: deterministic 30% of docs by id
LANG_TRAIN_MOD, LANG_TRAIN_KEEP = 10, 3

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
# Kept RE2-compatible (no backrefs/lookahead) so DuckDB matches Java.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


# char trigrams of the text column as an array expression. Parity is
# BMP-only: Spark's length/substring count UTF-16 code units while
# DuckDB counts codepoints, so a non-BMP char (emoji, rare CJK-B+)
# would split surrogate pairs and diverge — same documented caveat as
# token_count_cjk; the synthetic corpus and LANG_SEED are BMP-only.
# Docs shorter than 3 chars are filtered before this is applied —
# Spark's sequence() runs DESCENDING on a negative span, so the guard
# is load-bearing.
_TRIGRAMS = (
    "transform(sequence(1, length(text) - 2),"
    " i -> substring(text, i, 3))"
)


# ---- Arrow twins of the trigram explode (round 15, guide §4.2) ----------
#
# explode(_TRIGRAMS) is a higher-order transform: it runs INTERPRETED
# (outside whole-stage codegen), one substring allocation per character
# position — ~15M interpreted calls per sf0.1 scoring pass, measured as
# the dominant stage of lang_id. The kernels below compute the SAME
# (exact integer) per-doc / per-lang trigram counts in one vectorized
# NumPy pass: codepoints via utf-32 (Spark's substring indexes
# codepoints; BMP-only parity caveat documented at _TRIGRAMS), each
# trigram packed into one int64 (3 × 21 bits — max codepoint 0x10FFFF
# < 2^21), counted with searchsorted/bincount. Counts are exact, so
# every downstream integer score is bit-identical (pinned by
# tests/test_round12_ops.py parity + the oracle hash gate).


def _cp_codes(s: str):
    import numpy as np

    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(
        np.int64
    )


def _pack_tri(c):
    """int64 array of packed 3-codepoint windows of a codes array."""
    return (c[:-2] << 42) | (c[1:-1] << 21) | c[2:]


def _lang_score_kernel(model_rows: list):
    """mapInPandas fn: (doc_id, text) → (doc_id, lang, score) for every
    doc with ≥ 1 in-vocabulary trigram — the Arrow twin of the whole
    sparse scorer (occurrence count ⋈ nonzero cells + n_iv·w0 floor).
    `model_rows` is the COLLECTED bounded model (≤ |langs|·|V| rows of
    (lang, tg, w, w0)); every weight is an integer micro-log, so the
    matmul below is int64-exact (and int64 overflow wraps identically
    in NumPy and the JVM). Cells with c == 0 carry w == w0, i.e.
    dw == 0, so scoring against the DENSE (vocab × lang) dw matrix is
    the same integer as the old c>0-only broadcast join."""
    langs = sorted({r[0] for r in model_rows})
    vocab = sorted({r[1] for r in model_rows})
    lang_i = {v: i for i, v in enumerate(langs)}
    vocab_i = {v: i for i, v in enumerate(vocab)}

    def fn(batches):
        import numpy as np
        import pandas as pd

        if not vocab:  # degenerate model: nothing can be in-vocab
            for _ in batches:
                pass
            return
        V, L = len(vocab), len(langs)
        vcodes = np.array(
            [int(_pack_tri(_cp_codes(t))[0]) for t in vocab],
            dtype=np.int64,
        )
        order = np.argsort(vcodes)
        vsorted = vcodes[order]
        # vocab index (original sort order) of each vsorted slot
        unsort = np.argsort(order)
        w0v = np.zeros(L, dtype=np.int64)
        dw = np.zeros((V, L), dtype=np.int64)
        for lang, tg, w, w0 in model_rows:
            li = lang_i[lang]
            w0v[li] = w0
            dw[vocab_i[tg], li] = w - w0
        lang_arr = np.array(langs, dtype=object)
        for pdf in batches:
            texts = pdf["text"].values
            n = len(texts)
            for lo in range(0, n, 256):
                chunk = texts[lo : lo + 256]
                ids = pdf["doc_id"].values[lo : lo + 256]
                tris, owner = [], []
                for j, text in enumerate(chunk):
                    c = _cp_codes(text)
                    if len(c) < 3:
                        continue
                    t = _pack_tri(c)
                    tris.append(t)
                    owner.append(np.full(len(t), j, dtype=np.int64))
                if not tris:
                    continue
                tri = np.concatenate(tris)
                own = np.concatenate(owner)
                pos = np.searchsorted(vsorted, tri).clip(
                    max=len(vsorted) - 1
                )
                hit = vsorted[pos] == tri
                if not hit.any():
                    continue
                key = own[hit] * V + unsort[pos[hit]]
                cc = np.bincount(key, minlength=len(chunk) * V).reshape(
                    len(chunk), V
                )
                n_iv = cc.sum(axis=1)
                keep = np.nonzero(n_iv)[0]
                if not len(keep):
                    continue
                # exact integer identity: score = n_iv·w0 + Σ cnt·dw
                sc = n_iv[keep, None] * w0v[None, :] + cc[keep] @ dw
                yield pd.DataFrame(
                    {
                        "doc_id": np.repeat(
                            ids[keep].astype(np.int64), L
                        ),
                        "lang": np.tile(lang_arr, len(keep)),
                        "score": sc.reshape(-1),
                    }
                )

    return fn


def _trigram_train_kernel(batches):
    """mapInPandas fn: (lang, text) → per-PARTITION partial
    (lang, tg, c) trigram counts — the Arrow twin of
    explode(_TRIGRAMS) → groupBy(lang, tg).count()'s map side. The
    partials are exact integer counts over disjoint rows, so the
    reduce-side SUM reproduces the occurrence count bit-for-bit."""
    import numpy as np
    import pandas as pd

    acc: dict = {}
    for pdf in batches:
        for lang, text in zip(pdf["lang"].values, pdf["text"].values):
            c = _cp_codes(text)
            if len(c) < 3:
                continue
            acc.setdefault(lang, []).append(_pack_tri(c))
    out_lang, out_tg, out_c = [], [], []
    for lang, chunks in acc.items():
        codes, counts = np.unique(
            np.concatenate(chunks), return_counts=True
        )
        out_lang.extend([lang] * len(codes))
        out_tg.extend(
            chr((v >> 42) & 0x1FFFFF)
            + chr((v >> 21) & 0x1FFFFF)
            + chr(v & 0x1FFFFF)
            for v in codes.tolist()
        )
        out_c.extend(counts.tolist())
    if out_lang:
        yield pd.DataFrame(
            {
                "lang": out_lang,
                "tg": out_tg,
                "c": np.array(out_c, dtype=np.int64),
            }
        )


def lang_trigram_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded per-(lang, trigram) naive-Bayes model table.

    Training data = the labeled slice (doc_id % 10 < 3) of documents
    UNION the built-in LANG_SEED passages. Per language the top
    LANG_TOPT trigrams by (count desc, trigram) survive; the scoring
    vocabulary V is the cross-language union, and every (lang, t∈V)
    cell gets an integer micro-nat Laplace log-probability

        w = round(1e6 · ln((c + 1) / (total_lang_V + |V|)))

    so absent trigrams carry the floor penalty rather than silently
    dropping out — the property that makes a CJK document score
    catastrophically under 'en' and normally under 'zh'. All-integer
    output ⇒ hash-portable; ln follows the bigram_logppl libm-parity
    contract. |model| = |langs| · |V| ≤ 7 · 1400 rows at any SF.

    Each row also carries c (the raw count) and w0 (the lang's
    zero-count floor weight), which lets the scorer use the SPARSE
    identity score = n_invocab·w0 + Σ_{c>0 hits} (w − w0) — exact
    integer algebra, so results are identical to the dense fold while
    the scoring join touches only NONZERO cells (~2-3 langs per
    trigram instead of all |langs|).
    """
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(
        F.col("doc_id") % LANG_TRAIN_MOD < LANG_TRAIN_KEEP
    ).select("lang", "text")
    seed = spark.createDataFrame(
        sorted(LANG_SEED.items()), "lang string, text string"
    )
    # Arrow trigram counting (round 15, guide §4.2): the interpreted
    # explode(_TRIGRAMS) HOF is replaced by one NumPy kernel emitting
    # per-partition partial (lang, tg, c) counts; the reduce-side SUM
    # over disjoint partials equals the occurrence count exactly, so
    # the model is bit-identical (oracle hash gate + round12 parity).
    tg_parts = (
        spread_small_scan(train.unionByName(seed))
        .filter(F.length("text") >= 3)
        .mapInPandas(
            _trigram_train_kernel, "lang string, tg string, c long"
        )
    )
    # counts feeds three branches (topT window, lang list, the dense
    # cell join); it is a bounded (|langs| × slice-vocab) aggregate, so
    # one lazy lineage cut computes the train kernel once instead of
    # re-entering it per branch (guide §3.3 plan truncation).
    counts = (
        tg_parts.groupBy("lang", "tg")
        .agg(F.sum("c").cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    from pyspark.sql import Window

    top = counts.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("lang").orderBy(F.desc("c"), F.col("tg"))
        ),
    ).filter(F.col("rk") <= LANG_TOPT)
    vocab = top.select("tg").distinct()
    langs = counts.select("lang").distinct()
    cells = (
        langs.crossJoin(vocab)
        .join(counts, ["lang", "tg"], "left")
        .withColumn("c", F.coalesce("c", F.lit(0)))
    )
    per_lang = Window.partitionBy("lang")

    def micro(c_expr) -> F.Column:
        return (
            F.round(
                F.lit(1e6)
                * F.log(
                    c_expr.cast("double")
                    / (F.col("total") + F.col("n_v")).cast("double")
                ),
                0,
            )
            .cast("long")
        )

    return (
        cells.withColumn("total", F.sum("c").over(per_lang))
        .withColumn("n_v", F.count(F.lit(1)).over(per_lang))
        .select(
            "lang",
            "tg",
            "c",
            micro(F.col("c") + 1).alias("w"),
            # the lang's zero-count floor weight — carried on every row
            # so the sparse scorer can derive (w − w0) without a second
            # aggregation pass
            micro(F.lit(1)).alias("w0"),
        )
    )


def write_langid_model(
    spark: SparkSession, sf_dir: str, model_dir: str
) -> None:
    """Persist the bounded trigram NB model (lang, tg, c, w, w0) as a
    single parquet file — the frozen-artifact half of the lang-ID
    lifecycle, matching the streaming twin's contract (score new docs
    against a FROZEN model; never retrain inside the scoring path).
    |model| = |langs|·|V| rows at any corpus size, so the artifact is
    kilobytes and its read needs no partition pruning — one bounded
    file, broadcast whole by the scorer."""
    lang_trigram_model(spark, sf_dir).coalesce(1).write.mode(
        "overwrite"
    ).parquet(model_dir)


def lang_id_from_model(
    spark: SparkSession, sf_dir: str, model_dir: str
) -> DataFrame:
    """lang_id's scoring tail over the PERSISTED model: identical
    output to lang_id row-for-row (pytest round-trip pin) with zero
    model-build stages — the per-call train is replaced by one bounded
    parquet read."""
    docs = load_table(spark, sf_dir, "documents")
    model = spark.read.parquet(model_dir)
    return lang_id_score_docs(docs, model)


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-trigram naive-Bayes language ID (Cavnar & Trenkle's n-gram
    text categorization recast as multinomial NB): every document's
    trigrams join the broadcast model table (all langs per vocab
    trigram, so the fan-out is |langs| rows per occurrence) and the
    per-(doc, lang) integer score Σ w is argmaxed with alphabetical
    tie-break. Docs with no in-vocabulary trigram (or < 3 chars)
    predict 'und'.

    NOTE on corpus accuracy: the synthetic corpus draws every lang
    label's text from the SAME English-ish vocabulary, so on-corpus
    accuracy is necessarily near-chance — the discriminative power
    shows on real multilingual text (pytest: crafted zh/ja/ko/de/en
    docs classify correctly via the LANG_SEED script anchors).

    Scale shape: model build is one bounded agg over the 30% slice;
    scoring is explode → broadcast-hash join → two map-side-combined
    aggs keyed by doc — no corpus self-joins, no global sorts.
    """
    docs = load_table(spark, sf_dir, "documents")
    # The scorer reads the model THREE ways (vocab, per-lang floors,
    # nonzero cells); without a checkpoint each branch re-runs the
    # whole train subtree (scan → explode → topT window → crossJoin —
    # measured 3× the build stages in one plan). The model is bounded
    # (|langs|·|V| rows) so truncating lineage here is metadata-cheap;
    # lazy so materialization rides the first consuming job.
    model = lang_trigram_model(spark, sf_dir).localCheckpoint(eager=False)
    return lang_id_score_docs(docs, model)


def _lang_scores(docs: DataFrame, model: DataFrame) -> DataFrame:
    """(doc_id, lang, score) for every doc with ≥ 1 in-vocabulary
    trigram, by SPARSE scoring: instead of fanning every in-vocab
    occurrence out to ALL |langs| model cells, use the exact integer
    identity score(d, l) = n_iv(d)·w0(l) + Σ_{nonzero cells hit}
    (w − w0) — one broadcast semi-join counts in-vocab occurrences,
    one broadcast join touches only c>0 cells. Identical scores to
    the dense fold (pytest-pinned), ~|langs|/nnz-per-trigram less
    join traffic."""
    # The whole sparse scorer as ONE Arrow kernel (round 15, guide
    # §4.2): the model is bounded (≤ |langs|·|V| rows at any corpus
    # size), so it is collected once and compiled into the kernel —
    # the same bytes the broadcast joins would ship — and the
    # interpreted explode(_TRIGRAMS) HOF + semi-join + three
    # aggregation exchanges (~15M interpreted substring calls at
    # sf0.1, the measured dominant stage) collapse into a vectorized
    # per-batch bincount + int64 matmul emitting the identical
    # (doc_id, lang, score) rows. The round-14 two-consumer exchange
    # design does NOT carry over to mapInPandas subtrees: plan
    # canonicalization of Python-function nodes defeats AQE exchange
    # reuse, so the kernel ran TWICE (two 6.9 MB map stages in the
    # timeline); emitting final scores leaves one consumer and zero
    # joins. spread: a single-split corpus file would run the kernel
    # on ONE core; no-op at cluster scale.
    model_rows = [
        (r["lang"], r["tg"], r["w"], r["w0"])
        for r in model.select("lang", "tg", "w", "w0").collect()
    ]
    return spread_small_scan(
        docs.filter(F.length("text") >= 3).select("doc_id", "text")
    ).mapInPandas(
        _lang_score_kernel(model_rows),
        "doc_id long, lang string, score long",
    )


def lang_id_score_docs(docs: DataFrame, model: DataFrame) -> DataFrame:
    """The scoring tail of lang_id over an arbitrary documents frame
    and a (frozen) model table — the composition point the streaming
    twin reuses: scores are a pure per-doc function of the model, so a
    micro-batch scores independently and partials merge by union.

    Sparse scoring (round 12): see _lang_scores."""
    scores = _lang_scores(docs, model)
    from pyspark.sql import Window

    best = (
        scores.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.desc("score"), F.col("lang")
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("lang").alias("pred"))
    )
    return (
        docs.select("doc_id", "lang")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("pred", F.lit("und")).alias("pred_lang"),
            (F.coalesce("pred", F.lit("")) == F.col("lang"))
            .cast("long")
            .alias("is_correct"),
        )
    )


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic doc quality in [0,1]: mix of length band, alpha ratio,
    stopword ratio, mean token length. The exact blend matters less
    than that it is cheap, monotone in 'looks like prose', and
    reproducible across engines."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col("text")
    n_toks = F.size(toks)
    n_chars = F.length("text")
    alpha_chars = F.length(F.regexp_replace("text", r"[^A-Za-z]", ""))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    alpha_ratio = alpha_chars / n_chars
    stop_ratio = stop_hits / n_toks
    mean_tok_len = n_chars / n_toks
    len_band = F.when((n_chars >= 100) & (n_chars <= 2000), 1.0).otherwise(0.5)
    score = (
        0.3 * len_band
        + 0.3 * alpha_ratio
        + 0.25 * F.least(stop_ratio * F.lit(4.0), F.lit(1.0))
        + 0.15 * F.least(mean_tok_len / F.lit(8.0), F.lit(1.0))
    )
    return docs.select(
        "doc_id",
        n_toks.cast("long").alias("n_tokens"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(score, 6).alias("quality"),
    )


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per doc."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tokens_col("text")).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(TOKEN_REGEX), 0))
        .cast("long")
        .alias("re_tokens"),
    )


# BMP codepoint classes for scripts that do not delimit words with
# whitespace: kana, CJK Unified (+ext A), hangul syllables. Literal
# character ranges, so the same pattern runs under Java regex (Spark)
# and RE2 (DuckDB); BMP-only keeps UTF-16 vs codepoint length counts
# identical across engines.
CJK_CLASS = "぀-ヿ㐀-䶿一-鿿가-힯"


def token_count_cjk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-script token counting — the codepoint-class fallback for
    whitespace-free scripts that plain `token_count` silently
    under-counts (a zh/ja/ko document is ONE whitespace token however
    long it is): each CJK codepoint counts as its own token (the
    standard char-level fallback absent a real segmenter) and the
    remaining text tokenizes by whitespace as usual. Output:
    (doc_id, cjk_chars, ws_tokens, mixed_tokens) with ws_tokens the
    original whitespace rule for comparison. Pure Column expressions;
    the oracle replicates the regex arithmetic; CJK behaviour is
    additionally pinned on crafted zh/ja/mixed docs in pytest (the
    test corpus is English, where cjk_chars = 0 and
    mixed_tokens = ws_tokens)."""
    docs = load_table(spark, sf_dir, "documents")
    cjk_chars = F.length(
        F.regexp_replace("text", f"[^{CJK_CLASS}]", "")
    )
    non_cjk_ws = F.size(
        tokens_col(F.regexp_replace("text", f"[{CJK_CLASS}]", " "))
    )
    return docs.select(
        "doc_id",
        cjk_chars.cast("long").alias("cjk_chars"),
        F.size(tokens_col("text")).cast("long").alias("ws_tokens"),
        (non_cjk_ws + cjk_chars).cast("long").alias("mixed_tokens"),
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash fingerprint of the full text
    (h = fold chars: (acc·131 + codepoint) mod 1e9+7). Engine-portable:
    the identical fold runs in the DuckDB oracle via list_reduce."""
    docs = load_table(spark, sf_dir, "documents")
    chars = F.filter(F.split("text", ""), lambda c: c != "")
    fp = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * BASE + F.ascii(ch)) % MOD,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


def lang_id_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lang_id's abstention signal: per doc, the winning language AND
    the micro-nat margin to the runner-up — the number a production
    pipeline thresholds to route low-confidence docs to a heavier
    model (margin ≈ log-likelihood ratio of the top two hypotheses).
    Because the model carries a weight for EVERY (lang, vocab-trigram)
    cell, any doc with at least one in-vocabulary trigram scores all
    languages, so the runner-up always exists; docs with no
    in-vocabulary trigram carry no evidence and are excluded (they'd
    be lang_id's 'und').

    Same plan as lang_id plus one extra lead() over the per-doc
    (score desc, lang) order — no new scan, no new join. Output:
    (doc_id, pred_lang, second_lang, margin_micro)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    # bounded-model checkpoint — see lang_id
    model = lang_trigram_model(spark, sf_dir).localCheckpoint(eager=False)
    scores = _lang_scores(docs, model)
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.col("lang"))
    return (
        scores.withColumn("rk", F.row_number().over(w))
        .withColumn("next_score", F.lead("score").over(w))
        .withColumn("next_lang", F.lead("lang").over(w))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            F.col("lang").alias("pred_lang"),
            F.col("next_lang").alias("second_lang"),
            (F.col("score") - F.col("next_score"))
            .cast("long")
            .alias("margin_micro"),
        )
    )
