"""BPE trainer pinned against a pure-Python reference implementation
of the Sennrich merge-learning loop over the same word counts."""

from __future__ import annotations

from mimir_spark.operators.core import tokens
from mimir_spark.operators.tokenizer import bpe_train, bpe_encode
from mimir_spark.sources.tables import load_table

from tests.conftest import SF_SMOKE


def _ref_bpe(word_counts: dict[str, int], n: int):
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        vocab[tuple(w)] = vocab.get(tuple(w), 0) + c
    merges = []
    for step in range(n):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((step, a, b, a + b, cnt))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return merges


def test_bpe_train_matches_reference(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    wc = {
        r.word: r.cnt
        for r in tokens(docs).groupBy("word").count().withColumnRenamed("count", "cnt").collect()
    }
    expect = _ref_bpe(wc, 8)
    got = [
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in bpe_train(spark, sf_smoke, 8).orderBy("step").collect()
    ]
    assert got == expect


def test_bpe_encode_compresses(spark, sf_smoke):
    out = bpe_encode(spark, sf_smoke, 5).collect()
    assert len(out) == 500
    # merges can only shorten symbol streams, never lengthen them
    assert all(r.total_symbols <= r.total_chars for r in out)
    assert any(r.total_symbols < r.total_chars for r in out)


def test_bpe_batched_equals_sequential(spark, sf_smoke):
    """The _safe_merge_prefix guard must never change a learned merge:
    batched selection (batch_m=4) and forced-sequential (batch_m=1)
    training produce identical merge tables, rows and order."""
    from mimir_spark.operators.tokenizer import bpe_train

    seq = [tuple(r) for r in bpe_train(spark, sf_smoke, 10, batch_m=1).collect()]
    bat = [tuple(r) for r in bpe_train(spark, sf_smoke, 10, batch_m=4).collect()]
    assert bat == seq and len(seq) == 10


# ---- WordPiece -------------------------------------------------------------


def _wordpiece_ref(word_counts, n_merges):
    """Pure-Python sequential WordPiece: likelihood-ratio argmax with
    (score desc, l, r) ties, greedy left-to-right apply."""
    vocab = {w: (list(w), c) for w, c in word_counts.items()}
    out = []
    for step in range(n_merges):
        pairs: dict = {}
        uni: dict = {}
        for syms, c in vocab.values():
            for s in syms:
                uni[s] = uni.get(s, 0) + c
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        cand = [
            (cnt / (uni[l] * uni[r]), l, r, cnt)
            for (l, r), cnt in pairs.items()
            if cnt >= 2
        ]
        if not cand:
            break
        # tie-break: score desc, then l asc, r asc
        best = sorted(cand, key=lambda t: (-t[0], t[1], t[2]))[0]
        score, l, r, cnt = best
        out.append((step, l, r, l + r, cnt, round(score, 9)))
        for w, (syms, c) in vocab.items():
            i, ns = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    ns.append(l + r)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            vocab[w] = (ns, c)
    return out


def test_wordpiece_matches_python_reference(spark):
    from collections import Counter

    from mimir_spark.operators.tokenizer import wordpiece_train
    from mimir_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    wc = Counter()
    for r in docs.select("text").collect():
        for w in r["text"].split():
            wc[w] += 1
    want = _wordpiece_ref(dict(wc), 8)
    got = [
        (r["step"], r["left"], r["right"], r["merged"], r["pair_count"],
         r["score"])
        for r in wordpiece_train(spark, SF_SMOKE).orderBy("step").collect()
    ]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:5] == w[:5], (g, w)
        assert abs(g[5] - w[5]) < 1e-12


def test_wordpiece_prefers_informative_pair_over_frequent(spark, tmp_path):
    """Crafted corpus: 'qz' co-occurs ONLY together (perfect
    association, modest count); 'ab' is the most FREQUENT pair but a
    and b are everywhere. BPE's first merge is the frequent 'ab';
    WordPiece's is the informative 'qz'."""
    from tests.test_round11_ops import _write_docs
    from mimir_spark.operators.tokenizer import bpe_train, wordpiece_train

    texts = (
        ["ab ab ab ab ab ab"] * 6      # ab frequent
        + ["ax bx ay by az bz"] * 6    # a, b appear in many contexts
        + ["qz qz"] * 3                # q,z only ever together
    )
    sf = _write_docs(spark, tmp_path, texts)
    bpe_first = bpe_train(spark, sf, n_merges=1).collect()[0]
    wp_first = wordpiece_train(spark, sf, n_merges=1).collect()[0]
    assert (bpe_first["left"], bpe_first["right"]) == ("a", "b")
    assert (wp_first["left"], wp_first["right"]) == ("q", "z")
