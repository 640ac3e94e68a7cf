"""BPE trainer pinned against a pure-Python reference implementation
of the Sennrich merge-learning loop over the same word counts."""

from __future__ import annotations

from mimir_spark.operators.core import tokens
from mimir_spark.operators.tokenizer import bpe_train, bpe_encode
from mimir_spark.sources.tables import load_table


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
