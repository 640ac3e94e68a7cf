"""Round-14 operators: frozen tokenizer artifacts (train-once /
encode-many), plus their cache discipline."""

from __future__ import annotations

import pytest

from tests.parity import SF_DIR

SF_SMOKE = "/root/testdata/sf0.001"


# ---- frozen tokenizer artifacts ---------------------------------------------


def test_unigram_model_roundtrip_equals_inline(spark, tmp_path):
    """Encoding from the persisted vocab is row-identical to the
    inline train-then-encode path."""
    from mimir_spark.operators import tokenizer as tok

    md = str(tmp_path / "uni_model")
    tok.write_unigram_model(spark, SF_SMOKE, md)
    inline = sorted(
        tok.unigram_encode_ids(spark, SF_SMOKE).collect()
    )
    frozen = sorted(
        tok.unigram_encode_ids_from_model(spark, SF_SMOKE, md).collect()
    )
    assert inline == frozen
    # the artifact is ONE bounded file: every single char + at most
    # UNI_PRUNE_KEEP multi-char pieces
    model = spark.read.parquet(md)
    rows = model.collect()
    n_multi = sum(1 for r in rows if r["n_chars"] > 1)
    assert n_multi <= tok.UNI_PRUNE_KEEP
    assert set(model.columns) == {"piece", "n_chars", "count", "logp_micro"}


def test_bpe_model_roundtrip_equals_inline(spark, tmp_path):
    from mimir_spark.operators import tokenizer as tok

    md = str(tmp_path / "bpe_model")
    tok.write_bpe_model(spark, SF_SMOKE, md)
    inline = sorted(tok.bpe_encode_ids(spark, SF_SMOKE).collect())
    frozen = sorted(
        tok.bpe_encode_ids_from_model(spark, SF_SMOKE, md).collect()
    )
    assert inline == frozen
    # merge table row order on disk is immaterial: the loader re-sorts
    # by step, so a shuffled read applies merges in learning order
    rules = tok.load_bpe_rules(spark, md)
    steps = [
        r["step"] for r in spark.read.parquet(md).collect()
    ]
    assert len(rules) == len(steps)


def test_frozen_gate_keys_zero_train_after_warm(spark, monkeypatch):
    """The poisoned-trainer pin: after the cached artifact exists, the
    frozen gate keys must encode WITHOUT invoking any trainer — even
    with the in-process memo cleared (simulating a fresh process)."""
    from mimir_spark.operators import tokenizer as tok

    expect_uni = sorted(tok.unigram_encode_ids(spark, SF_SMOKE).collect())
    expect_bpe = sorted(tok.bpe_encode_ids(spark, SF_SMOKE).collect())
    # warm the on-disk artifact cache
    tok.unigram_encode_ids_frozen(spark, SF_SMOKE).collect()
    tok.bpe_encode_ids_frozen(spark, SF_SMOKE).collect()

    def _poisoned(*a, **kw):  # pragma: no cover - must never run
        raise AssertionError("trainer invoked on the frozen path")

    tok._TRAIN_MEMO.clear()
    monkeypatch.setattr(tok, "unigram_lm_train", _poisoned)
    monkeypatch.setattr(tok, "bpe_train", _poisoned)
    got_uni = sorted(
        tok.unigram_encode_ids_frozen(spark, SF_SMOKE).collect()
    )
    got_bpe = sorted(tok.bpe_encode_ids_frozen(spark, SF_SMOKE).collect())
    assert got_uni == expect_uni
    assert got_bpe == expect_bpe


def test_frozen_gate_key_uncacheable_corpus_falls_back(spark, tmp_path):
    """A corpus whose stamp fails (missing documents.parquet) is
    uncacheable: _model_cache_dir returns None and the frozen keys
    would take the inline path instead of caching under a bogus
    stamp."""
    from mimir_spark.operators import tokenizer as tok

    assert tok._model_cache_dir("unigram", str(tmp_path / "nope"), "") is None


# ---- byte-level BPE ----------------------------------------------------------


def _write_multiscript_corpus(spark, tmp_path) -> str:
    """A corpus the char-level trainers document away: emoji and
    non-BMP math letters (surrogate pairs in UTF-16), CJK, Latin-1
    accents — plus plain ASCII."""
    rows = [
        (0, "héllo wörld héllo wörld héllo", "de", "web"),
        (1, "🎉🎉🎉 party 🎉🎉🎉 party party", "en", "web"),
        (2, "日本語のテキスト 日本語のテキスト", "ja", "web"),
        (3, "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 ascii too", "en", "web"),
        (4, "plain ascii text here here here", "en", "web"),
    ]
    df = spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_byte_syms_match_python_utf8(spark):
    """_byte_syms is exactly [BYTE_TABLE[b] for b in word.encode()] —
    including surrogate-pair (non-BMP) words."""
    from mimir_spark.operators import tokenizer as tok
    from pyspark.sql import functions as F

    words = ["héllo", "🎉", "日本語", "𝔘𝔫", "x", "a'b\\c"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: r["syms"]
        for r in df.select(
            "word", tok._byte_syms(F.col("word")).alias("syms")
        ).collect()
    }
    for w in words:
        expect = [tok.BYTE_TABLE[b] for b in w.encode("utf-8")]
        assert got[w] == expect, w


def test_byte_bpe_zero_oov_and_duckdb_parity_on_multiscript(
    spark, tmp_path
):
    """The zero-OOV guarantee + non-BMP hash-portability pin: every
    doc (emoji-only words included) emits an id stream, all ids in
    [0, 256 + n_merges), and the full byte_bpe_encode_ids output is
    value-equal to the DuckDB oracle on the crafted corpus — the
    non-BMP case the char-level trigram parity documents away."""
    import duckdb

    import __spark_entry__ as entry
    from mimir_spark.operators import tokenizer as tok
    from tests.parity import compare

    sf = _write_multiscript_corpus(spark, tmp_path)
    ids = tok.byte_bpe_corpus_ids(spark, sf).collect()
    assert sorted(r["doc_id"] for r in ids) == [0, 1, 2, 3, 4]
    for r in ids:
        assert r["n_ids"] >= 1
        assert all(0 <= i < 256 + 10 for i in r["ids"]), r
    # total ids never exceed total UTF-8 bytes of the tokens (merges
    # only shrink), and the emoji doc's stream is byte-dense
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf}/documents.parquet/*.parquet'"
    )
    ok, msg = compare(
        tok.byte_bpe_encode_ids(spark, sf),
        entry.oracle_sql()["byte_bpe_encode_ids"],
        con,
    )
    assert ok, msg


def test_byte_bpe_merges_cross_word_boundary_chars(spark, tmp_path):
    """Byte merges learned on the multiscript corpus include at least
    one multi-byte (non-ASCII-seeded) merge when the corpus repeats a
    multi-byte char — the emoji's UTF-8 prefix bytes pair up."""
    from mimir_spark.operators import tokenizer as tok

    sf = _write_multiscript_corpus(spark, tmp_path)
    merges = tok.byte_bpe_train(spark, sf, n_merges=10).collect()
    assert len(merges) == 10
    non_ascii = [
        r for r in merges
        if any(ord(c) > 126 for c in (r["left"] + r["right"]))
    ]
    assert non_ascii, "expected at least one multi-byte-char merge"


# ---- MJPEG-in-AVI frame sampling --------------------------------------------


def test_mjpeg_avi_roundtrip_and_closed_form():
    """Container round-trip: the walk recovers exactly the generated
    frames, each decodes bit-exact (DC-only blocks), and the sampled
    sum matches the closed form the oracle uses."""
    from mimir_spark.operators.jpeg import decode_jpeg_auto
    from mimir_spark.operators.multimodal import (
        decode_mjpeg_avi,
        encode_mjpeg_avi,
    )

    for d in [0, 1, 2, 3, 5, 7, 13, 123]:
        w, h, frames = decode_mjpeg_avi(encode_mjpeg_avi(d))
        assert len(frames) == (d % 5) + 2
        assert (w, h) == (8 * ((d % 4) + 1), 8 * ((d % 2) + 1))
        total = 0
        for f in frames[::2]:
            fw, fh, bpp, npx, s = decode_jpeg_auto(f)
            assert (fw, fh, bpp) == (w, h, 24)
            total += s
        nb = ((d % 4) + 1) * ((d % 2) + 1)
        expect = sum(
            3 * 64 * sum((d * 31 + 17 * f + 7 * b) % 256 for b in range(nb))
            for f in range(0, (d % 5) + 2, 2)
        )
        assert total == expect


def test_mjpeg_avi_rejects_corrupt_containers():
    """The parser is a real validator: bad signature, RIFF length
    mismatch, avih/movi frame-count disagreement, and truncation all
    raise instead of returning garbage."""
    import struct

    import pytest as _pytest

    from mimir_spark.operators.multimodal import (
        decode_mjpeg_avi,
        encode_mjpeg_avi,
    )

    good = encode_mjpeg_avi(3)
    with _pytest.raises(ValueError):
        decode_mjpeg_avi(b"RIFX" + good[4:])
    with _pytest.raises(ValueError):
        decode_mjpeg_avi(
            good[:4] + struct.pack("<I", len(good)) + good[8:]
        )
    with _pytest.raises(ValueError):
        decode_mjpeg_avi(good[:-40])  # truncated inside movi
    # frame-count mismatch: bump avih dwTotalFrames in place
    idx = good.index(b"avih") + 8 + 16
    bad = bytearray(good)
    bad[idx : idx + 4] = struct.pack(
        "<I", struct.unpack_from("<I", good, idx)[0] + 1
    )
    with _pytest.raises(ValueError):
        decode_mjpeg_avi(bytes(bad))


def test_mjpeg_avi_word_alignment_exercised():
    """At least one doc in the test id range emits an odd-length JPEG
    chunk, so the word-aligned advance is actually on the tested
    path (a parser that forgets the pad byte desyncs and fails the
    round-trip above)."""
    from mimir_spark.operators.jpeg import encode_jpeg
    from mimir_spark.operators.multimodal import _mjpeg_frame_pixels

    odd = [
        d
        for d in range(50)
        for f in range((d % 5) + 2)
        if len(encode_jpeg(_mjpeg_frame_pixels(d, f))) % 2 == 1
    ]
    assert odd, "generator never produces an odd-length frame payload"


# ---- streaming twins: web front half ----------------------------------------


def _split_corpus_stream_dir(spark, sf, tmp_path, n_batches=3) -> str:
    """The langid-test scaffolding: split the corpus into n_batches
    single-file parquets so the file source delivers them as separate
    micro-batches."""
    import glob as globmod
    import os
    import shutil

    from pyspark.sql import functions as F

    from mimir_spark.sources.tables import load_table

    in_dir = str(tmp_path / "docs_in")
    docs = load_table(spark, sf, "documents")
    for m in range(n_batches):
        docs.filter(F.col("doc_id") % n_batches == m).coalesce(1).write.parquet(
            f"{in_dir}/b{m}", compression="none"
        )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part in enumerate(
        sorted(globmod.glob(in_dir + "/b*/part-*.parquet"))
    ):
        shutil.copy(part, f"{flat}/batch_{i}.parquet")
    return flat


def test_streaming_html_extract_matches_batch(spark, sf_smoke, tmp_path):
    """Stateless-map twin: micro-batch extraction + plain union equals
    the batch operator row-for-row over a 3-way split corpus."""
    from mimir_spark.operators.html import html_extract_text
    from mimir_spark.streaming.htmlext import (
        finalize_html_extract,
        streaming_html_extract,
    )

    flat = _split_corpus_stream_dir(spark, sf_smoke, tmp_path)
    q = streaming_html_extract(
        spark, flat, str(tmp_path / "ext"), str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()
    got = {
        tuple(r)
        for r in finalize_html_extract(
            spark, str(tmp_path / "ext")
        ).collect()
    }
    want = {tuple(r) for r in html_extract_text(spark, sf_smoke).collect()}
    assert got == want and got


def test_streaming_unigram_encode_matches_frozen_batch(
    spark, sf_smoke, tmp_path
):
    """Frozen-artifact streaming encode: the stream loads the
    persisted unigram model once and each micro-batch encodes its own
    docs; union equals unigram_encode_ids_from_model over the same
    artifact row-for-row, regardless of batch boundaries."""
    from mimir_spark.operators import tokenizer as tok
    from mimir_spark.streaming.encode import (
        finalize_unigram_encode_ids,
        streaming_unigram_encode_ids,
    )

    md = str(tmp_path / "uni_model")
    tok.write_unigram_model(spark, sf_smoke, md)
    flat = _split_corpus_stream_dir(spark, sf_smoke, tmp_path)
    q = streaming_unigram_encode_ids(
        spark, md, flat, str(tmp_path / "ids"), str(tmp_path / "ckpt2")
    )
    q.processAllAvailable()
    q.stop()
    got = {
        tuple(r)
        for r in finalize_unigram_encode_ids(
            spark, str(tmp_path / "ids")
        ).collect()
    }
    want = {
        tuple(r)
        for r in tok.unigram_encode_ids_from_model(
            spark, sf_smoke, md
        ).collect()
    }
    assert got == want and got


def test_streaming_finalizers_empty_stream_reads_empty(spark, tmp_path):
    """The explicit-schema finalizer contract: a stream whose every
    batch was empty (no part-files at all) reads as the correct empty
    frame, not a schema-inference error."""
    import os

    from mimir_spark.streaming.encode import finalize_unigram_encode_ids
    from mimir_spark.streaming.htmlext import finalize_html_extract
    from mimir_spark.streaming.urldedup import finalize_url_dedup

    for name, fn in [
        ("e1", finalize_html_extract),
        ("e2", finalize_unigram_encode_ids),
        ("e3", finalize_url_dedup),
    ]:
        d = str(tmp_path / name)
        os.makedirs(d)
        assert fn(spark, d).count() == 0


def test_model_cache_dir_is_per_user_and_stamped(spark):
    """Cache key folds in (path, mtime, size): two SFs never collide,
    and the root is the per-uid 0700 dir."""
    import os

    from mimir_spark.operators import tokenizer as tok

    a = tok._model_cache_dir("unigram", SF_SMOKE, "")
    b = tok._model_cache_dir("unigram", SF_DIR, "")
    assert a != b
    uid = os.getuid()
    assert f"mimir_spark_idx-{uid}" in a


def test_spread_small_scan_gate(spark, sf_smoke):
    """spread_small_scan fans a 1-split scan out to defaultParallelism
    and passes an already-wide input through untouched (the gate that
    makes it safe in a 100 TB plan); row values are unchanged."""
    from mimir_spark.functions.spread import spread_small_scan
    from mimir_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    assert docs.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    out = spread_small_scan(docs)
    assert (
        out.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # identical multiset of rows
    assert (
        out.exceptAll(docs).count() == 0 and docs.exceptAll(out).count() == 0
    )
    # no-op path: input already at/above target parallelism
    wide = docs.repartition(spark.sparkContext.defaultParallelism + 1)
    assert spread_small_scan(wide) is wide
