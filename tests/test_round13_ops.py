"""Round-13 operators: HTML/boilerplate extraction."""

from __future__ import annotations

from tests.parity import SF_DIR

SF_SMOKE = "/root/testdata/sf0.001"


# ---- html_extract_text -------------------------------------------------------

def test_html_extractor_on_crafted_pages():
    """The extractor is a GENERIC parser, pinned on hand-written pages
    that the synthetic generator could never emit — nested inline
    markup, entity soup, script containing fake tags, a link-stuffed
    table-of-contents div, uppercase tags."""
    from mimir_spark.operators.html import extract_page

    page = """<html><head><title>x</title>
    <script type="text/javascript">if (a < b) { track('<p>'); }</script>
    <style>p { color: red; }</style></head><body>
    <NAV><a href="/">home</a> <a href="/x">about</a></NAV>
    <h1>Hello &amp; <i>welcome</i></h1>
    <p>First   paragraph with <b>bold <i>nested</i></b> text &lt;tag&gt;.</p>
    <div id="toc"><a href="#1">one</a> <a href="#2">two</a> <a href="#3">three</a></div>
    <p>Second paragraph.</p>
    <div class="body">A normal div block with a single <a href="/ref">reference</a> inside a lot of prose text.</div>
    <footer>&copy; nobody</footer>
    </body></html>"""
    got = extract_page(page)
    # block accounting: nav, h1, p, div#toc, p, div.body, footer = 7
    assert got["n_blocks"] == 7
    # nav + footer semantic; toc div by link density
    assert got["n_dropped_semantic"] == 2
    assert got["n_dropped_density"] == 1
    assert got["n_kept"] == 4
    # links: 2 nav + 3 toc + 1 prose div
    assert got["n_links"] == 6
    # kept text: h1 + two p's + prose div, entities unescaped, inline
    # tags stripped, whitespace collapsed — and the toc dropped
    assert got["extracted_text"] == (
        "Hello & welcome First paragraph with bold nested text <tag>. "
        "Second paragraph. A normal div block with a single reference "
        "inside a lot of prose text."
    )
    assert got["extracted_len"] == len(got["extracted_text"])


def test_html_low_density_anchor_block_kept():
    """A prose block with a minority anchor survives the density gate
    (the gate is about link-STUFFED blocks, not any block with a
    link); a 50% anchor block does not."""
    from mimir_spark.operators.html import extract_page

    kept = extract_page(
        "<body><p>plenty of ordinary words around one small "
        '<a href="/x">link</a> here</p></body>'
    )
    assert kept["n_kept"] == 1 and "link" in kept["extracted_text"]
    dropped = extract_page(
        '<body><p><a href="/x">half anchor text</a> tiny rest</p></body>'
    )
    assert dropped["n_kept"] == 0 and dropped["n_dropped_density"] == 1


def test_html_generator_inversion_closed_form():
    """extract(synthesize(doc)) == the closed form the DuckDB oracle
    computes — for edge docs: empty text, entity-bearing text,
    multi-whitespace, the no-sidebar residue class."""
    from mimir_spark.operators.html import (
        HTML_SIDE_SKIP_MOD,
        expected_extraction,
        extract_page,
        synthesize_page,
    )

    cases = [
        (HTML_SIDE_SKIP_MOD * 3, ""),                 # empty, no sidebar
        (11, 'a & b < c > d "quoted"'),               # escaping round-trip
        (3, "  spaced   out\ttokens \n here "),       # whitespace soup
        (5, "one"),                                   # single token
    ]
    for doc_id, text in cases:
        got = extract_page(synthesize_page(doc_id, text))
        got["doc_id"] = doc_id
        assert got == expected_extraction(doc_id, text), (doc_id, text)


def test_html_extract_spark_plan_is_single_scan(spark):
    """One corpus scan, zero shuffles, column pruning reaches the
    parquet read (doc_id + text only)."""
    from mimir_spark.operators.html import html_extract_text

    df = html_extract_text(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # No data-dependent shuffle: the scale-adaptive spread's RoundRobin
    # repartition (a no-op on cluster-scale inputs) is the only
    # Exchange allowed.
    from mimir_spark.plans.checks import assert_only_roundrobin_exchanges

    assert_only_roundrobin_exchanges(plan)
    assert "doc_id:bigint,text:string" in plan.replace(" ", "")
    rows = {r.doc_id: r for r in df.collect()}
    assert rows and all(
        r.n_kept + r.n_dropped_semantic + r.n_dropped_density == r.n_blocks
        for r in rows.values()
    )


def test_html_extract_matches_python_replica_at_sf001(spark):
    """Spark output == the pure-python kernel run driver-side over the
    same corpus (pins the Arrow batch plumbing, not just the kernel)."""
    from mimir_spark.operators.html import (
        extract_page,
        html_extract_text,
        synthesize_page,
    )
    from mimir_spark.sources.tables import load_table

    docs = {
        r.doc_id: r.text or ""
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .collect()
    }
    got = {r.doc_id: r.asDict() for r in html_extract_text(spark, SF_SMOKE).collect()}
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        exp = extract_page(synthesize_page(doc_id, text))
        exp["doc_id"] = doc_id
        assert got[doc_id] == exp, doc_id


# ---- subword token-id stream → packed shards ---------------------------------

def test_unigram_ids_digest_consistent_with_stream(spark):
    """unigram_encode_ids' digest/first/last are a pure projection of
    unigram_corpus_ids' ordered stream (recomputed driver-side)."""
    from mimir_spark.operators.tokenizer import (
        UNI_ID_MOD,
        UNI_ID_MULT,
        unigram_corpus_ids,
        unigram_encode_ids,
    )

    ids = {r.doc_id: list(r.ids) for r in unigram_corpus_ids(spark, SF_SMOKE).collect()}
    got = {r.doc_id: r for r in unigram_encode_ids(spark, SF_SMOKE).collect()}
    assert set(ids) == set(got) and ids
    for doc_id, stream in ids.items():
        acc = 0
        for x in stream:
            acc = (acc * UNI_ID_MULT + x) % UNI_ID_MOD
        r = got[doc_id]
        assert (r.n_ids, r.ids_digest, r.first_id, r.last_id) == (
            len(stream), acc, stream[0], stream[-1]
        ), doc_id


def test_packed_shards_carry_concatenated_id_stream(spark, tmp_path):
    """The training-shard exporter packs REAL token ids: per language,
    concatenating the shard files' per-doc id arrays in (shard, doc_id)
    order reproduces exactly the doc_id-ordered concatenation of the
    corpus id streams, and every doc's start_tok equals the running id
    count (the loader's seek offset)."""
    from mimir_spark.operators.packing import sequence_pack_token_ids
    from mimir_spark.operators.tokenizer import unigram_corpus_ids
    from mimir_spark.sources.io import write_packed_shards

    ids_df = unigram_corpus_ids(spark, SF_SMOKE)
    packed = sequence_pack_token_ids(ids_df)
    out = str(tmp_path / "shards")
    manifest = write_packed_shards(packed, out, seqs_per_shard=4).collect()
    assert manifest

    back = spark.read.parquet(out).collect()
    by_lang: dict[str, list] = {}
    for r in back:
        by_lang.setdefault(r["lang"], []).append(r)
    truth = {}
    for r in ids_df.collect():
        truth.setdefault(r["lang"], []).append((r["doc_id"], list(r["ids"])))
    assert set(by_lang) == set(truth)
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: (r["shard"], r["doc_id"]))
        shard_stream = [x for r in rows for x in r["ids"]]
        expect_rows = sorted(truth[lang])
        expect_stream = [x for _, ids in expect_rows for x in ids]
        assert shard_stream == expect_stream, lang
        # start_tok = running id count in doc_id order
        run = 0
        for r in sorted(rows, key=lambda r: r["doc_id"]):
            assert r["start_tok"] == run, (lang, r["doc_id"])
            run += len(r["ids"])
    # manifest totals agree with the data
    m = {(r["lang"], r["shard"]): r for r in manifest}
    for lang, rows in by_lang.items():
        for r in rows:
            key = (lang, r["shard"])
            assert key in m
    for (lang, shard), r in m.items():
        docs = [x for x in by_lang[lang] if x["shard"] == shard]
        assert r["n_docs"] == len(docs)
        assert r["n_tokens"] == sum(len(x["ids"]) for x in docs)


# ---- JPEG native-codec dispatch ----------------------------------------------

def test_decode_jpeg_auto_fallback_branch_matches_pure():
    """Without PIL (this container), decode_jpeg_auto IS the strict
    pure-Python decoder — identical tuples on generated payloads."""
    from mimir_spark.operators import jpeg

    for doc_id in (0, 3, 7, 12):
        p = jpeg.encode_jpeg_gray_blocks(doc_id)
        assert jpeg.decode_jpeg_auto(p) == jpeg.decode_jpeg(p), doc_id


def test_decode_jpeg_auto_prefers_native_branch(monkeypatch):
    """Dispatch-order pin: when the PIL probe reports available, the
    native branch is what runs (stubbed to a sentinel here since the
    container has no PIL); a native-branch failure falls back to the
    strict parser instead of erroring."""
    from mimir_spark.operators import jpeg

    p = jpeg.encode_jpeg_gray_blocks(5)
    sentinel = (1, 2, 24, 2, 42)
    monkeypatch.setattr(jpeg, "_HAVE_PIL", True)
    monkeypatch.setattr(jpeg, "_pil_decode", lambda payload: sentinel)
    assert jpeg.decode_jpeg_auto(p) == sentinel

    def _broken(payload):
        raise OSError("native codec refused")

    monkeypatch.setattr(jpeg, "_pil_decode", _broken)
    assert jpeg.decode_jpeg_auto(p) == jpeg.decode_jpeg(p)


def test_decode_jpeg_auto_native_equality_when_pil_present():
    """When PIL exists (cluster image), both branches agree on the
    DC-only generated payloads — skipped in the hermetic container."""
    import pytest

    pytest.importorskip("PIL")
    from mimir_spark.operators import jpeg

    for doc_id in (0, 3, 7, 12):
        p = jpeg.encode_jpeg_gray_blocks(doc_id)
        assert jpeg._pil_decode(p) == jpeg.decode_jpeg(p), doc_id


# ---- frozen lang-ID model artifact -------------------------------------------

def test_langid_model_roundtrip_matches_inline(spark, tmp_path):
    """write_langid_model → lang_id_from_model equals lang_id
    row-for-row, and so does lang_id_confidence's underlying scoring
    path: the persisted bounded model carries the whole scorer state
    (the streaming twin's frozen-artifact contract on the batch side).
    The model artifact itself is bounded: |langs|·|V| rows, one file."""
    import glob

    from mimir_spark.operators.textstats import (
        lang_id,
        lang_id_from_model,
        write_langid_model,
    )

    d = str(tmp_path / "langid_model")
    write_langid_model(spark, SF_SMOKE, d)
    files = [f for f in glob.glob(f"{d}/*.parquet")]
    assert len(files) == 1  # bounded single-file artifact
    model = spark.read.parquet(d)
    assert model.count() <= 7 * 1400  # documented bound

    got = {tuple(r) for r in lang_id_from_model(spark, SF_SMOKE, d).collect()}
    expect = {tuple(r) for r in lang_id(spark, SF_SMOKE).collect()}
    assert got == expect and got


def test_langid_from_model_runs_zero_train_stages(spark, tmp_path, monkeypatch):
    """The frozen-model scorer never re-enters the trainer — poisoned
    like the graph-ANN builder pin."""
    from mimir_spark.operators import textstats

    d = str(tmp_path / "langid_model2")
    textstats.write_langid_model(spark, SF_SMOKE, d)

    def _boom(*a, **kw):  # pragma: no cover - executed only on failure
        raise AssertionError("model build re-entered on frozen artifact")

    monkeypatch.setattr(textstats, "lang_trigram_model", _boom)
    assert textstats.lang_id_from_model(spark, SF_SMOKE, d).count() > 0


# ---- URL / domain curation ----------------------------------------------------

def test_url_normalizer_on_crafted_urls(spark):
    """The normalizer is generic: mixed-case host, kept non-tracking
    params get SORTED, tracking params dropped, mirror prefixes and
    scheme collapse, fragments stripped — on hand-written URLs the
    generator never emits."""
    from pyspark.sql import functions as F

    from mimir_spark.operators.urls import normalize_url_cols

    raws = [
        ("http://WWW.Site.COM/a/b?z=2&utm_source=x&a=1#top",),
        ("https://m.site.com/a/b?a=1&z=2",),
        ("https://site.com/a/b?utm_campaign=c&z=2&a=1&gclid=g",),
        ("http://amp.other.org",),
        ("https://other.org?ref=tw",),
    ]
    df = spark.createDataFrame(raws, "url string")
    cols = normalize_url_cols(F.col("url"))
    got = df.select(
        "url",
        cols["norm_url"].alias("n"),
        cols["domain"].alias("d"),
        cols["n_tracking"].alias("t"),
        cols["had_fragment"].alias("f"),
    ).collect()
    by_url = {r.url: r for r in got}
    # all three site.com variants normalize identically
    assert (
        by_url[raws[0][0]].n
        == by_url[raws[1][0]].n
        == by_url[raws[2][0]].n
        == "https://site.com/a/b?a=1&z=2"
    )
    assert by_url[raws[0][0]].d == "site.com"
    assert by_url[raws[0][0]].t == 1 and by_url[raws[0][0]].f == 1
    assert by_url[raws[2][0]].t == 2 and by_url[raws[2][0]].f == 0
    # bare-host URLs: empty path, tracking-only query drops entirely
    assert by_url[raws[3][0]].n == "https://other.org"
    assert by_url[raws[4][0]].n == "https://other.org"


def test_url_dedup_groups_and_blocklist(spark):
    """Every canonical page groups its URL_DOCS_PER_PAGE consecutive
    docs (mirror prefix + scheme + tracking noise collapse), survivor
    is the lowest doc_id, and no blocked-TLD domain survives."""
    from mimir_spark.operators.urls import (
        BLOCKED_TLDS,
        URL_DOCS_PER_PAGE,
        url_dedup_survivors,
    )

    rows = url_dedup_survivors(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert not any(r.domain.endswith("." + t) for t in BLOCKED_TLDS)
        assert 1 <= r.n_docs <= URL_DOCS_PER_PAGE
        assert r.survivor_doc_id % URL_DOCS_PER_PAGE == 0 or r.n_docs == 1
        assert r.norm_url.startswith("https://" + r.domain + "/p/")


def test_url_normalize_plan_jvm_side(spark):
    """Normalization is JVM expression work (one Project over the
    scan — the higher-order filter/array_sort lambdas opt that
    projection out of whole-stage codegen, but it is still Tungsten
    expression eval): no Python/Arrow eval anywhere, no exchange."""
    from mimir_spark.operators.urls import url_normalize

    df = url_normalize(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Project" in plan


def test_bpe_ids_cross_pin_against_bpe_encode(spark):
    """bpe_encode_ids' per-doc id count equals bpe_encode's
    total_symbols (two independent code paths over the same merges),
    and the stream digests are consistent with bpe_corpus_ids."""
    from mimir_spark.operators.tokenizer import (
        UNI_ID_MOD,
        UNI_ID_MULT,
        bpe_corpus_ids,
        bpe_encode,
        bpe_encode_ids,
    )

    totals = {
        r.doc_id: r.total_symbols
        for r in bpe_encode(spark, SF_SMOKE).collect()
    }
    got = {r.doc_id: r for r in bpe_encode_ids(spark, SF_SMOKE).collect()}
    assert set(got) == set(totals) and got
    for doc_id, r in got.items():
        assert r.n_ids == totals[doc_id], doc_id
    streams = {
        r.doc_id: list(r.ids) for r in bpe_corpus_ids(spark, SF_SMOKE).collect()
    }
    for doc_id, stream in streams.items():
        acc = 0
        for x in stream:
            acc = (acc * UNI_ID_MULT + x) % UNI_ID_MOD
        assert got[doc_id].ids_digest == acc, doc_id


def test_streaming_url_dedup_matches_batch(spark, tmp_path):
    """Micro-batch URL dedup partials merge to the batch operator's
    exact output, independent of batch boundaries (min/sum are
    order-insensitive merges)."""
    import glob as globmod
    import os
    import shutil

    from pyspark.sql import functions as F

    from mimir_spark.operators.urls import url_dedup_survivors
    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.urldedup import (
        finalize_url_dedup,
        streaming_url_dedup,
    )

    in_dir = str(tmp_path / "docs_in")
    docs = load_table(spark, SF_SMOKE, "documents")
    # split so canonical-URL pairs (doc 2c, 2c+1) STRADDLE batches —
    # the merge, not the batching, must produce the global min/count
    for m in range(3):
        docs.filter(F.col("doc_id") % 3 == m).coalesce(1).write.parquet(
            f"{in_dir}/b{m}", compression="none"
        )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part in enumerate(sorted(globmod.glob(in_dir + "/b*/part-*.parquet"))):
        shutil.copy(part, f"{flat}/batch_{i}.parquet")

    q = streaming_url_dedup(
        spark, flat, str(tmp_path / "partials"), str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()

    got = {
        tuple(r)
        for r in finalize_url_dedup(spark, str(tmp_path / "partials"))
        .select("norm_url", "domain", "n_docs", "survivor_doc_id")
        .collect()
    }
    want = {tuple(r) for r in url_dedup_survivors(spark, SF_SMOKE).collect()}
    assert got == want and got
