"""Property-based tests (hypothesis): the portable hash and tokenizer
really are engine-portable, for arbitrary inputs — not just the corpus.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from mimir_spark.functions.text import BASE, MOD


def py_portable_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * BASE + ord(ch)) % MOD
    return h


printable = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0xFFFF, blacklist_categories=("Cs",)),
    min_size=0,
    max_size=40,
)


@settings(max_examples=30, deadline=None)
@given(printable)
def test_duckdb_hash_matches_python(s):
    """The oracle-side list_reduce formula == the reference fold."""
    con = duckdb.connect()
    got = con.execute(
        r"""SELECT list_reduce(
               list_prepend(0::BIGINT,
                 list_transform(regexp_extract_all(?, '[\s\S]'),
                                c -> ascii(c)::BIGINT)),
               (acc, x) -> (acc * 131 + x) % 1000000007)""",
        [s],
    ).fetchone()[0]
    con.close()
    expect = py_portable_hash(s) if s else None
    if s == "":
        assert got in (0, None)
    else:
        assert got == expect


@pytest.mark.parametrize(
    "s",
    ["", "a", "hello world", "tab\tsep", "多语言 文本 here", "x" * 500],
)
def test_spark_hash_matches_python(spark, s):
    """The Spark-side aggregate fold == the reference fold."""
    from pyspark.sql import functions as F

    from mimir_spark.functions.text import portable_token_hash

    df = spark.createDataFrame([(s,)], "t string")
    got = df.select(portable_token_hash(F.col("t")).alias("h")).collect()[0].h
    assert got == py_portable_hash(s)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta"]), min_size=0, max_size=12))
def test_tokenizer_parity_on_generated_text(words):
    """Spark split vs DuckDB string_split_regex on generated docs."""
    text = " ".join(words)
    con = duckdb.connect()
    duck = [
        r[0]
        for r in con.execute(
            r"SELECT unnest(string_split_regex(?, '\s+')) w", [text]
        ).fetchall()
        if r[0] != ""
    ]
    con.close()
    assert duck == words


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcdef gh", min_size=0, max_size=12),
        min_size=0,
        max_size=8,
    )
)
def test_hashed_shingles_track_string_shingles(spark, texts):
    """word_shingle_hashes must agree with word_shingles on set
    CARDINALITY and on pairwise intersection sizes (it only renames
    elements injectively, modulo ~1e-5 31-bit collisions that can't
    occur at these sizes) — the property the MinHash path's Jaccard
    equivalence rests on."""
    from pyspark.sql import functions as F

    from mimir_spark.functions.text import word_shingle_hashes, word_shingles

    rows = [(i, t) for i, t in enumerate(texts)]
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id",
        F.size(word_shingles("text", 3)).alias("n_str"),
        F.size(word_shingle_hashes("text", 3)).alias("n_hash"),
        word_shingles("text", 3).alias("s"),
        word_shingle_hashes("text", 3).alias("h"),
    )
    got = df.collect()
    for r in got:
        assert r.n_str == r.n_hash, (r.s, r.h)
    # pairwise intersection cardinalities agree
    for a in got:
        for b in got:
            si = len(set(a.s) & set(b.s))
            hi = len(set(a.h) & set(b.h))
            assert si == hi, (a.s, b.s, a.h, b.h)


edge_lists = st.lists(
    st.tuples(st.integers(0, 11), st.integers(0, 11)),
    min_size=1,
    max_size=18,
)


@settings(max_examples=8, deadline=None)
@given(edges=edge_lists)
def test_star_cc_matches_union_find(spark, edges):
    """connected_components_star must agree with a union-find reference
    on arbitrary small graphs (self-loops, parallel edges, multiple
    components, any shape)."""
    from mimir_spark.operators.graph import connected_components_star

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent.setdefault(u, u), parent.setdefault(v, v)
        parent[find(u)] = find(v)
    comp_min: dict[int, int] = {}
    for n in parent:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    expect = {(n, comp_min[find(n)]) for n in parent}

    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r.node, r.component)
        for r in connected_components_star(e).collect()
    }
    assert got == expect


@settings(max_examples=200, deadline=None)
@given(
    st.data(),
    st.floats(min_value=0.3, max_value=0.9),
)
def test_prefix_filter_lemma(data, threshold):
    """The guarantee dedup_jaccard_prefix relies on, checked directly:
    for ANY two sets with J ≥ t, the df-ordered prefixes of length
    n − ceil(t·n) + 1 share at least one element. Pure-Python mirror
    of the operator's prefix construction (universe ordered by
    (frequency, element), rarest first) over random small universes —
    no Spark, so hypothesis can hammer it."""
    import math
    from collections import Counter

    universe = list(range(12))
    n_docs = data.draw(st.integers(min_value=2, max_value=6))
    docs = [
        data.draw(
            st.sets(st.sampled_from(universe), min_size=1, max_size=10),
            label=f"doc{i}",
        )
        for i in range(n_docs)
    ]
    df = Counter(x for s in docs for x in set(s))
    order = {x: (df[x], x) for x in universe}

    def prefix(s):
        n = len(s)
        p = n - math.ceil(threshold * n) + 1
        return set(sorted(s, key=lambda x: order[x])[:p])

    for i in range(n_docs):
        for j in range(i + 1, n_docs):
            a, b = docs[i], docs[j]
            jac = len(a & b) / len(a | b)
            if jac >= threshold:
                assert prefix(a) & prefix(b), (
                    f"lemma violated: J={jac} t={threshold} a={a} b={b} "
                    f"pa={prefix(a)} pb={prefix(b)}"
                )


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=255), min_size=1,
             max_size=4000)
)
def test_lzw_roundtrip_arbitrary_sequences(seq):
    """The GIF LZW codec round-trips ANY byte sequence — hypothesis
    explores dictionary-growth boundaries, repeated-symbol (KwKwK)
    patterns, and incompressible noise beyond the fixed stress
    cases."""
    from mimir_spark.operators.multimodal import _lzw_decode, _lzw_encode

    assert list(_lzw_decode(_lzw_encode(seq))) == seq


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=10),
    st.data(),
)
def test_png_roundtrip_arbitrary_pixels(w, h, data):
    """encode_png_rgb/decode_png round-trip arbitrary pixel contents
    at arbitrary tiny dimensions — every row filter (cycled per row)
    must invert exactly whatever the pixel data is, not just on the
    smooth generation-rule ramps the driver keys use."""
    from mimir_spark.operators.multimodal import decode_png, encode_png_rgb

    raw = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=255),
            min_size=w * h * 3,
            max_size=w * h * 3,
        )
    )
    dw, dh, bpp, n, s = decode_png(encode_png_rgb(w, h, raw))
    assert (dw, dh, bpp, n) == (w, h, 24, w * h)
    assert s == sum(raw)


@settings(max_examples=20, deadline=None)
@given(
    st.integers(1, 40),  # width
    st.integers(1, 24),  # height
    st.integers(0, 2**31 - 1),  # content seed
    st.booleans(),  # gray vs color
)
def test_jpeg_q1_roundtrip_bounded_error(w, h, seed, gray):
    """Property pin for the baseline JPEG codec: at an all-ones quant
    table, ANY image (arbitrary non-multiple-of-8 sizes, gray or
    color) round-trips within the conforming-IDCT error budget —
    ±1/pixel for gray (DCT+IDCT float rounding), ±3 for color: the
    forward YCbCr quantization's ±0.5 comes back through the
    1.772/1.402 reconstruction coefficients as up to ±0.9, which can
    stack with the IDCT's ±1 and the final pixel rounding (hypothesis
    found a genuine 3 at h=7; a 200-image sweep maxes at 3). Catches
    padding/edge-extension bugs a fixed-size test can't."""
    import numpy as np

    from mimir_spark.operators.jpeg import decode_jpeg_pixels, encode_jpeg

    rng = np.random.RandomState(seed % (2**31))
    px = (
        rng.randint(0, 256, (h, w)).astype(np.uint8)
        if gray
        else rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    )
    ww, hh, rgb = decode_jpeg_pixels(encode_jpeg(px))
    assert (ww, hh) == (w, h)
    if gray:
        err = np.abs(rgb[:, :, 0].astype(int) - px.astype(int)).max()
        assert err <= 1, err
    else:
        err = np.abs(rgb.astype(int) - px.astype(int)).max()
        assert err <= 3, err


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(1, 6))
def test_jpeg_dc_only_exact_any_geometry(seed, ri):
    """Block-constant images decode EXACTLY at any block geometry and
    any restart interval — the exactness contract the oracle-checked
    key relies on, generalized beyond the generator's 8 sizes."""
    import numpy as np

    from mimir_spark.operators.jpeg import decode_jpeg_pixels, encode_jpeg

    rng = np.random.RandomState(seed % (2**31))
    nbx, nby = rng.randint(1, 6), rng.randint(1, 5)
    px = np.zeros((nby * 8, nbx * 8), dtype=np.uint8)
    for by in range(nby):
        for bx in range(nbx):
            px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = rng.randint(0, 256)
    _, _, rgb = decode_jpeg_pixels(encode_jpeg(px, restart_interval=ri))
    assert np.array_equal(rgb[:, :, 0], px)


@given(
    st.text(alphabet="abcdef", min_size=0, max_size=60),
    st.text(alphabet="abcdef", min_size=0, max_size=60),
    st.text(alphabet="ghijkl", min_size=15, max_size=40),
)
@settings(max_examples=60, deadline=None)
def test_winnowing_guarantee_property(prefix, suffix, common):
    """Any two texts sharing a >= k+w-1 (15) char substring share at
    least one winnowing fingerprint — the Schleimer guarantee, over
    random surroundings (disjoint alphabets keep the planted run the
    only long common substring)."""
    import hashlib

    def fps(text, k=8, w=8):
        kh = [
            int(hashlib.md5(text[i : i + k].encode()).hexdigest()[:8], 16)
            & 0x7FFFFFFF
            for i in range(len(text) - k + 1)
        ]
        return {min(kh[s : s + w]) for s in range(len(kh) - w + 1)}

    a = prefix + common + suffix
    b = suffix + common + prefix
    assert fps(a) & fps(b)


@given(
    st.lists(st.integers(min_value=-10**9, max_value=10**9),
             min_size=1, max_size=200),
    st.integers(min_value=-10**6, max_value=10**6),
    st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=100, deadline=None)
def test_cusum_closed_form_equals_recursion(ds, mu, k):
    """The closed prefix form S_t = c_t - min(0, min_j<=t c_j) equals
    the textbook recursion S_t = max(0, S_{t-1} + d_t) in exact
    integer arithmetic — the identity cusum_changepoints' two-window
    plan AND the streaming twin's recursion both rely on."""
    adj = [d - mu - k for d in ds]
    s_rec = 0
    c = 0
    mins = 0
    for d in adj:
        s_rec = max(0, s_rec + d)
        c += d
        mins = min(mins, c)
        s_closed = c - min(0, mins)
        assert s_closed == s_rec


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.text(alphabet="0123456789", min_size=13, max_size=19),
        min_size=1,
        max_size=8,
    )
)
def test_luhn_expression_matches_python(spark, digit_strings):
    """pii_scrub's expression-side Luhn fold vs the textbook python
    recursion over arbitrary digit strings."""
    from mimir_spark.operators.textstats2 import _luhn_ok

    def luhn_py(d: str) -> bool:
        total = 0
        for idx, ch in enumerate(reversed(d)):
            v = int(ch)
            if idx % 2 == 1:
                v *= 2
                if v > 9:
                    v -= 9
            total += v
        return total % 10 == 0

    df = spark.createDataFrame([(d,) for d in digit_strings], "d string")
    got = {r["d"]: r["ok"] for r in df.selectExpr("d", _luhn_ok("d") + " AS ok").collect()}
    assert got == {d: luhn_py(d) for d in digit_strings}


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=9),
        min_size=1,
        max_size=6,
        unique=True,
    ),
    st.dictionaries(
        st.text(alphabet="abcd", min_size=1, max_size=3),
        st.integers(min_value=-5_000_000, max_value=-1),
        min_size=0,
        max_size=12,
    ),
)
def test_viterbi_fold_matches_enumeration(spark, words, extra_vocab):
    """tokenizer._viterbi_pieces (the O(n·MAXP) positional DP) vs
    exhaustive enumeration with the global tie-break (score desc,
    reversed piece-length sequence desc) over random integer-weight
    vocabularies — single chars always present so every word
    segments."""
    from pyspark.sql import functions as FF

    from mimir_spark.operators.tokenizer import UNI_MAXP, _viterbi_pieces

    vocab = {c: -1_000_000 for c in "abcd"}
    vocab.update({p: w for p, w in extra_vocab.items() if len(p) <= UNI_MAXP})

    def segmentations(word):
        if not word:
            yield []
            return
        for k in range(1, min(UNI_MAXP, len(word)) + 1):
            if word[:k] in vocab:
                for rest in segmentations(word[k:]):
                    yield [word[:k]] + rest

    def best_py(word):
        return max(
            segmentations(word),
            key=lambda segs: (
                sum(vocab[p] for p in segs),
                list(reversed([len(p) for p in segs])),
            ),
        )

    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: list(r["segs"])
        for r in df.select(
            "word", _viterbi_pieces(FF.col("word"), vocab).alias("segs")
        ).collect()
    }
    assert got == {w: best_py(w) for w in words}
