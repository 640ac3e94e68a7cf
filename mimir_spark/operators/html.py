"""HTML / boilerplate text extraction — the first stage of every real
web-corpus pipeline (trafilatura / jusText / C4's tag-strip + block
filter), and the round-12 verdict's top-ranked missing capability.

The multimodal-codec recipe applied to markup: the container has no
web corpus, so a DETERMINISTIC synthetic-HTML generator (an Arrow
mapInPandas kernel — nav/sidebar/footer boilerplate, paragraph
re-wrapping, entity escaping, inline tags, link-density variation, all
pure functions of (doc_id, text)) wraps each document, and a GENERIC
extractor kernel recovers the main text; the DuckDB oracle never
parses HTML — it recomputes the expected extraction straight from the
generation rule, so a cheating extractor (one that echoed the raw doc
instead of parsing) would still hash-match ONLY if it also reproduced
the title/paragraph/count structure the rule dictates. Crafted
hand-written pages (not generator output) pin the extractor as a real
parser in pytest.

Extraction algorithm (the jusText/trafilatura core, deterministic):
  1. drop <script>/<style> wholesale;
  2. split the (flat) body into block elements;
  3. SEMANTIC drop: <nav>/<footer>/<header>/<aside> are boilerplate
     by tag;
  4. LINK-DENSITY drop: any other block whose anchor-text chars
     exceed HTML_LINK_DENSITY_MAX of its text chars (the sidebar
     pattern: short, link-stuffed);
  5. strip inline tags, unescape entities, collapse whitespace, join
     kept blocks in document order.

Scale shape: one corpus scan → one Arrow kernel (generation +
extraction fused per batch; no shuffle at all — embarrassingly
parallel over documents, the same shape as multimodal_meta). The
kernel is regex/state-machine Python over Arrow batches; blocks are
parsed flat (the generator emits flat bodies; a production crawl
corpus would swap in a tree parser behind the same batch contract).
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame, SparkSession

from mimir_spark.sources.tables import load_table
from mimir_spark.functions.spread import spread_small_scan

# generation-rule constants (the oracle re-derives everything from
# these — change one and the oracle changes with it via oracle_sql)
HTML_PARA_BASE = 8     # paragraph length = BASE + doc_id % RANGE tokens
HTML_PARA_RANGE = 5
HTML_NAV_BASE = 2      # nav links = BASE + doc_id % RANGE
HTML_NAV_RANGE = 3
HTML_SIDE_BASE = 3     # sidebar links = BASE + doc_id % RANGE
HTML_SIDE_RANGE = 4
HTML_SIDE_SKIP_MOD = 7  # doc_id % 7 == 0 → page has NO sidebar
HTML_LINK_DENSITY_MAX = 0.33

HTML_SCHEMA = (
    "doc_id long, extracted_text string, extracted_len long,"
    " n_blocks long, n_kept long, n_dropped_semantic long,"
    " n_dropped_density long, n_links long"
)

_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;")]


def _escape(s: str) -> str:
    for raw, ent in _ESCAPES:
        s = s.replace(raw, ent)
    return s


def _unescape(s: str) -> str:
    for raw, ent in reversed(_ESCAPES):
        s = s.replace(ent, raw)
    return s


def synthesize_page(doc_id: int, text: str) -> str:
    """Deterministic HTML page for one document: head with script/
    style noise, nav, an <h1> title, the doc's tokens re-wrapped into
    fixed-size <p> paragraphs (first token of every third paragraph
    bolded), an optional link-stuffed sidebar <div>, a footer."""
    toks = [_escape(t) for t in text.split()]
    plen = HTML_PARA_BASE + doc_id % HTML_PARA_RANGE
    paras = [toks[i:i + plen] for i in range(0, len(toks), plen)]
    nav_n = HTML_NAV_BASE + doc_id % HTML_NAV_RANGE
    side_n = HTML_SIDE_BASE + doc_id % HTML_SIDE_RANGE
    parts = [
        "<html><head><title>synthetic</title>",
        "<style>body { margin: 0; }</style>",
        "<script>var tracker = 'noise < not a tag';</script>",
        "</head><body>",
        "<nav>"
        + " | ".join(
            f'<a href="/nav/{i}">nav item {i}</a>' for i in range(nav_n)
        )
        + "</nav>",
        f"<h1>Document {doc_id}</h1>",
    ]
    for pi, p in enumerate(paras):
        body = list(p)
        if body and (doc_id + pi) % 3 == 0:
            body[0] = f"<b>{body[0]}</b>"
        parts.append("<p>" + " ".join(body) + "</p>")
    if doc_id % HTML_SIDE_SKIP_MOD != 0:
        parts.append(
            '<div class="sidebar">'
            + " · ".join(
                f'<a href="/rel/{i}">related link {i}</a>'
                for i in range(side_n)
            )
            + "</div>"
        )
    parts.append("<footer>&copy; synthetic corpus — all rights"
                 " reserved</footer></body></html>")
    return "\n".join(parts)


_BLOCK_RE = re.compile(
    r"<(nav|header|footer|aside|h[1-6]|p|div|section|article)\b[^>]*>"
    r"(.*?)</\1>",
    re.DOTALL | re.IGNORECASE,
)
_ANCHOR_RE = re.compile(r"<a\b[^>]*>(.*?)</a>", re.DOTALL | re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")
_SEMANTIC_DROP = {"nav", "header", "footer", "aside"}


def extract_page(html: str) -> dict:
    """Generic extractor over ONE page (flat block structure): returns
    the kept text plus the audit counters. Pure function — shared by
    the Spark kernel and the crafted-page pytest."""
    page = re.sub(
        r"<(script|style)\b[^>]*>.*?</\1>", "", html,
        flags=re.DOTALL | re.IGNORECASE,
    )
    kept: list[str] = []
    n_blocks = n_sem = n_den = n_links = 0
    for m in _BLOCK_RE.finditer(page):
        tag, inner = m.group(1).lower(), m.group(2)
        n_blocks += 1
        anchors = _ANCHOR_RE.findall(inner)
        n_links += len(anchors)
        if tag in _SEMANTIC_DROP:
            n_sem += 1
            continue
        text = _WS_RE.sub(" ", _TAG_RE.sub(" ", inner)).strip()
        link_text = _WS_RE.sub(
            " ", " ".join(_TAG_RE.sub(" ", a) for a in anchors)
        ).strip()
        # empty blocks are pure markup — boilerplate by the same
        # content-density reasoning as link-stuffed ones
        if not text or len(link_text) / len(text) > HTML_LINK_DENSITY_MAX:
            n_den += 1
            continue
        kept.append(_unescape(text))
    extracted = " ".join(kept)
    return {
        "extracted_text": extracted,
        "extracted_len": len(extracted),
        "n_blocks": n_blocks,
        "n_kept": n_blocks - n_sem - n_den,
        "n_dropped_semantic": n_sem,
        "n_dropped_density": n_den,
        "n_links": n_links,
    }


def html_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize + extract in ONE fused Arrow kernel over the corpus
    scan (zero shuffles; column pruning reaches the parquet scan —
    only doc_id/text are read). Output is one audit row per document:
    the extracted main text and the block/link accounting.

    Oracle: the expected extraction is a closed-form function of
    (doc_id, tokens) — title 'Document {id}' + space-joined tokens;
    block counts from the paragraph-wrap/nav/sidebar rules — so DuckDB
    recomputes it without any HTML in sight."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return html_extract_docs(docs)


def html_extract_docs(docs: DataFrame) -> DataFrame:
    """The fused synthesize+extract kernel over an ARBITRARY
    (doc_id, text) frame — shared by the batch operator and the
    streaming twin (extraction is a pure per-doc map, so batch and
    micro-batch runs are identical row-for-row by construction)."""
    docs = docs.select("doc_id", "text")

    def _kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                out = extract_page(synthesize_page(int(doc_id), text or ""))
                out["doc_id"] = int(doc_id)
                rows.append(out)
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "extracted_text", "extracted_len",
                    "n_blocks", "n_kept", "n_dropped_semantic",
                    "n_dropped_density", "n_links",
                ],
            )

    return spread_small_scan(docs).mapInPandas(_kernel, HTML_SCHEMA)


def expected_extraction(doc_id: int, text: str) -> dict:
    """Python twin of the oracle's closed form (used by pytest to pin
    the oracle rule itself against the kernel on crafted docs)."""
    toks = text.split()
    plen = HTML_PARA_BASE + doc_id % HTML_PARA_RANGE
    n_para = math.ceil(len(toks) / plen)
    has_side = doc_id % HTML_SIDE_SKIP_MOD != 0
    title = f"Document {doc_id}"
    extracted = title + (" " + " ".join(toks) if toks else "")
    return {
        "doc_id": doc_id,
        "extracted_text": extracted,
        "extracted_len": len(extracted),
        "n_blocks": 3 + int(has_side) + n_para,
        "n_kept": 1 + n_para,
        "n_dropped_semantic": 2,
        "n_dropped_density": int(has_side),
        "n_links": (HTML_NAV_BASE + doc_id % HTML_NAV_RANGE)
        + (int(has_side) * (HTML_SIDE_BASE + doc_id % HTML_SIDE_RANGE)),
    }
