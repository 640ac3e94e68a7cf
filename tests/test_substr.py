"""max_dup_span (operators/substr.py): the suffix-sorting refinement
must equal a brute-force longest-common-token-substring computation —
the exactness-by-adjacency argument, checked against reality."""

from __future__ import annotations

import duckdb

from mimir_spark.operators.substr import LCP_CAP, MIN_SPAN, max_dup_span


def _brute_force(texts: dict[int, str]) -> dict[int, int]:
    toks = {d: t.split() for d, t in texts.items()}
    out = {d: 0 for d in texts}
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ta, tb = toks[a], toks[b]
            best = 0
            # longest common substring over token sequences, capped
            for sa in range(len(ta)):
                for sb in range(len(tb)):
                    k = 0
                    while (
                        sa + k < len(ta)
                        and sb + k < len(tb)
                        and k < LCP_CAP
                        and ta[sa + k] == tb[sb + k]
                    ):
                        k += 1
                    best = max(best, k)
            if best >= MIN_SPAN:
                out[a] = max(out[a], best)
                out[b] = max(out[b], best)
    return out


def test_max_dup_span_matches_brute_force(spark, sf_smoke):
    con = duckdb.connect()
    texts = dict(
        con.execute(
            f"select doc_id, text from"
            f" read_parquet('{sf_smoke}/documents.parquet')"
        ).fetchall()
    )
    expect = _brute_force(texts)
    got = {
        r.doc_id: r.max_dup_span
        for r in max_dup_span(spark, sf_smoke).collect()
    }
    assert got == expect
    assert any(v >= MIN_SPAN for v in got.values()), (
        "fixture corpus has no duplicated spans — test is vacuous"
    )


def test_max_dup_span_synthetic(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g", "en", "s", 13),
            (2, "x y c d e f z", "en", "s", 13),
            (3, "totally different words here now", "en", "s", 32),
            (4, "a b c d e f g h i j k l m n o p q r s t u v", "en", "s", 40),
            (5, "no", "en", "s", 2),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path)
    docs.write.parquet(f"{d}/documents.parquet")
    got = {r.doc_id: r.max_dup_span for r in max_dup_span(spark, d).collect()}
    assert got == {1: 7, 2: 4, 3: 0, 4: 7, 5: 0}


def test_max_dup_span_no_cartesian_single_group_shuffle(spark, sf_smoke):
    """The suffix sort must be ONE window shuffle on the 3-gram group
    key — no self-join, no cartesian anywhere (the whole point vs the
    pair-table formulation)."""
    from mimir_spark.plans.checks import formatted_plan

    plan = formatted_plan(max_dup_span(spark, sf_smoke))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_max_dup_span_partition_invariance(spark, sf_smoke):
    """Per-doc max cross-doc LCP is independent of sort tie order and
    partitioning (the adjacency-exactness argument) — a sibling
    session with a prime shuffle partition count must agree."""
    odd = spark.newSession()
    odd.conf.set("spark.sql.shuffle.partitions", "7")
    base = {tuple(r) for r in max_dup_span(spark, sf_smoke).collect()}
    alt = {tuple(r) for r in max_dup_span(odd, sf_smoke).collect()}
    assert base == alt and base


def test_streaming_suffix_store_matches_batch(spark, sf_smoke, tmp_path):
    """Per-batch suffix partials merged across micro-batches and
    scored through the shared sort/LCP path must equal the batch
    max_dup_span exactly — the suffix table is a set monoid over
    disjoint doc batches."""
    import glob as globmod
    import os
    import shutil

    from pyspark.sql import functions as F

    from mimir_spark.sources.tables import load_table
    from mimir_spark.streaming.substr import (
        finalize_max_dup_span,
        streaming_suffix_build,
    )

    docs = load_table(spark, sf_smoke, "documents")
    for m in range(3):
        docs.filter(F.col("doc_id") % 3 == m).coalesce(1).write.parquet(
            str(tmp_path / f"b{m}"), compression="none"
        )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part in enumerate(
        sorted(globmod.glob(str(tmp_path) + "/b*/part-*.parquet"))
    ):
        shutil.copy(part, f"{flat}/batch_{i}.parquet")

    q = streaming_suffix_build(
        spark, flat, str(tmp_path / "sfx"), str(tmp_path / "docs"),
        str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.doc_id, r.max_dup_span)
        for r in finalize_max_dup_span(
            spark, str(tmp_path / "sfx"), str(tmp_path / "docs")
        ).collect()
    }
    expect = {
        (r.doc_id, r.max_dup_span)
        for r in max_dup_span(spark, sf_smoke).collect()
    }
    assert got == expect and got
