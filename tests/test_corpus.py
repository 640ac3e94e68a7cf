"""Semantics + plan-shape tests for the corpus-analytics batch and the
skew-salted join demo."""

from __future__ import annotations

from pyspark.sql import functions as F

from mimir_spark.operators import advanced, corpus
from mimir_spark.plans.checks import assert_no_cartesian, formatted_plan
from mimir_spark.sources.tables import load_table


def test_contamination_eval_side_broadcast(spark, sf_smoke):
    """The eval shingle table must be the broadcast side — the corpus
    side must not shuffle its shingles for the join."""
    df = corpus.contamination_check(spark, sf_smoke)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert_no_cartesian(df)


def test_contamination_no_self_pairs(spark, sf_smoke):
    rows = corpus.contamination_check(spark, sf_smoke).collect()
    for r in rows:
        assert r.doc_id % corpus.EVAL_MOD != 0
        assert r.eval_doc_id % corpus.EVAL_MOD == 0
        assert r.n_common >= corpus.MIN_COMMON_SHINGLES


def test_token_entropy_bounds(spark, sf_smoke):
    """0 ≤ H ≤ ln(n_tokens) (uniform distribution is the max)."""
    rows = corpus.token_entropy(spark, sf_smoke).collect()
    import math

    # entropy is rounded to 6 dp, so allow that much slack at the top
    for r in rows:
        assert -1e-6 <= r.entropy <= math.log(r.n_tokens) + 1e-6


def test_doc_length_stats_monotone_percentiles(spark, sf_smoke):
    for r in corpus.doc_length_stats(spark, sf_smoke).collect():
        assert r.p50_chars <= r.p90_chars <= r.p99_chars


def test_source_mix_shares_sum_to_one(spark, sf_smoke):
    rows = corpus.source_mix_report(spark, sf_smoke).collect()
    by_lang: dict[str, float] = {}
    for r in rows:
        by_lang[r.lang] = by_lang.get(r.lang, 0.0) + r.doc_share
    for lang, total in by_lang.items():
        assert abs(total - 1.0) < 1e-4, (lang, total)


def test_ngram_novelty_first_doc_fully_novel(spark, sf_smoke):
    """The smallest doc_id in the corpus can only contain first-seen
    shingles → novelty 1.0; and novelty is always in [0, 1]."""
    rows = corpus.ngram_novelty(spark, sf_smoke).collect()
    first = min(r.doc_id for r in rows)
    by_id = {r.doc_id: r for r in rows}
    assert by_id[first].novelty == 1.0
    for r in rows:
        assert 0.0 <= r.novelty <= 1.0
        assert r.n_novel <= r.n_shingles


def test_user_activity_profile_sane(spark, sf_smoke):
    from mimir_spark.operators import features

    rows = features.user_activity_profile(spark, sf_smoke).collect()
    for r in rows:
        assert r.n_types <= r.n_events
        assert r.active_days <= r.n_events


def test_winsorize_bounds_and_counts(spark, sf_smoke):
    from mimir_spark.operators import features

    ev = load_table(spark, sf_smoke, "events")
    totals = {r.event_type: r.n for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    for r in features.winsorize_events(spark, sf_smoke).collect():
        assert r.p01 <= r.p99
        # each tail clips ~1%
        assert r.n_clipped_low <= 0.02 * totals[r.event_type] + 2
        assert r.n_clipped_high <= 0.02 * totals[r.event_type] + 2
        assert r.p01 <= r.wins_mean <= r.p99


def test_embedding_norm_stats_positive(spark, sf_smoke):
    from mimir_spark.operators import features

    for r in features.embedding_norm_stats(spark, sf_smoke).collect():
        assert 0 < r.min_norm <= r.mean_norm <= r.max_norm


def test_compact_files_roundtrip(spark, sf_smoke, tmp_path):
    """Fragment the documents table into many files, compact, and
    check file count shrinks to the computed target with no row loss."""
    import glob

    from mimir_spark.sources.io import compact_files

    frag = str(tmp_path / "frag")
    docs = load_table(spark, sf_smoke, "documents")
    docs.repartition(24).write.parquet(frag)
    assert len(glob.glob(frag + "/part-*.parquet")) == 24

    out = str(tmp_path / "compact")
    n_files = compact_files(spark, frag, out, target_bytes=64 * 1024 * 1024)
    produced = glob.glob(out + "/part-*.parquet")
    assert len(produced) == n_files
    assert len(produced) < 24
    assert spark.read.parquet(out).count() == docs.count()


def test_skew_join_salted_shape_and_equivalence(spark, sf_smoke):
    """The salted join must (a) be a shuffle join keyed on
    (event_type, salt) — not a broadcast, which would be skew-immune
    anyway — and (b) produce exactly the unsalted result."""
    df = advanced.skew_join_salted(spark, sf_smoke)
    plan = formatted_plan(df)
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan, plan
    assert "salt" in plan, plan

    ev = load_table(spark, sf_smoke, "events")
    dim = ev.groupBy("event_type").agg(F.avg("value").alias("mean_value"))
    plain = (
        ev.join(dim, "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("value") > F.col("mean_value"), 1).otherwise(0))
            .cast("long")
            .alias("n_above_mean"),
        )
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, plain.collect()))


def test_vocab_encode_contract(spark, sf_smoke):
    """Vocabulary ids are dense 1..V by frequency; OOV tokens map to 0;
    prefix length ≤ 16; token counts match the tokenizer."""
    rows = corpus.vocab_encode(spark, sf_smoke).collect()
    from mimir_spark.functions.text import tokens_col

    docs = load_table(spark, sf_smoke, "documents")
    n_toks = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(tokens_col("text")).alias("n")
        ).collect()
    }
    for r in rows:
        assert r.n_tokens == n_toks[r.doc_id]
        assert 0 <= r.n_oov <= r.n_tokens
        ids = [int(x) for x in r.ids_prefix.split(",") if x != ""]
        assert len(ids) == min(16, r.n_tokens)
        assert all(0 <= i <= corpus.VOCAB_SIZE for i in ids)


def test_minhash_dedup_recall_report(spark, sf_smoke):
    """At tuning scale the LSH pair set must recover (nearly) all
    exact-Jaccard pairs: 32 bands x 4 rows catches J>=0.5 pairs with
    probability ~1 - (1-0.5^4)^32 ~ 0.87 PER BAND-MISS-INDEPENDENCE
    assumption; empirically the synthetic corpus dups are far above
    threshold, so recall should be 1.0 and precision 1.0 (verified
    candidates only)."""
    from mimir_spark.operators.dedup import minhash_dedup_recall

    r = minhash_dedup_recall(spark, sf_smoke).collect()[0]
    assert r.n_exact_pairs > 0
    assert r.precision == 1.0
    assert r.recall >= 0.9, r
