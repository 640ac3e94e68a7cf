"""SF-scaling probe: runs a representative operator slice at
sf0.001 / sf0.01 / sf0.1 and reports wall time + input/output rows per
SF, so superlinear blowups show up as growth ratios far above the
input growth ratio.

The point is not the absolute numbers (local fixed overheads — job
scheduling, codegen, Python worker spin-up — dominate at tiny SF); it
is the SHAPE: an operator whose time grows ~linearly (or less) with
input across two decades of SF has no hidden quadratic stage, while a
pair-explosion bug would show a 100× step between sf0.01 and sf0.1.

Usage: python scaling_probe.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mimir_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

SFS = ["0.001", "0.01", "0.1"]
# scan-bound, join-heavy, window/shuffle, LSH dedup, tiled GEMM,
# distributed prefix sum, wedge-join graph
PROBES = [
    "q1_pricing_summary",
    "q5_nation_revenue",
    "sessionize",
    "dedup_minhash_lsh",
    "knn_graph",
    "sequence_pack",
    "triangle_count",
    "dedup_span_removal",
    "hll_distinct",
    "dedup_jaccard_prefix",
    "dedup_containment_lsh",
    "dedup_icws",
    # suffix-sorting substring refinement: the ~16× suffix-table
    # blow-up is constant-factor, so time must track input growth
    "max_dup_span",
    # round-6: batched retrieval (one corpus pass per query batch)
    # and the positional phrase join
    "bm25_topk_batch",
    "phrase_search",
    # round-9: PassJoin edit-distance dedup (candidate fan-out is
    # O(K²)/doc, so time must track input, never pair-space) and the
    # IVF-PQ probe (cell-pruned code scan)
    "dedup_edit_distance",
    "ann_ivfpq_topk",
    # round-10: the end-to-end keep-list — three doc_id semi/anti
    # joins over bounded-shuffle stage chains; the one headline
    # integration query, so its growth must track the corpus too
    "corpus_keep_list",
    # round-11: the doc-local repetition kernel (map-only — time must
    # track tokens) and the SQ8 encode+score pass (vector-linear)
    "gopher_repetition_filter",
    "ann_sq_topk",
    # late round-11: KMV set algebra (one distinct shuffle + bottom-k
    # heaps; everything after is |sources|*k — time must track the
    # token scan) and winnowing matches (map-only extraction +
    # df-capped pair join — time must track the corpus, never pairs)
    "kmv_source_setops",
    "winnowing_matches",
    # round-12: the trigram KN fold (4-key joins over trigram TYPE
    # tables — state grows with distinct trigrams, time must track
    # the token scan), perceptual image near-dup (decode-bound map +
    # pigeonhole bucket join), the trigram NB language ID (bounded
    # model build + broadcast-join scoring — time must track the
    # char scan), the unigram trainer (corpus-once + vocab-sized EM
    # rounds), and the graph-ANN query path (round 13: reads the
    # cached persisted index — first probe run pays the build, and
    # the query stage's per-round work is corpus-independent)
    "kneser_ney3_logppl",
    "multimodal_dedup_images_near",
    "lang_id",
    "unigram_lm_train",
    "ann_graph_topk",
    # late round-12: the truss peel (5 wedge joins over a shrinking
    # edge set), A-Priori pairs (pruned within-basket self-join), RAKE
    # (one doc-keyed window chain + bounded word/phrase aggs), and the
    # Holt-Winters fold (|types| folds over hourly arrays — time must
    # track the one corpus scan)
    "k_truss",
    "frequent_pairs",
    "rake_keywords",
    "holt_winters_hourly",
    # round-13: the fused HTML synthesize+extract Arrow kernel
    # (map-only — time must track the corpus), URL dedup (map-only
    # normalize + one canonical-key groupBy), and the subword id
    # emission (Viterbi per DISTINCT word + one join back — time must
    # track tokens, never the cross of docs × vocab)
    "html_extract_text",
    "url_dedup_survivors",
    "unigram_encode_ids",
    # round-14: encode from the FROZEN artifact (must track tokens —
    # and its gap vs unigram_encode_ids is the train cost the artifact
    # saves), byte-level BPE ids (byte-linear, ~4-5× the char token
    # count, never more), and the MJPEG AVI walk (map-only container
    # decode — time must track docs)
    "unigram_encode_ids_frozen",
    "byte_bpe_encode_ids",
    "multimodal_frame_sample_mjpeg",
]
INPUT_TABLES = {
    "q1_pricing_summary": "lineitem",
    "q5_nation_revenue": "lineitem",
    "sessionize": "events",
    "dedup_minhash_lsh": "documents",
    "knn_graph": "embeddings",
    "sequence_pack": "documents",
    "triangle_count": "lineitem",
    "dedup_span_removal": "documents",
    "hll_distinct": "events",
    "dedup_jaccard_prefix": "documents",
    "dedup_containment_lsh": "documents",
    "dedup_icws": "documents",
    "max_dup_span": "documents",
    "bm25_topk_batch": "documents",
    "phrase_search": "documents",
    "dedup_edit_distance": "documents",
    "ann_ivfpq_topk": "embeddings",
    "corpus_keep_list": "documents",
    "gopher_repetition_filter": "documents",
    "ann_sq_topk": "embeddings",
    "kmv_source_setops": "documents",
    "winnowing_matches": "documents",
    "kneser_ney3_logppl": "documents",
    "multimodal_dedup_images_near": "documents",
    "lang_id": "documents",
    "unigram_lm_train": "documents",
    "ann_graph_topk": "embeddings",
    "k_truss": "lineitem",
    "frequent_pairs": "lineitem",
    "rake_keywords": "documents",
    "holt_winters_hourly": "events",
    "html_extract_text": "documents",
    "url_dedup_survivors": "documents",
    "unigram_encode_ids": "documents",
    "unigram_encode_ids_frozen": "documents",
    "byte_bpe_encode_ids": "documents",
    "multimodal_frame_sample_mjpeg": "documents",
}


def main() -> None:
    from pyspark.sql import functions as F

    spark = get_spark("mimir_spark_scaling_probe")
    queries = entrymod.queries()
    out: dict[str, dict] = {}
    in_rows: dict[str, dict[str, int]] = {}
    for sf in SFS:
        sf_dir = f"/root/testdata/sf{sf}"
        in_rows[sf] = {
            t: spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
            for t in sorted(set(INPUT_TABLES.values()))
        }
        for name in PROBES:
            df = queries[name](spark, sf_dir)
            df.count()  # warm: codegen + page cache
            t0 = time.time()
            df2 = queries[name](spark, sf_dir)
            n = df2.agg(
                F.count("*").alias("n"), F.max(F.xxhash64(*df2.columns))
            ).collect()[0]["n"]
            el = round(time.time() - t0, 3)
            out.setdefault(name, {"input": INPUT_TABLES[name], "sf": {}})
            out[name]["sf"][sf] = {"sec": el, "out_rows": n}
            print(f"# sf{sf} {name}: {n} rows in {el}s", file=sys.stderr)
    for name, rec in out.items():
        t_small, t_big = rec["sf"]["0.01"]["sec"], rec["sf"]["0.1"]["sec"]
        r_small = in_rows["0.01"][rec["input"]]
        r_big = in_rows["0.1"][rec["input"]]
        rec["time_ratio_0.01_to_0.1"] = round(t_big / max(t_small, 1e-9), 2)
        rec["input_ratio_0.01_to_0.1"] = round(r_big / max(r_small, 1), 2)
    print(json.dumps({"input_rows": in_rows, "probes": out}))


if __name__ == "__main__":
    main()
