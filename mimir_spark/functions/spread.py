"""Scale-adaptive input spreading for expensive per-row kernels.

A corpus file smaller than ``spark.sql.files.maxPartitionBytes``
arrives as ONE scan split, so a map-only Python/Arrow kernel (image
decode, HTML extraction, n-gram statistics) runs on a single core
while the rest of the machine idles — at bench scale that turns a
~1 s parallel pass into an 8 s serial one. At 100 TB the same scan
yields thousands of splits and needs no help; an unconditional
``repartition(n)`` there would *shrink* parallelism to the core count
and add a full shuffle of the payload for nothing.

``spread_small_scan`` therefore repartitions ONLY when the input has
fewer partitions than the session's default parallelism — a pure
metadata check (no job): local single-split scans fan out to every
core, cluster-scale scans pass through untouched. Row values are
unchanged, so downstream results (and oracle hashes) are identical.

Round 15: the fan-out target is additionally ROW-AWARE — capped at
``ceil(approx_rows / SPREAD_MIN_ROWS_PER_TASK)`` when the caller can
supply a row estimate — so a few-hundred-row input never becomes one
micro-task per core (round 14's 8-vs-32-core probe showed tiny-task
scheduling overhead dominating exactly those fan-outs). The estimate
comes from ``table_rows``: a LOCAL parquet-footer read (pyarrow
metadata, microseconds, no Spark job); when the footer is unreadable
(remote storage, directory datasets) the cap simply does not apply
and behaviour falls back to the round-14 rule.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# Minimum rows one fan-out task should own. Env-tunable: the right
# value is kernel-cost-dependent (a JPEG decode amortizes scheduling
# at far fewer rows than a token counter), but 64 keeps every current
# kernel's per-task work well above scheduler noise while still
# filling all cores at bench scale (5000 rows / 64 = 79 > 32 tasks).
SPREAD_MIN_ROWS_PER_TASK = int(
    os.environ.get("SPARK_GRAFT_SPREAD_MIN_ROWS", "64")
)


def table_rows(sf_dir: str, table: str) -> int | None:
    """Row count of ``<sf_dir>/<table>.parquet`` from the parquet
    footer alone — local metadata, no Spark job. None when the footer
    cannot be read locally (then spread_small_scan's row cap is
    skipped)."""
    try:
        import pyarrow.parquet as pq

        return pq.read_metadata(
            os.path.join(sf_dir, f"{table}.parquet")
        ).num_rows
    except Exception:
        return None


def spread_small_scan(
    df: DataFrame,
    approx_rows: int | None = None,
    min_rows_per_task: int = SPREAD_MIN_ROWS_PER_TASK,
) -> DataFrame:
    """Repartition ``df`` to min(default parallelism,
    ceil(approx_rows / min_rows_per_task)) iff it currently has fewer
    partitions than that — the no-op path is what makes this safe to
    leave in a 100 TB plan (see module docstring)."""
    if df.isStreaming:
        # a streaming DataFrame has no .rdd (AnalysisException before
        # writeStream.start()) and its micro-batch parallelism is the
        # source's concern — pass through untouched; the batch twins
        # keep the fan-out.
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if approx_rows is not None:
        target = min(
            target, max(1, -(-approx_rows // max(1, min_rows_per_task)))
        )
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
