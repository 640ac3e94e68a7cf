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
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism iff it
    currently has fewer partitions than that — the no-op path is what
    makes this safe to leave in a 100 TB plan (see module docstring)."""
    if df.isStreaming:
        # a streaming DataFrame has no .rdd (AnalysisException before
        # writeStream.start()) and its micro-batch parallelism is the
        # source's concern — pass through untouched; the batch twins
        # keep the fan-out.
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
