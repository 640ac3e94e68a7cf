"""Time individual headline queries in isolation (guide §1.1/§1.4).

Usage: python scripts/time_query.py <query> [<query> ...] [--runs N]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Uses the same measured action as bench.py (count + xxhash64 checksum
over every output column) so numbers are comparable, with one warmup
run at sf0.001 per query for codegen.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mimir_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 2
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    spark = get_spark("time_query")
    jvm = spark._jvm
    jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.window.WindowExec",
        jvm.org.apache.logging.log4j.Level.ERROR,
    )
    qs = entrymod.queries()

    def _run(fn, d):
        df = fn(spark, d)
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.xxhash64(*[F.col(c) for c in df.columns])).alias("chk"),
        ).collect()[0]

    for name in args:
        fn = qs[name]
        try:
            _run(fn, warm_dir)
        except Exception as exc:
            print(f"# warmup {name} failed: {exc}", file=sys.stderr)
        times = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            row = _run(fn, sf_dir)
            times.append(time.perf_counter() - t0)
        print(
            f"{name}: best={min(times):.3f}s runs="
            + ",".join(f"{t:.3f}" for t in times)
            + f" rows={row['n']}"
        )


if __name__ == "__main__":
    main()
