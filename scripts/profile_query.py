"""Profile one headline query: stage timeline + driver gaps (guide §7).

Usage: python scripts/profile_query.py <query> [--runs N] [--explain FILE]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Prints, for the LAST (warmest) run: every stage's submission/completion
offset from the run start, task count and shuffle bytes, plus the gaps
where NO stage was running (driver planning / scheduling / collects) —
the signal that exposed the Catalyst stalls in round 14.
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
    explain_to = None
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        if a.startswith("--explain="):
            explain_to = a.split("=", 1)[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    spark = get_spark("profile_query")
    jvm = spark._jvm
    jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.window.WindowExec",
        jvm.org.apache.logging.log4j.Level.ERROR,
    )
    qs = entrymod.queries()
    store = spark._jsc.sc().statusStore()

    def _run(fn, d):
        df = fn(spark, d)
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.xxhash64(*[F.col(c) for c in df.columns])).alias("chk"),
        ).collect()[0]

    def _stages():
        gw = spark.sparkContext._gateway
        sl = store.stageList(
            jvm.java.util.ArrayList(),
            False,
            False,
            gw.new_array(jvm.double, 0),
            jvm.java.util.ArrayList(),
        )
        out = []
        it = sl.iterator()
        while it.hasNext():
            s = it.next()
            sub = s.submissionTime()
            comp = s.completionTime()
            out.append(
                dict(
                    sid=s.stageId(),
                    name=str(s.name())[:60],
                    sub=(sub.get().getTime() if sub.isDefined() else None),
                    comp=(comp.get().getTime() if comp.isDefined() else None),
                    tasks=s.numCompleteTasks(),
                    sw=s.shuffleWriteBytes(),
                    sr=s.shuffleReadBytes(),
                )
            )
        return out

    for name in args:
        fn = qs[name]
        try:
            _run(fn, warm_dir)
        except Exception as exc:
            print(f"# warmup {name} failed: {exc}", file=sys.stderr)
        if explain_to:
            df = fn(spark, sf_dir)
            with open(explain_to, "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print(f"# explain written to {explain_to}")
        times = []
        for i in range(runs):
            wm = max((s["sid"] for s in _stages()), default=-1)
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0w = time.time() * 1000
            t0 = time.perf_counter()
            row = _run(fn, sf_dir)
            dt = time.perf_counter() - t0
            t1w = time.time() * 1000
            times.append(dt)
            if i == runs - 1:
                st = sorted(
                    (s for s in _stages() if s["sid"] > wm and s["sub"]),
                    key=lambda s: s["sub"],
                )
                print(f"\n== {name} run{i}: {dt:.3f}s, {len(st)} stages ==")
                busy = []
                for s in st:
                    sub_o = (s["sub"] - t0w) / 1000
                    comp_o = ((s["comp"] or t1w) - t0w) / 1000
                    busy.append((sub_o, comp_o))
                    print(
                        f"  s{s['sid']:>5} {sub_o:7.3f}-{comp_o:7.3f}"
                        f" ({comp_o - sub_o:6.3f}s) t={s['tasks']:<4}"
                        f" sw={s['sw']:<9} sr={s['sr']:<9} {s['name']}"
                    )
                # merge busy intervals, report gaps > 50ms
                busy.sort()
                merged = []
                for b, e in busy:
                    if merged and b <= merged[-1][1]:
                        merged[-1][1] = max(merged[-1][1], e)
                    else:
                        merged.append([b, e])
                total = (t1w - t0w) / 1000
                gap_total = 0.0
                prev = 0.0
                print("  -- gaps (no stage running) --")
                for b, e in merged:
                    if b - prev > 0.05:
                        print(f"  gap {prev:7.3f}-{b:7.3f} ({b - prev:.3f}s)")
                    gap_total += max(0.0, b - prev)
                    prev = max(prev, e)
                if total - prev > 0.05:
                    print(f"  gap {prev:7.3f}-{total:7.3f} ({total - prev:.3f}s)")
                gap_total += max(0.0, total - prev)
                print(
                    f"  TOTAL {total:.3f}s, stage-busy {total - gap_total:.3f}s,"
                    f" driver-gaps {gap_total:.3f}s"
                )
        print(
            f"{name}: best={min(times):.3f}s runs="
            + ",".join(f"{t:.3f}" for t in times)
            + f" rows={row['n']}"
        )


if __name__ == "__main__":
    main()
