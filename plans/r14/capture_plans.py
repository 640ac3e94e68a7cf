"""Capture .explain("formatted") for headline queries into
plans/r14/<query>_{before|after}.txt.

Usage: python plans/r14/capture_plans.py before [query ...]
       python plans/r14/capture_plans.py after  [query ...]
With no query list, captures every headline query.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)

from mimir_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402
import bench  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    assert tag in ("before", "after"), tag
    names = sys.argv[2:] or bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan_capture")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(HERE, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(f"captured {name}_{tag}.txt", file=sys.stderr)


if __name__ == "__main__":
    main()
