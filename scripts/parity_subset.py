"""Oracle parity for a subset of declared queries, across SFs.

Usage: python scripts/parity_subset.py <query> [...] [--sf=0.001,0.01,0.1]
With no queries: every oracle_sql() key (slow).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sfs = ["0.001", "0.01"]
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sfs = a.split("=", 1)[1].split(",")
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e
    from tests.parity import duck_connection, compare

    oracle = e.oracle_sql()
    qs = e.queries()
    names = names or sorted(oracle)
    n_fail = 0
    for sf in sfs:
        sf_dir = f"/root/testdata/sf{sf}"
        con = duck_connection(sf_dir)
        for name in names:
            if name not in oracle:
                print(f"SKIP {name} (no oracle)")
                continue
            ok, msg = compare(qs[name](spark, sf_dir), oracle[name], con)
            print(("OK  " if ok else "FAIL"), f"sf{sf}", name, msg)
            n_fail += 0 if ok else 1
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
