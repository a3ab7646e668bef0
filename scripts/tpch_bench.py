"""Time the full 22-query TPC-H shape pack at sf0.1 (supplementary
evidence alongside bench.py, which stays the stable driver-contract
query set). Prints one line per query (best-of-N wall seconds via the
noop sink) and a total; results recorded in SCALE.md.

Usage: python scripts/tpch_bench.py [iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import __spark_entry__ as entry
    from hdk_spark.session import get_spark

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("tpch_bench")
    qs = entry.queries()
    pack = [n for n in qs if n.startswith("tpch_")] + [
        "q1_pricing_summary", "q3_shipping_priority",
        "q5_region_revenue", "q6_revenue_forecast",
    ]
    # warm up (session + parquet footer caches)
    qs["q1_pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    total = 0.0
    for name in sorted(pack):
        best = 1e9
        for _ in range(iters):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        total += best
        print(f"{name}: {best:.3f}")
    print(f"total_22: {total:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
