"""A/B row timer: time named workload rows in a fresh session with the
bench's own methodology (noop sink, best-of-N per row) without running
the whole bench. Used for same-window before/after comparisons — flip
the code under test with git stash between invocations.

Usage: python tools/time_rows.py <name> [name ...]   (env: SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_AB_RUNS best-of runs per row, default 3)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monolith_spark.session import get_spark
from monolith_spark.workload import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_AB_RUNS", "3"))


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark(app_name="time-rows")
    qs = all_queries()
    out = {}
    for name in names:
        best = None
        for _ in range(RUNS):
            # spark_fn INSIDE the timed region, exactly like bench.py's
            # timed(): rows that eager-checkpoint during frame build
            # (cluster_pairs rounds, curation feature passes) must pay
            # that cost in the measurement
            t0 = time.perf_counter()
            df = qs[name].spark_fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"{name}: {best:.3f}s", flush=True)
    print("TOTAL:", round(sum(out.values()), 3))
    spark.stop()


if __name__ == "__main__":
    main()
