"""Per-query latency probe against a prebuilt index (default the /dev/shm
profiling index written by an sf0.1 build). Reuses bench.QUERY_SET so the
numbers line up with bench.py's per-query table without paying the build.

Usage: python tools/query_profile.py [index_root] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/prof_idx"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = bench.make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    from bayard_spark.query import SearchEngine

    t0 = time.time()
    engine = SearchEngine(spark, root)
    print(f"engine init {time.time() - t0:.3f}s")
    total_best = 0.0
    for entry in bench.QUERY_SET:
        name, q = entry[0], entry[1]
        req = {"query": q, "collection_kind": "top_docs", "hits": 10}
        if len(entry) > 2:
            req.update(entry[2])
        times = []
        for _ in range(reps):
            t0 = time.time()
            engine.search(req)
            times.append(time.time() - t0)
        total_best += min(times)
        print(f"{name:14s} best {min(times):.3f}  all "
              + " ".join(f"{t:.3f}" for t in times))
    print(f"sum-of-best {total_best:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
