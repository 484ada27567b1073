#!/usr/bin/env python
"""Isolated warm median for one registered query.

Protocol (BENCH_PROTOCOL.md): ONE fresh process per query, 1 warm-up run
then median of 5 timed runs at sf0.1 on an otherwise idle machine, using
EXACTLY bench.py's measurement shape — ``.count()`` actions, scoped caches
released only before/after the query (never between its timed runs), and a
System.gc() before timing.  Usage:

    python scripts/isolated_median.py <query_name> [sf_dir]

Prints one JSON line {"query": ..., "median": ..., "runs": [...]}.
Run queries SEQUENTIALLY (never two Spark JVMs at once when timing).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dask_expr_rapids_spark.queries import REGISTRY  # noqa: E402
from dask_expr_rapids_spark.queries.registry import release_caches  # noqa: E402
from dask_expr_rapids_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    q = REGISTRY[name]
    spark = get_spark(
        app_name=f"isolated-{name}",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext._jvm.System.gc()
    q.fn(spark, sf_dir).count()  # warm-up (primes file listing + codegen)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).count()
        times.append(time.perf_counter() - t0)
    release_caches()
    print(json.dumps({
        "query": name,
        "sf_dir": sf_dir,
        "median": round(statistics.median(times), 3),
        "runs": [round(t, 3) for t in times],
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
