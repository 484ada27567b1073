#!/usr/bin/env python
"""sf1 rehearsal for the registry TAIL (round-8 verdict item #3).

The per-round scale rehearsal (scale_rehearsal.py) covers the ~106 heavy
headline queries; the relational/frame-API tail had never executed above
bench scale (sf0.1) — and all 12 scale defects to date were caught by
rehearsal, not the driver.  This script runs EVERY registered query NOT
in the rehearsal headline at sf1 (the scale_rehearsal-generated 10×
data), alongside an sf0.1 reference timing in the same session, and
reports the 10×-data ratio per query so superlinear plans surface.

Dimension tables (region/nation/supplier/part) are copied from sf0.1
into the sf1 dir if absent: the rehearsal generator scales FACTS
(lineitem keeps its part/supp keys), so dims stay at driver size — the
denser-join regime, which is also what a fixed product catalog under
10× order volume looks like.  Dim-only queries therefore rehearse at
ratio ~1 by construction; the ratio column says so.

Run AFTER scale_rehearsal.py has generated .scratch/sf1:

    python scripts/tail_rehearsal.py            # writes TAIL_sf1.json
    SPARK_GRAFT_TAIL_ONLY=a,b python scripts/tail_rehearsal.py  # merge
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".scratch", "sf1")
DIM_TABLES = ("region", "nation", "supplier", "part")


def main() -> None:
    if not os.path.exists(os.path.join(SF1, "documents.parquet")):
        sys.exit("run scripts/scale_rehearsal.py first to generate .scratch/sf1")
    for t in DIM_TABLES:
        dst = os.path.join(SF1, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copy(os.path.join(SRC, f"{t}.parquet"), dst)

    import scale_rehearsal  # noqa: E402 — same directory

    from dask_expr_rapids_spark.queries import REGISTRY  # noqa: E402
    from dask_expr_rapids_spark.queries.registry import release_caches  # noqa: E402
    from dask_expr_rapids_spark.session import get_spark  # noqa: E402

    tail = [n for n in REGISTRY if n not in scale_rehearsal.HEADLINE]
    only = os.environ.get("SPARK_GRAFT_TAIL_ONLY")
    if only:
        tail = [n for n in tail if n in only.split(",")]

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name in tail:
        row: dict = {}
        try:
            for key, sf_dir in (("sf01", SRC), ("sf1", SF1)):
                release_caches()
                spark.sparkContext._jvm.System.gc()
                times = []
                n = None
                for _ in range(3):
                    t0 = time.perf_counter()
                    n = REGISTRY[name].fn(spark, sf_dir).count()
                    times.append(time.perf_counter() - t0)
                row[key] = round(statistics.median(times), 3)
                row[f"rows_{key}"] = n
            row["ratio"] = round(row["sf1"] / max(row["sf01"], 1e-9), 2)
            out[name] = row
            print(
                f"{name}: sf0.1 {row['sf01']:.2f}s -> sf1 {row['sf1']:.2f}s "
                f"(x{row['ratio']:.1f}, {row['rows_sf1']} rows)",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001 — a scale failure IS the finding
            errors[name] = f"{type(exc).__name__}: {exc}"[:400]
            print(f"{name}: ERROR {errors[name]}", flush=True)
    release_caches()

    path = os.path.join(REPO, "TAIL_sf1.json")
    doc = {"metric": "tail_sf1_ratios", "queries": out, "n": len(out)}
    if errors:
        doc["errors"] = errors
    if only and os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        prev["queries"].update(out)
        prev["n"] = len(prev["queries"])
        if errors:
            prev.setdefault("errors", {}).update(errors)
        doc = prev
    with open(path, "w") as f:
        f.write(json.dumps(doc) + "\n")
    hot = {k: v for k, v in doc["queries"].items() if v["ratio"] > 5}
    print(f"\n{len(doc['queries'])} tail queries; >5x ratios: {len(hot)}")
    for k, v in sorted(hot.items(), key=lambda kv: -kv[1]["ratio"]):
        print(f"  {k}: x{v['ratio']} ({v['sf01']}s -> {v['sf1']}s)")


if __name__ == "__main__":
    main()
