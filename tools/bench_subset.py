"""Bench-subset harness: run bench.py's OWN per-key block (drain + probe
+ warm + k timed samples) for a comma-separated key list, in a session
configured exactly like the bench's (pre-touched heap, UI counters).
Medians print per key — the isolated-A/B tool that matches the driver
bench's methodology sample for sample.

Usage: python tools/bench_subset.py key1,key2 [--passes 3] [--runs 2]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    import bench
    from mergeextractor_spark.registry import load_all
    from mergeextractor_spark.session import get_spark

    spark = get_spark(
        "bench-subset",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "3000",
            "spark.ui.retainedJobs": "300",
            "spark.driver.memory": "12g",
            "spark.driver.extraJavaOptions": "-Xms12g -XX:+AlwaysPreTouch",
        },
    )
    metrics = bench._TaskMetrics(spark)
    reg = load_all()
    keys = [k.strip() for k in args.keys.split(",")]
    acc: dict[str, dict[str, list]] = {k: {"wall": [], "cpu": [], "probe": []} for k in keys}
    for p in range(args.passes):
        for k in keys:
            out = bench._block(spark, reg[k], args.sf, args.runs, metrics)
            acc[k]["wall"] += out["wall"]
            acc[k]["cpu"] += out["cpu_ms"]
            acc[k]["probe"] += [out["probe"], out["probe_after"]]
            print(
                f"pass{p} {k}: wall {[round(w,2) for w in out['wall']]} "
                f"cpu_ms {out['cpu_ms']} probes {out['probe']}/{out['probe_after']}",
                flush=True,
            )
    print("== medians ==")
    for k in keys:
        print(
            f"{k}: wall {statistics.median(acc[k]['wall']):.3f}s "
            f"cpu {statistics.median(acc[k]['cpu'])/1000:.2f}s "
            f"probe_med {statistics.median(acc[k]['probe']):.2f}"
        )


if __name__ == "__main__":
    main()
