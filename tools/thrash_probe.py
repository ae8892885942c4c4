"""Reproduce and adjudicate the JVM thrash mode (VERDICT r13 item 1).

The r13 final bookends recorded samples burning 10-130x their normal
EXECUTOR CPU (agg_source_overlap 1,691 s on a ~100 s wall vs a normal
~6 s/sample; ann_pq_topk 424 s; pipeline_hybrid_search ~100x) — real
JVM work, not host steal (the freeze probe separates those).  Candidate
mechanisms, each with a distinct counter signature:

  A. cache-eviction recompute cascade  -> task count EXPLODES
     (every consumer stage re-runs the evicted relation's lineage;
     the 'Block rdd_X already exists' warning fires on concurrent
     rebuilds)
  B. stage/task retry loops            -> task count explodes AND
     attemptId > 0 stages appear
  C. GC storm (heap full of session
     residue, ContextCleaner starved)  -> jvmGcTime explodes, task
     count FLAT, cpu/task inflated
  D. codegen-cache fallback /
     interpreted evaluation            -> task count flat, gc flat,
     cpu/task inflated 10-50x on expression-heavy plans

This tool runs ONE scenario per process (memory confs are
session-frozen) and prints one JSON line per sample with wall / cpu /
gc / run / tasks / shuffle, so the signatures above are directly
readable.  Scenarios:

  baseline       clean session, N samples of --key
  ballast=F      first cache a ballast frame sized to F x storage
                 memory (F>1 forces eviction of everything else),
                 keep it referenced, then run the samples
  lowmem         spark.memory.fraction=0.08 (tiny unified region) —
                 the 'induced executor-memory pressure' reproduction
                 the verdict ordered
  ckpt=N         leave N superseded localCheckpoint constructions
                 undrained first (the r11 residue class)
  heapfill       churn the heap with dead session objects (construct+
                 drop 40 cached frames, no GC nudge) first

Usage:
  python tools/thrash_probe.py --scenario baseline --key agg_source_overlap
  python tools/thrash_probe.py --scenario ballast=1.2 --key agg_source_overlap
  python tools/thrash_probe.py --scenario lowmem --key agg_source_overlap
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


class Metrics:
    """bench._TaskMetrics plus jvmGcTime and task counts (the two
    discriminator columns the scenarios above need)."""

    def __init__(self, spark) -> None:
        sc = spark.sparkContext
        self.url = (
            f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
            "/stages?details=false"
        )
        self._seen: dict[tuple[int, int], tuple[int, ...]] = {}
        self._tot = [0, 0, 0, 0, 0]
        self.retried_stages: set[tuple[int, int]] = set()

    def snapshot(self):
        import urllib.request

        with urllib.request.urlopen(self.url, timeout=60) as r:
            stages = json.load(r)
        for s in stages:
            key = (s["stageId"], s.get("attemptId", 0))
            if key[1] > 0:
                self.retried_stages.add(key)
            cur = (
                s.get("executorCpuTime", 0),
                s.get("executorRunTime", 0),
                s.get("jvmGcTime", 0),
                s.get("numCompleteTasks", 0) + s.get("numFailedTasks", 0),
                s.get("shuffleReadBytes", 0) + s.get("shuffleWriteBytes", 0),
            )
            old = self._seen.get(key, (0,) * 5)
            for i in range(5):
                if cur[i] > old[i]:
                    self._tot[i] += cur[i] - old[i]
            self._seen[key] = tuple(max(c, o) for c, o in zip(cur, old))
        return tuple(self._tot)


def host_counters() -> dict:
    """Guest-kernel truth: whole-box user/system/idle/iowait/STEAL ticks
    from /proc/stat, plus the JVM process's own utime/stime.  Steal is
    the decisive column — a sample whose executorCpuTime inflates WITH a
    steal surge ran under hypervisor preemption (charged to threads when
    the kernel lacks paravirt task-time accounting); steal-flat CPU
    inflation would be real code work."""
    parts = open("/proc/stat").readline().split()
    # user nice system idle iowait irq softirq steal
    user, system, idle, iowait, steal = (
        int(parts[1]), int(parts[3]), int(parts[4]), int(parts[5]),
        int(parts[8]),
    )
    ju = js = 0
    for pid in _own_java_pids():
        try:
            st = open(f"/proc/{pid}/stat").read().rsplit(")", 1)[1].split()
            ju += int(st[11])  # utime (field 14, 0-indexed 11 after comm)
            js += int(st[12])  # stime
        except OSError:
            continue
    return {
        "user": user, "system": system, "idle": idle, "iowait": iowait,
        "steal": steal, "java_utime": ju, "java_stime": js,
    }


_HZ = os.sysconf("SC_CLK_TCK")


def _own_java_pids() -> list[str]:
    """THIS session's JVM(s): java processes whose parent is this python
    driver (two A/B monitor processes must not read each other's JVM)."""
    me = str(os.getpid())
    out = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/comm") as f:
                if f.read().strip() != "java":
                    continue
            st = open(f"/proc/{pid}/stat").read().rsplit(")", 1)[1].split()
            if st[1] == me:  # ppid (field 4, 0-indexed 1 after comm)
                out.append(pid)
        except OSError:
            continue
    return out


def run_block(spark, key: str, sf_dir: str, n: int, drain: bool) -> None:
    from mergeextractor_spark.registry import load_all

    q = load_all()[key]
    m = Metrics(spark)
    if drain:
        from mergeextractor_spark.operators._util import drain_persistent_rdds

        drain_persistent_rdds(spark, gc_sweep=True)
    df = q.spark(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()  # warm
    for i in range(n):
        b = m.snapshot()
        hb = host_counters()
        t0 = time.time()
        df = q.spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        a = m.snapshot()
        ha = host_counters()
        print(
            json.dumps(
                {
                    "sample": i,
                    "wall_s": round(wall, 2),
                    "cpu_s": round((a[0] - b[0]) / 1e9, 2),
                    "run_s": round((a[1] - b[1]) / 1e3, 2),
                    "gc_s": round((a[2] - b[2]) / 1e3, 2),
                    "tasks": a[3] - b[3],
                    "shuffle_mb": round((a[4] - b[4]) / 1e6, 1),
                    "retried": len(m.retried_stages),
                    "steal_s": round((ha["steal"] - hb["steal"]) / _HZ, 2),
                    "box_user_s": round((ha["user"] - hb["user"]) / _HZ, 2),
                    "box_sys_s": round(
                        (ha["system"] - hb["system"]) / _HZ, 2
                    ),
                    "box_idle_s": round((ha["idle"] - hb["idle"]) / _HZ, 2),
                    "java_utime_s": round(
                        (ha["java_utime"] - hb["java_utime"]) / _HZ, 2
                    ),
                    "java_stime_s": round(
                        (ha["java_stime"] - hb["java_stime"]) / _HZ, 2
                    ),
                }
            ),
            flush=True,
        )


def make_ballast(spark, frac: float):
    """Cache a frame sized ~frac x the unified-memory region and keep it
    referenced so nothing can reclaim it without eviction."""
    sc = spark.sparkContext
    status = sc._jsc.sc().getExecutorMemoryStatus()
    # local mode: one entry; _2()._1() = max storage+execution bytes free
    entry = status.iterator().next()._2()
    max_mem = entry._1()
    target = int(max_mem * frac)
    # ~128 bytes/row cached (long + 100-char string, deserialized)
    rows = max(1, target // 128)
    df = (
        spark.range(rows)
        .selectExpr("id", "repeat(uuid(), 3) AS pad")
        .persist()
    )
    n = df.count()
    print(
        f"# ballast: {n} rows targeting {target >> 20} MiB "
        f"(unified region {max_mem >> 20} MiB)",
        file=sys.stderr,
        flush=True,
    )
    return df


def make_ckpt_residue(spark, sf_dir: str, n: int):
    """Construct n superseded localCheckpoint sets without draining —
    the r11 residue class."""
    from mergeextractor_spark.registry import load_all

    q = load_all()["agg_rfm_segmentation"]  # checkpoint-per-construction key
    keep = []
    for _ in range(n):
        keep.append(q.spark(spark, sf_dir))  # eager=checkpoints at construct
    return keep


def monitor(spark, key: str, sf_dir: str, minutes: float) -> None:
    """Long-running catcher for the intermittent mode: every iteration
    times (a) the constant-work pure-CPU probe and (b) one key sample,
    each bracketed by host counters.  When the degraded window arrives,
    the steal/user/sys split adjudicates it in one line."""
    from mergeextractor_spark.registry import load_all

    q = load_all()[key]
    m = Metrics(spark)
    df = q.spark(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()  # warm
    end = time.time() + minutes * 60
    i = 0
    while time.time() < end:
        hb = host_counters()
        t0 = time.time()
        spark.range(200_000_000, numPartitions=32).selectExpr(
            "sum(id % 1000) AS s"
        ).collect()
        probe = time.time() - t0
        b = m.snapshot()
        hm = host_counters()
        t0 = time.time()
        df = q.spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        a = m.snapshot()
        ha = host_counters()
        print(
            json.dumps(
                {
                    "t": round(time.time()),
                    "i": i,
                    "probe_s": round(probe, 2),
                    "probe_steal_s": round((hm["steal"] - hb["steal"]) / _HZ, 2),
                    "probe_java_u": round(
                        (hm["java_utime"] - hb["java_utime"]) / _HZ, 2
                    ),
                    "wall_s": round(wall, 2),
                    "cpu_s": round((a[0] - b[0]) / 1e9, 2),
                    "gc_s": round((a[2] - b[2]) / 1e3, 2),
                    "tasks": a[3] - b[3],
                    "steal_s": round((ha["steal"] - hm["steal"]) / _HZ, 2),
                    "box_user_s": round((ha["user"] - hm["user"]) / _HZ, 2),
                    "box_sys_s": round((ha["system"] - hm["system"]) / _HZ, 2),
                    "box_idle_s": round((ha["idle"] - hm["idle"]) / _HZ, 2),
                    "java_u": round(
                        (ha["java_utime"] - hm["java_utime"]) / _HZ, 2
                    ),
                    "java_s": round(
                        (ha["java_stime"] - hm["java_stime"]) / _HZ, 2
                    ),
                },
                separators=(",", ":"),
            ),
            flush=True,
        )
        i += 1
        time.sleep(10)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenario", default="baseline")
    ap.add_argument("--key", default="agg_source_overlap")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--samples", type=int, default=4)
    ap.add_argument("--minutes", type=float, default=45)
    ap.add_argument(
        "--pretouch",
        action="store_true",
        help="fixed pre-touched heap (Xms=Xmx=12g, AlwaysPreTouch): pages "
        "faulted once at startup and never released, so free-page "
        "reporting cannot discard them — the candidate thrash fix",
    )
    args = ap.parse_args()

    from mergeextractor_spark.session import get_spark

    conf = {
        "spark.ui.enabled": "true",
        "spark.ui.retainedStages": "3000",
        "spark.ui.retainedJobs": "300",
    }
    scen = args.scenario
    if scen == "lowmem":
        conf["spark.memory.fraction"] = "0.08"
    if args.pretouch:
        conf["spark.driver.memory"] = "12g"
        conf["spark.driver.extraJavaOptions"] = (
            "-Xms12g -XX:+AlwaysPreTouch"
        )
    t0 = time.time()
    spark = get_spark(f"thrash_probe_{scen}", extra_conf=conf)
    spark.range(1).count()
    print(
        f"# scenario={scen} key={args.key} sf={args.sf} "
        f"pretouch={args.pretouch} startup_s={time.time() - t0:.1f}",
        flush=True,
    )

    holders = []
    if scen.startswith("ballast="):
        holders.append(make_ballast(spark, float(scen.split("=", 1)[1])))
    elif scen.startswith("ckpt="):
        holders.extend(
            make_ckpt_residue(spark, args.sf, int(scen.split("=", 1)[1]))
        )
    elif scen == "heapfill":
        for i in range(40):
            d = spark.range(2_000_000).selectExpr(
                "id", "md5(cast(id as string)) AS h"
            ).persist()
            d.count()
            d.unpersist(blocking=False)  # dead blocks await ContextCleaner

    if scen == "monitor":
        monitor(spark, args.key, args.sf, args.minutes)
    else:
        run_block(
            spark,
            args.key,
            args.sf,
            args.samples,
            drain=(scen == "baseline"),
        )


if __name__ == "__main__":
    main()
