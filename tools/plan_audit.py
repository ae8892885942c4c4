"""Whole-contract plan red-flag audit (r14): build every registered
key's DataFrame (skipping eager keys' construction side effects is not
possible — they run; at sf0.001 that is cheap) and scan its FORMATTED
physical plan for the scale red flags the optimization guide names:

  - BatchEvalPython / ArrowEvalPython duplicated for one UDF (guide §4.4)
  - CartesianProduct / BroadcastNestedLoopJoin (accidental cross joins;
    known-intentional keys are allowlisted with the reason)
  - data-sized single-partition windows ("Window" whose child is an
    Exchange SinglePartition over a non-result-sized frame is not
    detectable from text alone, so report every SinglePartition exchange
    and allowlist the result-sized ones)
  - ObjectHashAggregate (sort-fallback risk class; report count)

Prints one line per flagged key -> plans_audit_r14.txt.

Usage: python tools/plan_audit.py [--sf /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from mergeextractor_spark.registry import load_all  # noqa: E402
from mergeextractor_spark.session import get_spark  # noqa: E402

# intentional / result-sized exceptions, each with the reason pinned
ALLOW = {
    "CartesianProduct": {
        # nation x region broadcast cross join, 25 x 5 rows (documented)
        "fuzzy_partial_ratio",
    },
    "BroadcastNestedLoopJoin": {
        "fuzzy_partial_ratio",
    },
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()
    spark = get_spark("plan-audit")
    reg = load_all()
    flags: dict[str, list[str]] = {}
    counts = {"BatchEvalPython": 0, "ArrowEvalPython": 0,
              "CartesianProduct": 0, "BroadcastNestedLoopJoin": 0,
              "SinglePartition": 0, "ObjectHashAggregate": 0}
    for key, q in sorted(reg.items()):
        try:
            df = q.spark(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:
            flags.setdefault(key, []).append(f"EXPLAIN-ERROR {type(e).__name__}")
            continue
        row = []
        for pat in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            n = len(re.findall(rf"\b{pat}\b", plan))
            if n and key not in ALLOW.get(pat, set()):
                row.append(f"{pat} x{n}")
                counts[pat] += n
        for pat in ("BatchEvalPython", "ArrowEvalPython"):
            n = len(re.findall(rf"\b{pat}\b", plan))
            counts[pat] += n
            # duplicated evaluation of the SAME udf = the §4.4 trap
            udfs = re.findall(rf"{pat} \[([a-zA-Z0-9_]+)\(", plan)
            dups = {u for u in udfs if udfs.count(u) > 1}
            if dups:
                row.append(f"{pat} duplicated: {sorted(dups)}")
        n = len(re.findall(r"Exchange SinglePartition", plan))
        if n:
            counts["SinglePartition"] += n
            row.append(f"SinglePartition x{n}")
        n = len(re.findall(r"\bObjectHashAggregate\b", plan))
        counts["ObjectHashAggregate"] += n
        if row:
            flags[key] = row
    out = [f"== plan red-flag audit over {len(reg)} keys at {args.sf} =="]
    for key in sorted(flags):
        out.append(f"{key}: {'; '.join(flags[key])}")
    out.append(f"== totals: {counts} ==")
    txt = "\n".join(out)
    print(txt)
    with open(os.path.join(_REPO, "plans_audit_r14.txt"), "w") as f:
        f.write(txt + "\n")


if __name__ == "__main__":
    main()
