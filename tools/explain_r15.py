"""Capture `.explain("formatted")` for a list of keys into
plans/r15/<key>_<tag>.txt — the before/after plan evidence for the
optimization round (judge checks plan claims against these files).

Usage: python tools/explain_r15.py TAG key1,key2,... [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from mergeextractor_spark.registry import load_all  # noqa: E402
from mergeextractor_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("tag")
    ap.add_argument("keys")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    out_dir = os.path.join(_REPO, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    reg = load_all()
    spark = get_spark("explain-r15")
    for key in args.keys.split(","):
        key = key.strip()
        df = reg[key].spark(spark, args.sf)
        plan = (
            df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        )
        path = os.path.join(out_dir, f"{key}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
