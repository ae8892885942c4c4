"""Regenerate mergeextractor_spark/_evidence.py from CORRECTNESS_r*.json.

Run once per round after the driver records a new CORRECTNESS file, so the
staleness-ordered canary sampler (registry.canary_keys) sees the latest
evidence rounds.  A key counts as green when its row is hash-green or, for
oracle-less keys, a rows-only pass (err == 'no_oracle' and spark_rows > 0).
"""
from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    last: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        d = json.load(open(p))
        for k, v in d.items():
            green = v.get("hash_match") or (
                v.get("err") == "no_oracle" and (v.get("spark_rows") or 0) > 0
            )
            if green:
                last[k] = max(last.get(k, 0), rnd)
    out = os.path.join(REPO, "mergeextractor_spark", "_evidence.py")
    lines = [
        '"""Driver-evidence staleness map (generated from CORRECTNESS_r01-r%02d).' % max(last.values()),
        "",
        "LAST_GREEN[key] = the most recent driver round whose CORRECTNESS file",
        "records a green row (hash-green, or rows-only-pass for oracle-less",
        "keys) for that key.  Feeds the staleness-ordered canary sampler in",
        "registry.canary_keys (VERDICT r9 item 5): canaries draw",
        "oldest-evidence-first so r2/r3-era greens cannot stay unchecked",
        "behind six rounds of shared-helper churn.  Regenerate per round with",
        "tools/make_evidence_map.py after the driver folds a new CORRECTNESS",
        'file."""',
        "",
        "LAST_GREEN: dict[str, int] = {",
    ]
    for k in sorted(last):
        lines.append(f'    "{k}": {last[k]},')
    lines.append("}")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(last)} keys, max round {max(last.values())}")


if __name__ == "__main__":
    main()
