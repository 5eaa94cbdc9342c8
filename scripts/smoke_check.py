"""TPU smoke checker (VERDICT r4 next-step #8): compare the bench.py
artifacts against recorded expected ranges so TPU default flips stop
depending on unrepeatable chain archaeology.

Run `python bench.py` (one process, ~15 min incl. remote compiles),
then `python scripts/smoke_check.py`.  Ranges live in
scripts/smoke_expected.json (committed); they are deliberately wide —
the tunneled pool has ±10% session-to-session variance (CLAUDE.md,
round-3 lesson) — so a FAIL means a real regression, not noise.
Update the ranges (and say why in the commit) when a default flip
moves a number on purpose.
"""

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
EXPECTED = os.path.join(HERE, "smoke_expected.json")


def main():
    with open(EXPECTED) as f:
        expected = json.load(f)
    failures = 0
    for name, spec in expected.items():
        path = os.path.join(REPO, spec["file"])
        if not os.path.exists(path):
            print(f"MISS  {name}: {spec['file']} not found (run bench.py)")
            failures += 1
            continue
        with open(path) as f:
            data = json.load(f)
        val = data.get(spec.get("key", "value"))
        lo, hi = spec["range"]
        ok = val is not None and lo <= val <= hi
        status = "PASS" if ok else "FAIL"
        if not ok:
            failures += 1
        print(f"{status}  {name}: {val} {spec.get('unit', '')} "
              f"(expected [{lo}, {hi}])")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
