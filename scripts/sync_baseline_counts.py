#!/usr/bin/env python
"""Regenerate machine-derived counts embedded in BASELINE.md.

The round-3 review flagged a hand-synced pytest count drifting from the
real suite size; this derives it from pytest's own collector instead.
Run after adding tests: python scripts/sync_baseline_counts.py
"""

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q", "tests/"],
        cwd=REPO, capture_output=True, text=True)
    m = re.search(r"(\d+) tests collected", out.stdout)
    if not m:
        raise SystemExit(f"could not parse pytest collector output:\n"
                         f"{out.stdout[-2000:]}")
    n = int(m.group(1))
    path = os.path.join(REPO, "BASELINE.md")
    with open(path) as f:
        text = f.read()
    new = re.sub(r"\d+ pytest green", f"{n} pytest green", text)
    with open(path, "w") as f:
        f.write(new)
    print(f"BASELINE.md: {n} pytest green")


if __name__ == "__main__":
    main()
