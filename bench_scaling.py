#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule's two-cluster criterion.

No real cluster exists in this sandbox, so the N vs 4N executor comparison
is evidenced by running the SAME job (bench.py, fresh JVM each) at
local[N] and local[4N] on the SAME input, and reporting throughput at both
plus efficiency = throughput(4N) / (4 × throughput(N)).

Writes BENCH/BASELINE.md. Usage:
    python bench_scaling.py [N] [sf_dir]      # default N=8 → 8 vs 32
"""

import json
import os
import subprocess
import sys
import datetime

REPO = os.path.dirname(os.path.abspath(__file__))


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True, check=True)
    line = [ln for ln in out.stdout.strip().splitlines()
            if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lo = run_bench(n, sf_dir)
    hi = run_bench(4 * n, sf_dir)

    rows = []
    phase_keys = {
        "index build (documents table)": "docs_per_sec_build",
        "index build (synthetic 30k html)": "docs_per_sec_build_synth",
        "batch query exact (drqa)": "qps_exact",
        "batch query WAND (drqa)": "qps_wand",
        "batch query exact (bm25)": "qps_bm25",
    }
    for label, key in phase_keys.items():
        a = lo["throughput"][key]
        b = hi["throughput"][key]
        eff = b / (4.0 * a)
        rows.append((label, a, b, eff))

    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds")
    md = [
        "# BENCH/BASELINE — throughput & scaling efficiency",
        "",
        f"Generated {stamp} by `bench_scaling.py` on `{sf_dir}`.",
        "",
        "Two-cluster-size criterion evidenced by parallelism levels in this",
        f"sandbox (no real cluster): the same job at `local[{n}]` (N) vs",
        f"`local[{4*n}]` (4N) on identical input, fresh JVM each run.",
        "Efficiency = throughput(4N) / (4 × throughput(N)). Note local-mode",
        "4N shares one JVM/heap, so these numbers UNDER-state multi-executor",
        "scaling (shared memory bandwidth + GC); the partition counts and",
        "shuffle structure are the cluster-relevant properties.",
        "",
        f"| phase | unit | local[{n}] | local[{4*n}] | scaling efficiency |",
        "|---|---|---|---|---|",
    ]
    for label, a, b, eff in rows:
        unit = "docs/s" if "build" in label else "q/s"
        md.append(f"| {label} | {unit} | {a:,.1f} | {b:,.1f} | {eff:.2f} |")
    md += [
        "",
        "## Phase wall-times (sec)",
        "",
        f"| phase | local[{n}] | local[{4*n}] |",
        "|---|---|---|",
    ]
    for k in lo["queries"]:
        md.append(f"| {k} | {lo['queries'][k]} | {hi['queries'][k]} |")
    md += ["", "## Raw JSON", "",
           f"```json\n{json.dumps(lo)}\n{json.dumps(hi)}\n```", ""]

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(out_path, "w") as f:
        f.write("\n".join(md))
    print(f"wrote {out_path}")
    for label, a, b, eff in rows:
        print(f"{label}: {a} -> {b}  eff={eff:.2f}")


if __name__ == "__main__":
    main()
