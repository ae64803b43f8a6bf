"""Z-class QUALITY head-to-head (completes the Z story next to
ZBENCH_r05.json's throughput): general-integer-coefficient
multi-knapsack instances, equal internal budgets, reference binary on
all host CPUs vs baryonyx_tpu on one chip.

Writes ZQUALITY_r05.json.

Usage: python scripts/zquality.py [--budget 10]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_BIN = "/tmp/bxref/build/app/baryonyx-0.5"


def ref_run(lp, budget):
    try:
        r = subprocess.run(
            [REF_BIN, "--optimize", "-q", "-p", f"time-limit:{budget}", lp],
            capture_output=True, text=True, timeout=budget * 3 + 120,
            cwd="/tmp",
        )
    except subprocess.TimeoutExpired:
        return None
    m = re.search(
        r"Best solution found(?: via preprocessor)?: (-?[\d.e+]+)",
        r.stdout + r.stderr,
    )
    return float(m.group(1)) if m else None


def our_run(lp, budget):
    for attempt in range(3):
        cap = budget * 6 + (1800 if attempt == 0 else 900)
        try:
            r = subprocess.run(
                [sys.executable, "-m", "baryonyx_tpu.cli", "--optimize",
                 "-p", f"time-limit:{budget}", lp],
                capture_output=True, text=True, timeout=cap, cwd=REPO,
            )
            out = r.stdout + r.stderr
        except subprocess.TimeoutExpired:
            continue
        if "success" in out:
            m = re.search(r"Objective value: (-?[\d.e+]+)", out)
            return float(m.group(1)) if m else None
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=float, default=10.0)
    args = ap.parse_args()

    from baryonyx_tpu.generators import random_z_multiknapsack_lp

    os.makedirs("/tmp/zq", exist_ok=True)
    insts = [
        ("zknap100x500", random_z_multiknapsack_lp(100, 500, seed=1)),
        ("zknap200x1000", random_z_multiknapsack_lp(200, 1000, seed=2)),
        ("zknap300x1500", random_z_multiknapsack_lp(
            300, 1500, row_len=(10, 30), seed=3)),
    ]
    rows = []
    wins = ties = losses = 0
    for name, text in insts:
        lp = f"/tmp/zq/{name}.lp"
        with open(lp, "w") as fh:
            fh.write(text)
        rv = ref_run(lp, args.budget)
        t0 = time.perf_counter()
        ov = our_run(lp, args.budget)
        wall = time.perf_counter() - t0
        rows.append({"instance": name, "reference": rv, "baryonyx_tpu": ov,
                     "ours_wall_s": round(wall, 1)})
        if rv is not None and ov is not None:
            wins += ov < rv
            ties += ov == rv
            losses += ov > rv
        print(json.dumps(rows[-1]), flush=True)
    out = {"budget_s": args.budget, "host_cpus": os.cpu_count(),
           "rows": rows, "wins": int(wins), "ties": int(ties),
           "losses": int(losses)}
    with open(os.path.join(REPO, "ZQUALITY_r05.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in ("wins", "ties", "losses")}))


if __name__ == "__main__":
    main()
