"""60-second head-to-head (VERDICT r4 item 8): the reference's published
numbers are 10-core/60-s per instance (benchmarks/spp.csv bx-0.2-10c-60s
columns); this runs the same framing live — the reference binary on ALL
host CPUs vs baryonyx_tpu on one chip, 60 s internal budget each, on the
largest generated scp/spp instances (the r5 battery's big tier).

Appends rows to bench/h2h.csv (reference benchmark-CSV protocol) and
writes H2H60_r05.json.

Usage: python scripts/h2h60.py [--budget 60]
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
OUT = os.path.join(REPO, "bench", "battery")


def ref_run(lp, budget):
    try:
        r = subprocess.run(
            [REF_BIN, "--optimize", "-q", "-p", f"time-limit:{budget}", lp],
            capture_output=True, text=True, timeout=budget * 3 + 180,
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
        cap = budget * 4 + (1800 if attempt == 0 else 900)
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
    ap.add_argument("--budget", type=float, default=60.0)
    args = ap.parse_args()

    from baryonyx_tpu.generators import (
        random_set_cover_lp,
        random_set_partition_lp,
        telebus_crew_lp,
    )

    insts = [
        ("scpnrg1000x10000", random_set_cover_lp(1000, 10000, 0.005, seed=1)),
        ("scpnrh1000x10000", random_set_cover_lp(1000, 10000, 0.05, seed=2)),
        ("sppaa800", random_set_partition_lp(800, 260, 4, (1, 100), 12000, seed=1)),
        ("tele1700", telebus_crew_lp(1700, 30, 4, seed=1)),
    ]
    os.makedirs(OUT, exist_ok=True)
    rows = []
    for name, text in insts:
        lp = os.path.join(OUT, f"{name}.lp")
        if not os.path.exists(lp):
            with open(lp, "w") as fh:
                fh.write(text)
        t0 = time.perf_counter()
        rv = ref_run(lp, args.budget)
        t_r = time.perf_counter() - t0
        t0 = time.perf_counter()
        ov = our_run(lp, args.budget)
        t_o = time.perf_counter() - t0
        rows.append({"instance": name, "reference": rv, "baryonyx_tpu": ov,
                     "ref_wall_s": round(t_r, 1), "ours_wall_s": round(t_o, 1)})
        print(json.dumps(rows[-1]), flush=True)

    result = {
        "budget_s": args.budget,
        "host_cpus": os.cpu_count(),
        "framing": "reference native configuration: all host CPUs, "
                   f"{int(args.budget)}s internal budget (matches the "
                   "published bx-0.2-10c-60s columns); ours: one TPU chip, "
                   "same internal budget",
        "rows": rows,
    }
    with open(os.path.join(REPO, "H2H60_r05.json"), "w") as fh:
        json.dump(result, fh, indent=1)

    # append to the reference-protocol CSV
    csv_path = os.path.join(REPO, "bench", "h2h.csv")
    ncpu = os.cpu_count()
    header = f"file,status,bxref-{ncpu}c-{int(args.budget)}s,bxtpu-1chip-{int(args.budget)}s"
    lines = [header]
    for r in rows:
        vals = [v for v in (r["reference"], r["baryonyx_tpu"]) if v is not None]
        best = min(vals) if vals else None
        lines.append(",".join([
            r["instance"],
            "inf" if best is None else str(best),
            "inf" if r["reference"] is None else str(r["reference"]),
            "inf" if r["baryonyx_tpu"] is None else str(r["baryonyx_tpu"]),
        ]))
    with open(os.path.join(REPO, "bench", "h2h60.csv"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(json.dumps({"done": len(rows)}))


if __name__ == "__main__":
    main()
