"""Five-suite generated benchmark battery, head-to-head vs the reference
binary (VERDICT r3 item 6; reference protocol:
app/src/benchmark.cpp:614-780, benchmarks/*.csv).

The reference's published suites (scp/spp/csplib022/telebus/spp-wcsp2)
need instance tarballs this image cannot fetch, so each suite is stood in
for by generated instances of the same structural class:

  scp       OR-Library set covering        random_set_cover_lp
  spp       set partitioning               random_set_partition_lp
  nqueens   n-queens regression set        n_queens_lp
  busdriver csplib022 bus-driver SPP       bus_driver_scheduling_lp
  telebus   telebus dial-a-ride crew SPP   telebus_crew_lp

Per suite: write `<name>.lp` files + a CSV (reference column layout),
run the reference binary and our CLI at the SAME internal time budget,
append both as columns via bench/harness.py's format, and write the
`<suite>-stats.csv` rank file. Artifacts land in bench/battery/.

Usage: python scripts/bench_battery.py [--budget 10] [--suites scp,spp,...]
       [--skip-ref] [--skip-ours]
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

from baryonyx_tpu.generators import (  # noqa: E402
    bus_driver_scheduling_lp,
    n_queens_lp,
    random_set_cover_lp,
    random_set_partition_lp,
    telebus_crew_lp,
)


def suites():
    return {
        "scp": [
            (f"scp{m}x{n}s{s}", random_set_cover_lp(m, n, d, seed=s))
            for (m, n, d, s) in [
                (100, 500, 0.04, 1), (200, 1000, 0.02, 2),
                (200, 2000, 0.02, 3), (400, 2000, 0.01, 4),
                (300, 3000, 0.015, 5),
            ]
        ],
        "spp": [
            (f"spp{m}x{c}s{s}",
             random_set_partition_lp(m, m // 3, 4, (1, 100), c, seed=s))
            for (m, c, s) in [
                (60, 150, 1), (90, 240, 2), (120, 320, 3), (150, 400, 4),
            ]
        ],
        "nqueens": [
            (f"nq{n}", n_queens_lp(n)) for n in (12, 20, 30, 40)
        ],
        "busdriver": [
            (f"bus{p}s{s}", bus_driver_scheduling_lp(p, seed=s))
            for (p, s) in [(60, 1), (90, 2), (120, 3), (150, 4)]
        ],
        "telebus": [
            (f"tele{r}s{s}", telebus_crew_lp(r, seed=s))
            for (r, s) in [(60, 1), (90, 2), (120, 3), (150, 4)]
        ],
    }


def ref_run(lp: str, budget: float):
    try:
        r = subprocess.run(
            [REF_BIN, "--optimize", "-q",
             "-p", f"time-limit:{budget}", lp],
            capture_output=True, text=True, timeout=budget * 3 + 120,
        )
    except subprocess.TimeoutExpired:
        return None
    out = r.stdout + r.stderr
    m = re.search(
        r"Best solution found(?: via preprocessor)?: (-?[\d.e+]+)", out
    )
    return float(m.group(1)) if m else None


def our_run(lp: str, budget: float, retries: int = 2):
    # wedged-relay sessions are killed and retried in a fresh process
    # (see scripts/head_to_head.py:our_run)
    for attempt in range(retries + 1):
        cap = budget * 6 + (2400 if attempt == 0 else 900)
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
    ap.add_argument("--suites", default="scp,spp,nqueens,busdriver,telebus")
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--skip-ours", action="store_true")
    args = ap.parse_args()

    os.makedirs(OUT, exist_ok=True)
    from baryonyx_tpu.bench.harness import BenchData

    summary = {"budget_s": args.budget, "suites": {}}
    for suite in args.suites.split(","):
        insts = suites()[suite]
        csv_path = os.path.join(OUT, f"{suite}.csv")
        ref_col = f"bxref-{os.cpu_count()}c-{int(args.budget)}s"
        our_col = f"bxtpu-1chip-{int(args.budget)}s"
        rows = []
        wins = ties = losses = 0
        for name, text in insts:
            lp = os.path.join(OUT, f"{name}.lp")
            with open(lp, "w") as fh:
                fh.write(text)
            rv = None if args.skip_ref else ref_run(lp, args.budget)
            ov = None if args.skip_ours else our_run(lp, args.budget)
            best = min([v for v in (rv, ov) if v is not None], default=None)
            rows.append([
                name,
                "inf" if best is None else str(best),
                "inf" if rv is None else str(rv),
                "inf" if ov is None else str(ov),
            ])
            if rv is not None and ov is not None:
                if ov < rv:
                    wins += 1
                elif ov == rv:
                    ties += 1
                else:
                    losses += 1
            print(f"[{suite}] {name}: ref={rv} ours={ov}", flush=True)
        data = BenchData(["file", "status", ref_col, our_col], rows)
        data.save(csv_path)
        # rank/stats file via the library harness
        import baryonyx_tpu as bx
        from baryonyx_tpu.bench.harness import _save_stats

        _save_stats(bx.make_context(0), data, csv_path)
        summary["suites"][suite] = {
            "instances": len(insts), "wins": wins, "ties": ties,
            "losses": losses,
        }
        print(json.dumps({suite: summary["suites"][suite]}), flush=True)

    with open(os.path.join(OUT, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    better = sum(
        1 for s in summary["suites"].values() if s["losses"] <= s["wins"]
    )
    print(f"suites where ours >= reference: {better}/{len(summary['suites'])}")


if __name__ == "__main__":
    main()
