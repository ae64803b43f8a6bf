"""Wall-clock artifact (VERDICT r4 item 1): measure COLD and WARM
wall time for a quality run a real user pays, on the real TPU chip.

Protocol
  - instance: scp200x1000 (the head-to-head headline instance).
  - warm: persistent compile cache populated (the repo-local
    .jax_cache_tpu the CLI uses by default) — a fresh process runs the
    CLI with a 5 s internal budget; wall measured end-to-end including
    interpreter start, parse, dispatch and .sol write.
  - cold: same run with BARYONYX_TPU_CACHE pointed at an empty
    directory, so every executable recompiles. NOTE (measured, r5):
    cold time through the axon remote-compile tunnel is dominated by a
    shared compile service whose latency fluctuates 30-300 s for the
    same program — the client-side compile work is ~18 s. On a local
    TPU host cold = client compile only. Three cold runs are recorded
    so the artifact shows the spread, not one lucky/unlucky sample.
  - dispatch-to-first-sweep: the optimize driver's debug marks
    ("state built" / "first dispatch done") from a warm run.

Writes WALLTIME_r05.json at the repo root.

Usage: python scripts/walltime.py [--budget 5] [--cold-runs 3]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_cli(lp: str, budget: float, env_extra=None, verbose=7):
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, "-m", "baryonyx_tpu.cli", "--optimize",
         "-v", str(verbose),
         "-p", f"time-limit:{budget}", "-p", "seed:42", lp],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO,
    )
    wall = time.perf_counter() - t0
    out = r.stdout + r.stderr
    value = None
    m = re.search(r"Objective value: (-?[\d.e+]+)", out)
    if m:
        value = float(m.group(1))
    marks = {}
    m = re.search(r"state built at \+([\d.]+)s", out)
    if m:
        marks["state_built_s"] = float(m.group(1))
    m = re.search(r"first dispatch done at \+([\d.]+)s", out)
    if m:
        marks["first_dispatch_s"] = float(m.group(1))
    return {"wall_s": round(wall, 2), "value": value, **marks}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=float, default=5.0)
    ap.add_argument("--cold-runs", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "WALLTIME_r05.json"))
    args = ap.parse_args()

    from baryonyx_tpu.generators import random_set_cover_lp

    work = tempfile.mkdtemp(prefix="walltime")
    lp = os.path.join(work, "scp200x1000.lp")
    with open(lp, "w") as fh:
        fh.write(random_set_cover_lp(200, 1000, 0.02, seed=41))

    result = {
        "instance": "scp200x1000",
        "budget_s": args.budget,
        "backend": "tpu",
    }

    # ensure warm: one throwaway run populates the default cache
    print("== prewarm ==", flush=True)
    pre = run_cli(lp, 0.2)
    print(json.dumps(pre), flush=True)

    print("== warm runs ==", flush=True)
    warm = [run_cli(lp, args.budget) for _ in range(3)]
    result["warm"] = warm
    print(json.dumps(warm), flush=True)

    print("== cold runs (fresh compile cache each) ==", flush=True)
    cold = []
    for i in range(args.cold_runs):
        cdir = os.path.join(work, f"cold{i}")
        os.makedirs(cdir, exist_ok=True)
        cold.append(run_cli(lp, args.budget,
                            env_extra={"BARYONYX_TPU_CACHE": cdir}))
        print(json.dumps(cold[-1]), flush=True)
    result["cold"] = cold

    ws = sorted(r["wall_s"] for r in warm)
    cs = sorted(r["wall_s"] for r in cold)
    result["warm_median_s"] = ws[len(ws) // 2]
    result["cold_median_s"] = cs[len(cs) // 2]
    result["note"] = (
        "cold is dominated by the shared axon remote-compile service "
        "(fluctuates run to run); client-side compile is the "
        "state_built/first_dispatch spread in the cold rows"
    )
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({"warm_median_s": result["warm_median_s"],
                      "cold_median_s": result["cold_median_s"]}))


if __name__ == "__main__":
    main()
