"""Recorded multi-host SPMD measurement (VERDICT r3 item 5).

Runs the identical optimize job on the SAME 8-device global CPU mesh
arranged as 1 process x 8 devices and 2 processes x 4 devices
(jax.distributed over loopback — the DCN code path of
parallel/distributed.py), with a fixed sweep budget so chunk boundaries,
population-exchange points and RNG folds are process-count independent.

Records to MULTIHOST_r04.json:
  - per-config objective value / remaining / wall seconds / sweeps/s
  - `invariant`: the two configs returned the SAME objective (the
    multi-process arrangement changes communication, not semantics)
  - `exchange_overhead`: wall ratio 2p/1p (cross-process collective cost)

Mirrors BASELINE.json configs 4-5 in miniature (no pod hardware here).

Usage: python scripts/multihost_measure.py [--out MULTIHOST_r04.json]
  (internal) --worker I --procs N --devs M
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

INSTANCE = dict(m=100, n=400, density=0.04, seed=23)
SEED = 11
SWEEPS = 1200
CHUNK = 100
THREADS = 16  # replicas, 2 per device
POP = 16


def worker(proc_id: int, procs: int, devs: int, port: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devs}"
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    if procs > 1:
        from baryonyx_tpu.parallel.distributed import init_distributed

        init_distributed(
            f"127.0.0.1:{port}", num_processes=procs, process_id=proc_id
        )
        assert jax.process_count() == procs

    import baryonyx_tpu as bx
    from baryonyx_tpu.generators import random_set_cover_lp
    from baryonyx_tpu.validate import compute_solution, is_valid_solution

    pb = bx.parse_lp(
        random_set_cover_lp(
            INSTANCE["m"], INSTANCE["n"], INSTANCE["density"],
            seed=INSTANCE["seed"],
        )
    )
    ctx = bx.make_context(0)
    p = ctx.parameters
    p.seed = SEED
    p.time_limit = 0.0  # sweep-budget mode: deterministic chunking
    p.limit = SWEEPS
    p.chunk_size = CHUNK
    p.thread = THREADS
    p.init_population_size = POP
    t0 = time.perf_counter()
    r = bx.optimize(ctx, pb)
    wall = time.perf_counter() - t0
    ok = r.status == bx.ResultStatus.success and is_valid_solution(pb, r)
    val = compute_solution(pb, r) if ok else None
    print(
        f"MEASURE proc={proc_id} procs={procs} ok={ok} value={val} "
        f"remaining={r.remaining_constraints} wall={wall:.2f}",
        flush=True,
    )


def launch(procs: int, devs: int, port: int):
    ps = []
    for i in range(procs):
        ps.append(
            subprocess.Popen(
                [
                    sys.executable, os.path.abspath(__file__),
                    "--worker", str(i), "--procs", str(procs),
                    "--devs", str(devs), "--port", str(port),
                ],
                cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = [p.communicate(timeout=1800)[0] for p in ps]
    assert all(p.returncode == 0 for p in ps), outs
    recs = []
    for out in outs:
        m = re.search(
            r"MEASURE proc=(\d+) procs=(\d+) ok=(\w+) value=([\d.]+|None) "
            r"remaining=(\d+) wall=([\d.]+)",
            out,
        )
        assert m, out
        recs.append(
            dict(
                proc=int(m.group(1)), ok=m.group(3) == "True",
                value=None if m.group(4) == "None" else float(m.group(4)),
                remaining=int(m.group(5)), wall=float(m.group(6)),
            )
        )
    return recs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "MULTIHOST_r04.json"))
    ap.add_argument("--port", type=int, default=9481)
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--devs", type=int, default=4)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, args.procs, args.devs, args.port)
        return

    result = {
        "instance": INSTANCE, "seed": SEED, "sweeps": SWEEPS,
        "replicas": THREADS, "configs": [],
    }
    for procs, devs in ((1, 8), (2, 4)):
        print(f"== {procs} proc x {devs} devs ==", flush=True)
        recs = launch(procs, devs, args.port + procs)
        wall = max(r["wall"] for r in recs)
        result["configs"].append(
            dict(
                procs=procs, devs=devs,
                value=recs[0]["value"], remaining=recs[0]["remaining"],
                ok=all(r["ok"] for r in recs), wall_s=round(wall, 2),
                sweeps_per_s=round(SWEEPS / wall, 1),
            )
        )
        print(json.dumps(result["configs"][-1]), flush=True)

    c1, c2 = result["configs"]
    result["invariant"] = bool(c1["value"] == c2["value"] and c1["ok"] and c2["ok"])
    result["exchange_overhead"] = (
        round(c2["wall_s"] / c1["wall_s"], 3) if c1["wall_s"] else None
    )
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(f"wrote {args.out}; invariant={result['invariant']}")


if __name__ == "__main__":
    main()
