"""The reference acceptance bar, as a runnable job (VERDICT r2 item 9).

Reference requirements (lib/test/optimize.cpp, lib/test/solve.cpp):
  - all 30 n-queens instances solved in 20 s/instance with the published
    parameter set, objectives compared to the CPLEX 12.7 golden file
    (optimize.cpp:89-166, n-queens/solutions.txt);
  - QAP small4 reaches the exact optimum 790 (optimize.cpp:55-87;
    reference budget 40 s / 2 threads — we keep 40 s);
  - capmo1_direct solves below 1156908 (solve.cpp:195-238).

Runs on whatever backend JAX picks (the TPU via the axon tunnel in this
image; per-shape XLA compiles are excluded from each instance's budget by
the optimizer's warmup, but they do add wall time). Writes
ACCEPTANCE_r{N}.json at the repo root — the per-round record the judge
can diff.

Usage: python scripts/acceptance.py [--round N] [--quick]
  --quick: 3 smallest n-queens only (smoke; the default is all 30)
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF_TEST = "/root/reference/lib/test"

import baryonyx_tpu as bx  # noqa: E402
from baryonyx_tpu.validate import compute_solution, is_valid_solution  # noqa: E402


def make_ctx(time_limit, **kw):
    ctx = bx.make_context(6)
    ctx.parameters.seed = 123456789
    ctx.parameters.time_limit = time_limit
    ctx.parameters.limit = 100000
    for k, v in kw.items():
        setattr(ctx.parameters, k, v)
    return ctx


def load(name):
    with open(os.path.join(REF_TEST, f"{name}.lp")) as fh:
        return bx.parse_lp(fh.read())


def run_nqueens(quick):
    with open(os.path.join(REF_TEST, "n-queens", "solutions.txt")) as fh:
        golden = [float(line) for line in fh if line.strip()]
    sizes = []
    for i in range(len(golden)):
        p = os.path.join(REF_TEST, "n-queens", f"n-queens-problem-{i}.lp")
        sizes.append((os.path.getsize(p), i))
    order = [i for _, i in sorted(sizes)]
    run = order[:3] if quick else order
    out = []
    for i in run:
        p = os.path.join(REF_TEST, "n-queens", f"n-queens-problem-{i}.lp")
        with open(p) as fh:
            pb = bx.parse_lp(fh.read())
        # reference: optimize.cpp:114-130 published parameter set
        ctx = make_ctx(
            20.0, theta=0.5, delta=1.0, kappa_min=0.30, kappa_step=1e-2,
            kappa_max=100.0, alpha=1.0, w=60, pushing_k_factor=0.9,
            pushes_limit=50, pushing_objective_amplifier=10,
            pushing_iteration_limit=10, order=bx.ConstraintOrder.random_sorting,
        )
        t0 = time.monotonic()
        r = bx.optimize(ctx, pb)
        ok = r.status == bx.ResultStatus.success and is_valid_solution(pb, r)
        val = compute_solution(pb, r) if ok else None
        gap = (
            (val - golden[i]) / max(abs(golden[i]), 1.0) if ok else None
        )
        out.append({
            "instance": i, "solved": bool(ok), "objective": val,
            "golden": golden[i], "gap": round(gap, 4) if gap is not None else None,
            "wall_s": round(time.monotonic() - t0, 1),
        })
        print(json.dumps(out[-1]), flush=True)
    solved = sum(1 for o in out if o["solved"])
    gaps = [o["gap"] for o in out if o["gap"] is not None]
    return {
        "instances_run": len(out), "solved": solved,
        "all_solved": solved == len(out),
        "mean_gap_vs_cplex": round(sum(gaps) / len(gaps), 4) if gaps else None,
        "per_instance": out,
    }


def run_qap():
    pb = load("small4")
    ctx = make_ctx(
        40.0, theta=0.5, delta=0.2, kappa_step=1e-3, kappa_max=10.0,
        alpha=0.0, w=20, pushing_k_factor=0.9, pushes_limit=50,
        pushing_objective_amplifier=10, pushing_iteration_limit=50,
    )
    t0 = time.monotonic()
    r = bx.optimize(ctx, pb)
    ok = r.status == bx.ResultStatus.success and is_valid_solution(pb, r)
    val = compute_solution(pb, r) if ok else None
    return {
        "solved": bool(ok), "objective": val, "required": 790.0,
        "exact_optimum": bool(ok and abs(val - 790.0) < 1e-6),
        "wall_s": round(time.monotonic() - t0, 1),
    }


def run_capmo():
    pb = load("capmo1_direct")
    ctx = make_ctx(30.0)
    t0 = time.monotonic()
    r = bx.solve(ctx, pb)
    ok = r.status == bx.ResultStatus.success and is_valid_solution(pb, r)
    val = compute_solution(pb, r) if ok else None
    return {
        "solved": bool(ok), "objective": val, "bound": 1156908,
        "below_bound": bool(ok and val < 1156908),
        "wall_s": round(time.monotonic() - t0, 1),
    }


def reference_qap_cross_check(budget: float = 40.0, seeds=(1, 2, 3)):
    """Run the reference binary (scripts/build_reference.sh output) on
    small4 with the published test parameters, same budget, on THIS host —
    the acceptance bar's 790-in-40s figure comes from the reference
    author's machine, so the artifact records what the reference itself
    achieves here for a fair comparison.

    Note the reference test's kappa_max=10 is silently rejected by
    context_set_solver_parameters (private.cpp:64-70 requires
    kappa_max <= 1), so the defaults (0, 1e-3, 0.6) apply — our
    SolverParameters.validated() replicates that quirk."""
    import re
    import subprocess

    ref = "/tmp/bxref/build/app/baryonyx-0.5"
    if not os.path.exists(ref):
        return {"available": False}
    out = []
    for seed in seeds:
        cmd = [
            ref, "--optimize", "-q", f"-p", f"time-limit:{budget}",
            "-p", "limit:-1", "-p", "theta:0.5", "-p", "delta:0.2",
            "-p", "kappa-step:0.001", "-p", "alpha:0.0", "-p", "w:20",
            "-p", "thread:2", "-p", f"seed:{seed}",
            "-p", "pushes-limit:50", "-p", "pushing-k-factor:0.9",
            "-p", "pushing-objective-amplifier:10",
            "-p", "pushing-iteration-limit:50",
            os.path.join(REF_TEST, "small4.lp"),
        ]
        try:
            r = subprocess.run(
                cmd, capture_output=True, text=True, timeout=budget * 3 + 60
            )
        except subprocess.TimeoutExpired:
            out.append({"seed": seed, "solved": False, "timeout": True})
            continue
        txt = r.stdout + r.stderr
        m = re.search(r"Best solution found.*?([-0-9.]+)", txt)
        rem = re.search(r"Constraint remaining: (\d+)", txt)
        out.append({
            "seed": seed,
            "solved": m is not None,
            "value": float(m.group(1)) if m else None,
            "remaining": int(rem.group(1)) if rem else None,
        })
        print(json.dumps(out[-1]), flush=True)
    return {"available": True, "budget_s": budget, "per_seed": out,
            "any_solved": any(o["solved"] for o in out)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=3)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument(
        "--qap-only", action="store_true",
        help="update only the qap_small4 + reference cross-check sections "
        "of an existing ACCEPTANCE_r{N}.json",
    )
    args = ap.parse_args()

    result = {"backend": None, "quick": args.quick}
    import jax

    result["backend"] = jax.default_backend()
    out_path = os.path.join(REPO, f"ACCEPTANCE_r{args.round:02d}.json")

    if args.qap_only:
        with open(out_path) as fh:
            result = json.load(fh)
        print("== QAP small4 exact optimum ==", flush=True)
        result["qap_small4"] = run_qap()
        print(json.dumps(result["qap_small4"]), flush=True)
        print("== reference binary on this host (same bar) ==", flush=True)
        result["qap_small4_reference_on_this_host"] = (
            reference_qap_cross_check()
        )
        # the loaded artifact may be a partial/interrupted run missing
        # sections — treat absent sections as failing, don't crash after
        # the expensive QAP runs (ADVICE r3)
        result["pass"] = bool(
            result.get("capmo1", {}).get("below_bound", False)
            and result["qap_small4"]["exact_optimum"]
            and result.get("n_queens", {}).get("all_solved", False)
        )
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=1)
        print(f"wrote {out_path}; PASS={result['pass']}")
        return

    print("== capmo1 solve bound ==", flush=True)
    result["capmo1"] = run_capmo()
    print(json.dumps(result["capmo1"]), flush=True)
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)

    print("== QAP small4 exact optimum ==", flush=True)
    result["qap_small4"] = run_qap()
    print(json.dumps(result["qap_small4"]), flush=True)
    result["qap_small4_reference_on_this_host"] = reference_qap_cross_check()
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)

    print("== n-queens golden set ==", flush=True)
    result["n_queens"] = run_nqueens(args.quick)

    result["pass"] = bool(
        result["capmo1"]["below_bound"]
        and result["qap_small4"]["exact_optimum"]
        and result["n_queens"]["all_solved"]
    )
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(f"wrote {out_path}; PASS={result['pass']}")


if __name__ == "__main__":
    main()
