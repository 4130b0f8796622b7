#!/usr/bin/env python
"""Benchmark harness: Gset MaxCut wall-clock to KKT<=1e-8 + RTR iters/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no Gset timings; the closest published
numbers are Wang-Hu (J. Sci. Comput. 2025, arXiv:2303.01722) Table
"Gset" where ManiSDP (MATLAB+Manopt, desktop CPU) solves G1-class
instances (n=800) in roughly 2-4 seconds at tol 1e-8.  We use 3.0 s as
the nominal MATLAB baseline for G1 and report vs_baseline =
baseline_time / our_time (>1 means faster than the reference).
"""

import json
import os
import sys
import time

GRAPH = os.environ.get("BENCH_GRAPH", "G1")
GSET = os.environ.get(
    "BENCH_GSET_DIR", "/root/reference/data/Gset")
# G1: ~3 s in the published MATLAB tables (desktop CPU, tol 1e-8).
# G67: no published number; estimated >=1500 s for MATLAB+Manopt from
# the per-outer-iteration full eig(S) at n=10^4 (~60-100 s each, ~15+
# outer iterations) plus RTR time.  Treat vs_baseline for G67 as an
# estimate until a measured MATLAB run exists.
BASELINE_SECONDS = {"G1": 3.0, "G67": 1500.0}


def main():
    from manisdp_tpu import solve_maxcut_unitdiag
    from manisdp_tpu.frontends.gset import maxcut_cost

    path = os.path.join(GSET, f"{GRAPH}.txt")
    C = maxcut_cost(path)

    # Warm-up solve: trigger all XLA compilation (cached for the timed run).
    solve_maxcut_unitdiag(C, p0=40, verbose=False)

    t0 = time.time()
    res = solve_maxcut_unitdiag(C, p0=40, verbose=False)
    elapsed = time.time() - t0

    baseline = BASELINE_SECONDS.get(GRAPH, float("nan"))
    out = {
        "metric": f"maxcut_{GRAPH}_wallclock_to_kkt1e-8",
        "value": round(elapsed, 4),
        "unit": "s",
        "vs_baseline": round(baseline / elapsed, 3) if baseline == baseline
        else None,
        "extra": {
            "obj": res.obj,
            "dinf": res.dinf,
            "status": res.status,
            "outer_iters": res.iterations,
            "rtr_iters": res.rtr_iters,
            "hess_calls": res.hess_calls,
            "rtr_iters_per_s": round(res.rtr_iters / elapsed, 2),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
