"""Round-5 controller validation: re-run the bench bqp dual rows with
the ramp-phase deep-solve trigger (config.ramp_deep_after) enabled, to
confirm the flagship q=60 / q=80 trajectories did not regress before
the end-of-round bench.  Mirrors bench.py's bench_bqp_dual exactly
(same instance files, p_bucket, tcg32, line_search)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

DATA = os.environ.get("BENCH_DATA_DIR", "/root/reference/data")


def instance(q):
    fq = os.path.join(DATA, f"bqp_Q_{q}_1.txt")
    if os.path.exists(fq):
        Q = np.loadtxt(fq, delimiter=",")
        e = np.loadtxt(os.path.join(DATA, f"bqp_e_{q}_1.txt"),
                       delimiter=",")
    else:
        rng = np.random.default_rng(1)
        Q = rng.standard_normal((q, q))
        Q = (Q + Q.T) / 2.0
        e = rng.standard_normal(q)
    return Q, e


def main():
    from manisdp_tpu.solvers.dual_unitdiag import solve_bqp_sos_dual
    q = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    p_bucket = int(sys.argv[2]) if len(sys.argv) > 2 else \
        (192 if q == 60 else 128)
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    Q, e = instance(q)
    kw = dict(line_search=True, verbose=2, inner_dtype="tcg32",
              p_bucket=p_bucket)
    for r in range(runs):
        t0 = time.time()
        res = solve_bqp_sos_dual(Q, e, q, **kw)
        wall = time.time() - t0
        print(f"RUN{r} q={q} status={res.status} eta={res.eta:.3e} "
              f"obj={res.obj:.6f} solver_s={res.time:.1f} "
              f"wall_s={wall:.1f} outers={res.iterations} "
              f"rtr={res.rtr_iters} hv={res.hess_calls}", flush=True)
        import json
        print(json.dumps({k: round(v, 2)
                          for k, v in res.timers.items()}), flush=True)


if __name__ == "__main__":
    main()
