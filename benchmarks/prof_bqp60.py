"""Profile the bqp q=60 SOS-dual solve per-phase / per-outer on TPU.

Round-4 target: VERDICT item 1 — 592 s warm vs MATLAB's measured 134 s
(/root/reference/data/dual.txt:16).  This prints verbose=2 phase deltas
plus per-outer tCG Hv counts so the 25-38 s mid-run iterations can be
attributed (rtr vs cert vs stats).

Usage:  python -u benchmarks/prof_bqp60.py [max_outer] [extra k=v ...]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from manisdp_tpu.frontends.sos import assemble_bqpsos
from manisdp_tpu.solvers.dual_unitdiag import solve_dual_unitdiag

DATA = "/root/reference/data"


def main():
    max_outer = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    extra = {}
    for kv in sys.argv[2:]:
        k, v = kv.split("=", 1)
        try:
            extra[k] = json.loads(v)
        except json.JSONDecodeError:
            extra[k] = v
    q = 60
    t0 = time.time()
    Q = np.loadtxt(os.path.join(DATA, f"bqp_Q_{q}_1.txt"), delimiter=",")
    e = np.loadtxt(os.path.join(DATA, f"bqp_e_{q}_1.txt"), delimiter=",")
    use_sym = extra.pop("op", None) == "sym"
    kw = dict(line_search=True, verbose=2, inner_dtype="tcg32",
              p_bucket=64, max_outer=max_outer)
    kw.update(extra)
    if use_sym:
        from manisdp_tpu.solvers.dual_unitdiag import solve_bqp_sos_dual
        print(f"tensor path: setup at t={time.time() - t0:.1f}s",
              flush=True)
        res = solve_bqp_sos_dual(Q, e, q, **kw)
        obj_full = res.obj
    else:
        A, b, c, mb, f, dAAt = assemble_bqpsos(Q, e, q)
        print(f"assembly: {time.time() - t0:.1f}s  n={mb} m={A.shape[0]} "
              f"nnz={A.nnz}", flush=True)
        maxb = np.max(np.abs(b))
        kw.update(dict(f=f, dAAt=dAAt))
        res = solve_dual_unitdiag(A, b / maxb, c, mb, **kw)
        obj_full = res.obj * maxb
    print(f"DONE status={res.status} eta={res.eta:.3e} time={res.time:.1f}s "
          f"obj={obj_full:.6f}", flush=True)
    print("timers:", json.dumps({k: round(v, 2)
                                 for k, v in res.timers.items()}), flush=True)
    for h in res.history:
        print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                          for k, v in h.items()}), flush=True)


if __name__ == "__main__":
    main()
