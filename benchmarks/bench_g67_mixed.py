"""G67 (n=10^4) mixed-precision vs f64 inner-solve measurement on TPU.

VERDICT r1 item 1: measure options.inner_dtype="mixed" (f32 RTR
pre-stage + f64 refinement) at G67 scale; round-1 f64 warm number was
120.6 s (rtr 61.3 / cert 51.7 / rank 0.1).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from manisdp_tpu import solve_maxcut_unitdiag
from manisdp_tpu.frontends.gset import maxcut_cost

C = maxcut_cost("/root/reference/data/Gset/G67.txt")

for mode in ("mixed", "float64"):
    for tag in ("cold", "warm"):
        t0 = time.time()
        res = solve_maxcut_unitdiag(C, p0=40, verbose=True,
                                    inner_dtype=mode)
        print(f"G67 {mode} {tag}: {time.time() - t0:.1f}s "
              f"obj={res.obj:.6f} dinf={res.dinf:.3e} "
              f"status={res.status} hess={res.hess_calls} "
              f"timers={json.dumps(res.timers)}", flush=True)
