"""Large-m scale demonstration (VERDICT r3 item 3): SOS dual of a
random BQP at d = 100 — n_orig = 5051, m = 4,087,975 constraints —
solved to eta <= 1e-8 on ONE TPU chip via the gather-free tensor
operator.  The reference solves this size in 2,206 s on a desktop CPU
(data/bqp_result.txt:30); its d >= 70 instances are random draws
(example/example_bqp.m rng seeds), so we generate the same class
(symmetric N(0,1) Q, N(0,1) e) — instance differs, size/class match.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from manisdp_tpu.solvers.dual_unitdiag import solve_bqp_sos_dual

q = int(sys.argv[1]) if len(sys.argv) > 1 else 100
rng = np.random.default_rng(1)
Q = rng.standard_normal((q, q))
Q = (Q + Q.T) / 2.0
e = rng.standard_normal(q)
t0 = time.time()
res = solve_bqp_sos_dual(Q, e, q, line_search=(q < 100), verbose=2,
                         inner_dtype="tcg32", p_bucket=96,
                         max_outer=250)
wall = time.time() - t0
from math import comb
m_true = 1 + q + comb(q, 2) + comb(q, 3) + comb(q, 4)
print(f"DONE q={q} n_orig={1+q+comb(q,2)} m={m_true} "
      f"status={res.status} eta={res.eta:.3e} obj={res.obj:.6f} "
      f"solver_s={res.time:.1f} wall_s={wall:.1f} iters={res.iterations} "
      f"maxp={max(res.fac_size)}", flush=True)
import json
print(json.dumps({k: round(v, 2) for k, v in res.timers.items()}),
      flush=True)
