"""Trajectory comparison: original-basis vs expanded-tensor SOS dual at q=30."""
import numpy as np, jax, time, sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from manisdp_tpu.frontends.sos import assemble_bqpsos
from manisdp_tpu.solvers.dual_unitdiag import solve_dual_unitdiag, solve_bqp_sos_dual
DATA = "/root/reference/data"
q = int(sys.argv[1]) if len(sys.argv) > 1 else 30
Q = np.loadtxt(f"{DATA}/bqp_Q_{q}_1.txt", delimiter=",")
e = np.loadtxt(f"{DATA}/bqp_e_{q}_1.txt", delimiter=",")
A, b, c, mb, f, dAAt = assemble_bqpsos(Q, e, q)
maxb = np.max(np.abs(b))
t0 = time.time()
res = solve_dual_unitdiag(A, b/maxb, c, mb, f=f, dAAt=dAAt, line_search=True, verbose=False, tol=1e-8)
t_orig = time.time()-t0
t0 = time.time()
r2 = solve_bqp_sos_dual(Q, e, q, line_search=True, verbose=False, tol=1e-8, max_outer=120)
t_exp = time.time()-t0
print(f"orig: obj {res.obj*maxb:.8f} eta {res.eta:.1e} iters {res.iterations} maxp {max(res.fac_size)} {t_orig:.0f}s")
print(f"exp : obj {r2.obj:.8f} eta {r2.eta:.1e} iters {r2.iterations} maxp {max(r2.fac_size)} status {r2.status} {t_exp:.0f}s")
for a, bb in zip(res.history, r2.history):
    print(f"it {a['iter']:3d} orig gap {a['gap']:.1e} pinf {a['pinf']:.1e} p {a['p']:3d} | exp gap {bb['gap']:.1e} pinf {bb['pinf']:.1e} p {bb['p']:3d}")
