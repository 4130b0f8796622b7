"""Compile + runtime probe for DeviceCertSolver on TPU.

Minimal repro for the devrr certificate program: dense-carrier matvec
(matrix-completion shape) at n=2000 with deflation, and the no-deflate
dual shape at n=1831.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import manisdp_tpu  # noqa: F401  (cache config)
from manisdp_tpu.ops.eigs_rr import DeviceCertSolver

n = 2000
rs = np.random.RandomState(0)
S = rs.randn(n, n)
S = (S + S.T) / 2
Sd = jnp.asarray(S)
Y = jnp.asarray(rs.randn(8, n))
Ypad = jnp.concatenate([Y, jnp.zeros((40, n))])

solver = DeviceCertSolver(lambda V, ctx: V @ ctx, n, 11, deflate_rows=48)
t0 = time.time()
res = solver.solve(Sd, jax.random.PRNGKey(0), Ypad=Ypad, maxiter=25,
                   tol=1e-10)
print(f"cold solve (compile): {time.time()-t0:.1f}s lam_min="
      f"{float(res.lam_min):.4f}", flush=True)
t0 = time.time()
res = solver.solve(Sd, jax.random.PRNGKey(1), X0=res.neg_vecs, Ypad=Ypad,
                   maxiter=25, tol=1e-10)
print(f"warm solve 25 iters: {time.time()-t0:.2f}s", flush=True)
t0 = time.time()
res = solver.solve(Sd, jax.random.PRNGKey(2), X0=res.neg_vecs, Ypad=Ypad,
                   maxiter=200, tol=1e-12)
print(f"warm solve 200 iters: {time.time()-t0:.2f}s lam_min="
      f"{float(res.lam_min):.6f} ref={np.linalg.eigvalsh(S)[0]:.6f}",
      flush=True)
