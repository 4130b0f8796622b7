"""Profile the mc n=2000 workload phases on TPU: entrywise operator
micro-ops, one RTR call, stats, and host-eigh certificate — identifies
where the round-2 228 s went (VERDICT r3 item 1)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from manisdp_tpu.frontends.workloads import matrix_completion
from manisdp_tpu.ops.sparse import ConstraintOp, EntrywiseConstraintOp


def timed(tag, fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    print(f"{tag}: {(time.time() - t0) / reps * 1e3:.2f} ms", flush=True)
    return out


P = 2000
data, _ = matrix_completion(P, P, rank=10, m_samples=400 * 2 * P, seed=3)
n = data.K.s
op = ConstraintOp.build(data.At, data.b, data.c, n)
ew = EntrywiseConstraintOp.detect(op)
dn = op.to_dense_op()
print(f"n={n} m={op.m} nnzA={op.nnz} entrywise={ew is not None}", flush=True)

rs = np.random.RandomState(0)
p_pad = 16
Y = jnp.asarray(rs.randn(p_pad, n))
U = jnp.asarray(rs.randn(p_pad, n))
yvec = jnp.asarray(rs.randn(op.m))
ydense = ew.res_from_mvec(np.asarray(yvec))
sigma = jnp.float64(0.1)


# --- per-op timings: entrywise vs dense-carrier --------------------------
def hv_ew(Y, U, es):
    w = ew.apply_factored(Y, U)
    ayu = ew.adjoint_on_pattern(w)
    return 2.0 * ew.matmat_pattern(U, es) \
        + 4.0 * sigma * ew.matmat_pattern(Y, ayu)


def hv_dn(Y, U, es):
    w = dn.apply_factored(Y, U)
    ayu = dn.adjoint_on_pattern(w)
    return 2.0 * dn.matmat_pattern(U, es) \
        + 4.0 * sigma * dn.matmat_pattern(Y, ayu)


es_ew = jax.jit(lambda y: ew.es_vals(y, 0.1))(ydense)
es_dn = jax.jit(lambda y: dn.es_vals(y, 0.1))(yvec)
timed("hv entrywise f64", jax.jit(hv_ew), Y, U, es_ew, reps=10)
timed("hv dense-carrier f64", jax.jit(hv_dn), Y, U, es_dn, reps=10)
Y32, U32 = Y.astype(jnp.float32), U.astype(jnp.float32)
ew32 = jax.tree_util.tree_map(
    lambda x: x.astype(jnp.float32)
    if jnp.issubdtype(x.dtype, jnp.floating) else x, ew)


def hv_ew32(Y, U, es):
    w = ew32.apply_factored(Y, U)
    ayu = ew32.adjoint_on_pattern(w)
    return 2.0 * ew32.matmat_pattern(U, es) \
        + 4.0 * jnp.float32(0.1) * ew32.matmat_pattern(Y, ayu)


timed("hv entrywise f32", jax.jit(hv_ew32), Y32, U32,
      es_ew.astype(jnp.float32), reps=10)


def cost_ew(Y, y):
    e = ew.pattern_pair_dots(Y)
    cx = ew.dot_pattern(ew.c_pattern, e)
    Axb = ew.apply_from_e(e) - ew.b - y / sigma
    return cx + 0.5 * sigma * ew.dot_res(Axb, Axb)


timed("cost entrywise f64", jax.jit(cost_ew), Y, ydense, reps=10)

# --- one full RTR call at mc budgets -------------------------------------
from manisdp_tpu.core import Problem, TROptions, make_trustregions
from manisdp_tpu.solvers.primal_al import VARIANTS, _make_problem

problem, _ = _make_problem(VARIANTS["general"])
params = dict(op=ew, y=ydense, sigma=sigma)
tr = TROptions(maxiter=8, maxinner=6, tolgradnorm=1e-8,
               tcg_dtype="float32")
solve = jax.jit(make_trustregions(problem, tr))
typ = float(np.sqrt(p_pad * n))
t0 = time.time()
res = jax.block_until_ready(solve(Y, params, typ))
print(f"rtr compile+run: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
res = jax.block_until_ready(solve(Y, params, typ))
print(f"rtr warm (iters={int(res.iters)}, hv={int(res.inner_iters)}): "
      f"{time.time()-t0:.2f}s", flush=True)

# --- stats + host certificate -------------------------------------------
from manisdp_tpu.solvers.primal_al import _make_stats
stats = jax.jit(_make_stats(VARIANTS["general"]))
timed("stats entrywise", lambda: stats(Y, ew, ydense, sigma), reps=5)

sv = jax.jit(lambda y: ew.s_vals(y))(ydense)
sv_h = np.asarray(jax.device_get(sv))
t0 = time.time()
np.linalg.eigh(sv_h)
print(f"host eigh f64 n={n}: {time.time()-t0:.2f}s", flush=True)
t0 = time.time()
np.linalg.eigh(sv_h.astype(np.float32))
print(f"host eigh f32 n={n}: {time.time()-t0:.2f}s", flush=True)
