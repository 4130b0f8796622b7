"""Measure the candidate implementations of each AL hot op at the mc
n=4000 shape (nnzP = 2.6M, p = 16): factored gathers vs dense scatters
vs MXU matmuls — picks the per-op winner for the hybrid operator."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from manisdp_tpu.frontends.workloads import matrix_completion
from manisdp_tpu.ops.sparse import ConstraintOp

data, _ = matrix_completion(2000, 2000, rank=10, m_samples=400 * 2 * 2000,
                            seed=3)
op = ConstraintOp.build(data.At, data.b, data.c, data.K.s)
n, m, p = op.n, op.m, 16
print(f"n={n} m={m} nnzA={op.nnz} nnzP={op.pat.nnz}", flush=True)

rs = np.random.RandomState(0)
Y = jnp.asarray(rs.randn(p, n))
U = jnp.asarray(rs.randn(p, n))
w = jnp.asarray(rs.randn(m))
vals = jnp.asarray(rs.randn(op.pat.nnz))

# sorted linear indices of the pattern (sorted by (j, i))
lin = np.asarray(op.pat.j).astype(np.int64) * n + np.asarray(op.pat.i)
assert np.all(np.diff(lin) > 0)
lin = jnp.asarray(lin)


def timed(tag, fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    print(f"{tag}: {(time.time() - t0) / reps * 1e3:.1f} ms", flush=True)
    return out


# ---- pair dots e_P ----
timed("pair_dots factored (2x gather (nnzP,p))",
      jax.jit(lambda Y, U: op.pattern_pair_dots(Y, U)), Y, U)
timed("pair_dots dense Gram + scalar gather",
      jax.jit(lambda Y, U: (Y.T @ U)[op.pat.i, op.pat.j]), Y, U)

# ---- adjoint ----
timed("adjoint factored (segment by a2p)",
      jax.jit(lambda w: op.adjoint_on_pattern(w)), w)
timed("adjoint dense .at[i,j].add",
      jax.jit(lambda w: jnp.zeros((n, n)).at[op.i, op.j].add(
          op.v * jnp.take(w, op.k))), w)
timed("adjoint flat sorted segment_sum -> (n,n)",
      jax.jit(lambda vals: jax.ops.segment_sum(
          vals, lin, num_segments=n * n,
          indices_are_sorted=True).reshape(n, n)), vals)

# ---- matmat Y @ mat(vals) ----
timed("matmat factored scatter_cols",
      jax.jit(lambda Y, vals: op.matmat_pattern(Y, vals)), Y, vals)


@jax.jit
def matmat_dense(Y, vals):
    ES = jax.ops.segment_sum(vals, lin, num_segments=n * n,
                             indices_are_sorted=True).reshape(n, n)
    return Y @ ES


timed("matmat dense-scatter + MXU", matmat_dense, Y, vals)

# ---- matvec (cert) ----
V = jnp.asarray(rs.randn(n, 12))
timed("matvec factored", jax.jit(lambda V, vals: op.matvec_pattern(V, vals)),
      V, vals)


@jax.jit
def matvec_dense(V, vals):
    ES = jax.ops.segment_sum(vals, lin, num_segments=n * n,
                             indices_are_sorted=True).reshape(n, n)
    return ES @ V


timed("matvec dense-scatter + MXU", matvec_dense, V, vals)

# ---- apply (forward) ----
timed("apply factored (from e)", jax.jit(lambda e: op.apply_from_e(e)), vals)

# ---- full Hv chains ----
from manisdp_tpu.solvers.primal_al import VARIANTS, _make_problem

prob_sparse, _ = _make_problem(VARIANTS["general"])
params_s = dict(op=op, y=w, sigma=jnp.float64(0.1))
dop = op.to_dense_op()
params_d = dict(op=dop, y=w, sigma=jnp.float64(0.1))


def hv_chain(problem, params):
    def f(Y, U):
        fx, aux = problem.cost(Y, params)
        g, gaux = problem.grad(Y, params, aux)
        def body(i, Uc):
            H = problem.hess(Y, Uc, params, aux, gaux)
            return H / jnp.sqrt(jnp.sum(H * H))
        return jax.lax.fori_loop(0, 20, body, U)
    return jax.jit(f)


timed("20x Hv, factored op", hv_chain(prob_sparse, params_s), Y, U, reps=2)
timed("20x Hv, dense op", hv_chain(prob_sparse, params_d), Y, U, reps=2)
