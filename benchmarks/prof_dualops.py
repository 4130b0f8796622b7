"""Micro-profile the bqp60 dual AL building blocks on TPU — CHAINED.

NOTES.md queue-timing rule: only data-dependent (chained) timings are
real on this runtime.  Every loop below feeds the op's output back into
its input through a traced epsilon, so XLA cannot elide the chain and
the device cannot overlap the repeats.

Shapes: bqp q=60 SOS dual — n = 1831, m = 523686, p_pad = 128 (the
mid-run rank bucket where round 3 spent 25-38 s per outer iteration).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from manisdp_tpu.frontends.sos import assemble_bqpsos
from manisdp_tpu.ops.dualops import DualOp
from manisdp_tpu.solvers.dual_al import (DUAL_VARIANTS, _make_problem,
                                         _make_stats)

DATA = "/root/reference/data"
REPS = 20


def chain_time(label, step, Y0, *args):
    """step(Y, i, *args) -> Y' (same shape); fori_loop of REPS steps."""

    @jax.jit
    def run(Y, *args):
        return jax.lax.fori_loop(
            0, REPS, lambda i, Yc: step(Yc, i, *args), Y)

    out = jax.block_until_ready(run(Y0, *args))     # compile
    t0 = time.time()
    out = jax.block_until_ready(run(Y0, *args))
    dt = (time.time() - t0) / REPS
    print(f"{label:38s} {dt * 1e3:9.2f} ms", flush=True)
    return out


def main():
    q = 60
    Q = np.loadtxt(os.path.join(DATA, f"bqp_Q_{q}_1.txt"), delimiter=",")
    e = np.loadtxt(os.path.join(DATA, f"bqp_e_{q}_1.txt"), delimiter=",")
    A, b, c, mb, f, dAAt = assemble_bqpsos(Q, e, q)
    maxb = np.max(np.abs(b))
    op = DualOp.build(A, b / maxb, c, mb, f=f, dAAt=dAAt)
    n, m = op.n, op.m
    print(f"n={n} m={m} nnzA={op.v_r.shape[0]}", flush=True)

    variant = DUAL_VARIANTS["dual_unitdiag"]
    problem, cost_only = _make_problem(variant, None)
    stats_fn = _make_stats(variant, None)

    p_pad = 128
    key = jax.random.PRNGKey(0)
    Y = jax.random.normal(key, (p_pad, n), dtype=jnp.float64)
    Y = Y / jnp.linalg.norm(Y, axis=0, keepdims=True)
    U0 = jax.random.normal(jax.random.fold_in(key, 1), (p_pad, n),
                           dtype=jnp.float64)
    Xm = jax.random.normal(jax.random.fold_in(key, 2), (n, n),
                           dtype=jnp.float64)
    w = jnp.zeros(op.f)
    params = dict(op=op, Xm=Xm, w=w, sigma=jnp.float64(0.002))

    cast32 = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
    op32 = cast32(op)
    params32 = dict(op=op32, Xm=Xm.astype(jnp.float32),
                    w=w.astype(jnp.float32), sigma=jnp.float32(0.002))
    Y32, U32 = Y.astype(jnp.float32), U0.astype(jnp.float32)

    # -- raw pieces (chained through a traced scalar) --
    def s_gram(Yc, i):
        S = Yc.T @ Yc
        return Yc * (1.0 + 1e-20 * S[0, 0])

    def s_apply(Yc, i, o):
        yv = o.apply(Yc.T @ Yc)
        return Yc * (1.0 + 1e-20 * yv[0])

    def s_adjoint(Yc, i, o, yv):
        Mh = o.adjoint(yv + 1e-20 * Yc[0, 0])
        return Yc * (1.0 + 1e-20 * Mh[0, 0])

    def s_dense(Yc, i, X):
        Z = Yc @ X
        return Yc * (1.0 + 1e-20 * Z[0, 0])

    yv64 = jax.block_until_ready(jax.jit(lambda: op.apply(Y.T @ Y))())
    yv32 = yv64.astype(jnp.float32)

    chain_time("gram Y.T@Y f64", s_gram, Y)
    chain_time("gram Y.T@Y f32", s_gram, Y32)
    chain_time("gram+A.apply f64", s_apply, Y, op)
    chain_time("gram+A.apply f32", s_apply, Y32, op32)
    chain_time("A.adjoint f64", s_adjoint, Y, op, yv64)
    chain_time("A.adjoint f32", s_adjoint, Y32, op32, yv32)
    chain_time("dense (p,n)@(n,n) f64", s_dense, Y, Xm)
    chain_time("dense (p,n)@(n,n) f32", s_dense, Y32,
               Xm.astype(jnp.float32))

    # -- solver-level pieces --
    def s_cost(Yc, i, prm):
        fv, aux = problem.cost(Yc, prm)
        return Yc * (1.0 + 1e-20 * fv)

    def s_costgrad(Yc, i, prm):
        fv, aux = problem.cost(Yc, prm)
        g, gaux = problem.grad(Yc, prm, aux)
        return Yc * (1.0 + 1e-20 * g[0, 0])

    chain_time("cost f64", s_cost, Y, params)
    chain_time("cost f32", s_cost, Y32, params32)
    chain_time("cost+grad f64", s_costgrad, Y, params)
    chain_time("cost+grad f32", s_costgrad, Y32, params32)

    # -- the tCG hot loop: Hv chained exactly like CG (U <- Hv) --
    def make_hv_chain(prm, dt):
        fv, aux = problem.cost(Y.astype(dt) if dt == jnp.float32 else Y,
                               prm)
        g, gaux = problem.grad(Y.astype(dt) if dt == jnp.float32 else Y,
                               prm, aux)

        def s_hv(Uc, i, Yf):
            H = problem.hess(Yf, Uc, prm, aux, gaux)
            return H / jnp.linalg.norm(H)

        return s_hv

    chain_time("Hv chained f64", make_hv_chain(params, jnp.float64),
               U0, Y)
    chain_time("Hv chained f32", make_hv_chain(params32, jnp.float32),
               U32, Y32)

    # -- stats --
    def s_stats(Yc, i):
        out = stats_fn(Yc, op, Xm, w, jnp.float64(0.002),
                       jnp.float64(1.0))
        return Yc * (1.0 + 1e-20 * out[6])

    chain_time("stats_fn", s_stats, Y)


if __name__ == "__main__":
    main()
