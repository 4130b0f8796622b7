"""Chained TPU timings of the SymDualOp tensor pipeline at bqp q=60.

Compare against prof_dualops.py (the sparse gather pipeline):
  cost f64 789 ms / f32 108 ms, Hv f32 108 ms, stats 788 ms.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp

from manisdp_tpu.ops.symdual import SymDualOp
from manisdp_tpu.solvers.dual_al import (DUAL_VARIANTS, _make_problem,
                                         _make_stats)

DATA = "/root/reference/data"
REPS = 10


def chain_time(label, step, Y0, *args):
    @jax.jit
    def run(Y, *args):
        return jax.lax.fori_loop(
            0, REPS, lambda i, Yc: step(Yc, i, *args), Y)

    t0 = time.time()
    out = jax.block_until_ready(run(Y0, *args))
    compile_s = time.time() - t0
    t0 = time.time()
    out = jax.block_until_ready(run(Y0, *args))
    dt = (time.time() - t0) / REPS
    print(f"{label:38s} {dt * 1e3:9.2f} ms   (compile {compile_s:.1f}s)",
          flush=True)
    return out


def main():
    q = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    Q = np.loadtxt(os.path.join(DATA, f"bqp_Q_{q}_1.txt"), delimiter=",") \
        if q in (10, 20, 30, 40, 50, 60, 70, 80) else None
    if Q is None:
        rng = np.random.default_rng(0)
        Q = rng.standard_normal((q, q))
        Q = (Q + Q.T) / 2
        e = rng.standard_normal(q)
    else:
        e = np.loadtxt(os.path.join(DATA, f"bqp_e_{q}_1.txt"), delimiter=",")
    t0 = time.time()
    op = SymDualOp.build_bqpsos(Q, e, q)
    maxb = float(np.max(np.abs(np.asarray(op.b))))
    op = dataclasses.replace(op, b=op.b / maxb, bA=op.bA / maxb)
    nn = op.n
    print(f"q={q} n~={nn} flat_m={op.m} classes={op.m_true} "
          f"build={time.time() - t0:.1f}s", flush=True)

    variant = DUAL_VARIANTS["dual_unitdiag"]
    problem, _ = _make_problem(variant, None)
    stats_fn = _make_stats(variant, None)

    p_pad = 128
    key = jax.random.PRNGKey(0)
    Y = jax.random.normal(key, (p_pad, nn), dtype=jnp.float64)
    Y = Y / jnp.linalg.norm(Y, axis=0, keepdims=True)
    U0 = jax.random.normal(jax.random.fold_in(key, 1), (p_pad, nn),
                           dtype=jnp.float64)
    Xm = jax.random.normal(jax.random.fold_in(key, 2), (nn, nn),
                           dtype=jnp.float64)
    w = jnp.zeros(0)
    params = dict(op=op, Xm=Xm, w=w, sigma=jnp.float64(0.002))

    cast32 = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
    params32 = dict(op=cast32(op), Xm=Xm.astype(jnp.float32),
                    w=w.astype(jnp.float32), sigma=jnp.float32(0.002))
    Y32, U32 = Y.astype(jnp.float32), U0.astype(jnp.float32)

    def s_apply(Yc, i, prm):
        yv = prm["op"].apply_flat(Yc.T @ Yc)
        return Yc * (1.0 + 1e-20 * yv[0])

    def s_adjoint(Yc, i, prm, yv):
        W = prm["op"].adjoint(yv + 1e-20 * Yc[0, 0])
        return Yc * (1.0 + 1e-20 * W[0, 0])

    def s_cost(Yc, i, prm):
        fv, aux = problem.cost(Yc, prm)
        return Yc * (1.0 + 1e-20 * fv)

    def s_costgrad(Yc, i, prm):
        fv, aux = problem.cost(Yc, prm)
        g, gaux = problem.grad(Yc, prm, aux)
        return Yc * (1.0 + 1e-20 * g[0, 0])

    yv64 = jax.block_until_ready(jax.jit(
        lambda: op.apply_flat(Y.T @ Y))())
    yv32 = yv64.astype(jnp.float32)

    chain_time("gram+apply f64", s_apply, Y, params)
    chain_time("gram+apply f32", s_apply, Y32, params32)
    chain_time("adjoint f64", s_adjoint, Y, params, yv64)
    chain_time("adjoint f32", s_adjoint, Y32, params32, yv32)
    chain_time("cost f64", s_cost, Y, params)
    chain_time("cost f32", s_cost, Y32, params32)
    chain_time("cost+grad f64", s_costgrad, Y, params)

    def make_hv_chain(prm, dt):
        Yd = Y.astype(dt) if dt == jnp.float32 else Y
        fv, aux = problem.cost(Yd, prm)
        g, gaux = problem.grad(Yd, prm, aux)

        def s_hv(Uc, i, Yf):
            H = problem.hess(Yf, Uc, prm, aux, gaux)
            return H / jnp.linalg.norm(H)

        return s_hv

    chain_time("Hv chained f64", make_hv_chain(params, jnp.float64),
               U0, Y)
    chain_time("Hv chained f32", make_hv_chain(params32, jnp.float32),
               U32, Y32)

    def s_stats(Yc, i):
        out = stats_fn(Yc, op, Xm, w, jnp.float64(0.002),
                       jnp.float64(1.0))
        return Yc * (1.0 + 1e-20 * out[6])

    chain_time("stats_fn", s_stats, Y)


if __name__ == "__main__":
    main()
