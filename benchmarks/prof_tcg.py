"""Microbenchmark the per-tCG-iteration cost at G67 shape (p=40,
n=10^4): f64 vs f32, and the share of the sparse Hv vs the vector
algebra — decides whether the 4.6 ms/Hv gap is emulated-f64 elementwise
bandwidth, reduction latency, or loop overhead."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from manisdp_tpu.frontends.gset import maxcut_cost
from manisdp_tpu.ops.sparse import SymCOO

C64 = SymCOO.from_scipy(maxcut_cost("/root/reference/data/Gset/G67.txt"))
n, p = C64.n, 40
ITER = 200


def run(dtype, tag):
    C = SymCOO(i=C64.i, j=C64.j, v=C64.v.astype(dtype), n=n)
    rs = np.random.RandomState(0)
    Y = jnp.asarray(rs.randn(p, n), dtype=dtype)
    Y = Y / jnp.sqrt(jnp.sum(Y * Y, axis=0))
    eG = jnp.sum(Y * C.matmat(Y), axis=0)

    def hess(U):
        UC = C.matmat(U)
        return UC - Y * jnp.sum(Y * UC, axis=0, keepdims=True) \
            - U * eG[None, :]

    def inner(a, b):
        return jnp.sum(a * b)

    # (a) full tCG-iteration-equivalent chain
    def tcg_body(i, s):
        eta, Heta, r, mdelta, zr = s
        H = hess(mdelta)
        d_Hd = inner(mdelta, H)
        alpha = zr / d_Hd
        eta = eta - alpha * mdelta
        Heta = Heta - alpha * H
        mv = inner(eta, eta) + 0.5 * inner(eta, Heta)
        r = r - alpha * H
        rr = inner(r, r)
        beta = rr / zr
        md = r + beta * mdelta
        md = md - Y * jnp.sum(Y * md, axis=0, keepdims=True)
        return (eta, Heta, r, md + 0.0 * mv, rr)

    @jax.jit
    def tcg_chain(Y0):
        init = (jnp.zeros_like(Y0), jnp.zeros_like(Y0), Y0, Y0,
                inner(Y0, Y0))
        return lax.fori_loop(0, ITER, tcg_body, init)[2]

    # (b) raw Hv chain only
    @jax.jit
    def hv_chain(U0):
        return lax.fori_loop(0, ITER, lambda i, U: hess(U) / ITER, U0)

    # (c) elementwise-only chain (no reductions, no Hv)
    @jax.jit
    def ew_chain(U0):
        def body(i, U):
            return U - 0.5 * (U * Y) + 0.25 * U
        return lax.fori_loop(0, ITER, body, U0)

    # (d) reductions-only chain
    @jax.jit
    def red_chain(U0):
        def body(i, s):
            U, acc = s
            return (U, acc + inner(U, U) + jnp.sum(U * Y))
        return lax.fori_loop(0, ITER, body, (U0, inner(U0, U0)))[1]

    for tag2, fn, arg in [("tcg-equiv", tcg_chain, Y),
                          ("raw Hv", hv_chain, Y),
                          ("elementwise x2", ew_chain, Y),
                          ("2 reductions", red_chain, Y)]:
        out = fn(arg)
        jax.block_until_ready(out)
        t0 = time.time()
        out = fn(arg)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / ITER * 1e3
        print(f"{tag} {tag2}: {dt:.3f} ms/iter", flush=True)


run(jnp.float64, "f64")
run(jnp.float32, "f32")
