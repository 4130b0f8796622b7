"""Decompose the G67 certificate cost: lanczos bounds vs LOBPCG vs raw
matvec chain vs small dense eigh — picks the lever for VERDICT item 3
(cert is ~50% of G67 wall-clock)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from manisdp_tpu.frontends.gset import maxcut_cost
from manisdp_tpu.ops.eigs import lanczos_bounds, lobpcg_certificate
from manisdp_tpu.ops.sparse import SymCOO

C = SymCOO.from_scipy(maxcut_cost("/root/reference/data/Gset/G67.txt"))
n, p, k = C.n, 24, 9
rs = np.random.RandomState(0)
Y = rs.randn(p, n)
Y /= np.sqrt((Y ** 2).sum(0))
Y = jnp.asarray(Y)
z = C.quad_cols(Y)


def matvec(V):
    return C.matvec_block(V) - z[:, None] * V


def timed(tag, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    print(f"{tag}: {(time.time() - t0) / reps * 1e3:.1f} ms", flush=True)
    return out


key = jax.random.PRNGKey(0)
X0 = jnp.asarray(rs.randn(n, k))

lanc = jax.jit(lambda key: lanczos_bounds(matvec, n, key))
timed("lanczos_bounds(48)", lanc, key)

for it in (80, 40, 20):
    lw = jax.jit(lambda Y, z, key, X0, it=it: lobpcg_certificate(
        lambda V: C.matvec_block(V) - z[:, None] * V, n, k, key,
        deflate=Y, X0=X0, maxiter=it))
    r = timed(f"lobpcg_certificate(maxiter={it})", lw, Y, z, key, X0)
    print(f"   lam_min {float(r.lam_min):.6f} lam_max {float(r.lam_max):.3f}",
          flush=True)

# raw matvec chain of 80 iterations on the same block width (k + p aug)
blk = k + min(p, 24 - k)
V0 = jnp.asarray(rs.randn(n, blk))
chain = jax.jit(lambda V: jax.lax.fori_loop(
    0, 80, lambda i, W: matvec(W) / jnp.linalg.norm(W), V0))
timed(f"80x matvec chain (n={n}, blk={blk})", chain, V0)

# small dense f64 eigh of the LOBPCG's internal size, 80 times
G = jnp.asarray(rs.randn(3 * blk, 3 * blk))
G = G @ G.T


def eighs(G):
    def body(i, acc):
        w, _ = jnp.linalg.eigh(G + i * 1e-9)
        return acc + w[0]
    return jax.lax.fori_loop(0, 80, body, 0.0)


timed(f"80x eigh({3 * blk}x{3 * blk}) f64", jax.jit(eighs), G)

# QR / Gram orthonormalization cost at (n, 3*blk)
B = jnp.asarray(rs.randn(n, 3 * blk))


def grams(B):
    def body(i, acc):
        Gm = B.T @ (B + i * 1e-12)
        L = jnp.linalg.cholesky(Gm + jnp.eye(3 * blk) * 1e-8)
        return acc + L[0, 0]
    return jax.lax.fori_loop(0, 80, body, 0.0)


timed(f"80x gram+cholesky (n x {3 * blk})", jax.jit(grams), B)
