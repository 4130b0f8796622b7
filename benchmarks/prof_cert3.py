"""Layout hypothesis test for the certificate ops (r3): the same sparse
matvec / reduction in (n, k) column-block layout vs (k, n) row layout,
f64 and f32.  The tCG hot loop runs (p, n) and is fast; lobpcg_standard
forces (n, k)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from manisdp_tpu.frontends.gset import maxcut_cost
from manisdp_tpu.ops.sparse import SymCOO

C = SymCOO.from_scipy(maxcut_cost("/root/reference/data/Gset/G67.txt"))
n, k = C.n, 24
rs = np.random.RandomState(0)
V = jnp.asarray(rs.randn(n, k))          # column-block layout
Vt = jnp.asarray(rs.randn(k, n))         # row layout
z = jnp.asarray(rs.randn(n))
C32 = SymCOO(i=C.i, j=C.j, v=C.v.astype(jnp.float32), n=C.n)
V32, Vt32, z32 = (V.astype(jnp.float32), Vt.astype(jnp.float32),
                  z.astype(jnp.float32))


def chain(fn, X, iters=40):
    def body(i, W):
        W = fn(W)
        return W / (1e-30 + jnp.max(jnp.abs(W)))
    return jax.lax.fori_loop(0, iters, body, X)


def timed(tag, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    dt = time.time() - t0
    print(f"{tag}: {dt / 40 * 1e3:.2f} ms/iter", flush=True)


timed("colblk (n,k) matvec_block f64",
      jax.jit(lambda X: chain(lambda W: C.matvec_block(W), X)), V)
timed("colblk (n,k) matvec_block f32",
      jax.jit(lambda X: chain(lambda W: C32.matvec_block(W), X)), V32)
timed("rowblk (k,n) matmat f64",
      jax.jit(lambda X: chain(lambda W: C.matmat(W), X)), Vt)
timed("rowblk (k,n) matmat f32",
      jax.jit(lambda X: chain(lambda W: C32.matmat(W), X)), Vt32)
timed("colblk shift+scale only f64",
      jax.jit(lambda X: chain(lambda W: W - z[:, None] * W, X)), V)
timed("rowblk shift+scale only f64",
      jax.jit(lambda X: chain(lambda W: W - z[None, :] * W, X)), Vt)

# gram in both layouts
timed("colblk gram V'V f64",
      jax.jit(lambda X: chain(lambda W: W @ (W.T @ W) * 1e-3 + W, X)), V)
timed("rowblk gram VV' f64",
      jax.jit(lambda X: chain(lambda W: (W @ W.T) @ W * 1e-3 + W, X)), Vt)

# full certificate-step equivalents
timed("colblk full step f64", jax.jit(lambda X: chain(
    lambda W: C.matvec_block(W) - z[:, None] * W, X)), V)
timed("rowblk full step f64", jax.jit(lambda X: chain(
    lambda W: C.matmat(W) - z[None, :] * W, X)), Vt)
timed("rowblk full step f32", jax.jit(lambda X: chain(
    lambda W: C32.matmat(W) - z32[None, :] * W, X)), Vt32)
