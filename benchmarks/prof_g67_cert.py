# time the G67 certificate compile+run standalone before the full solve
import time, jax, numpy as np
import jax.numpy as jnp
import manisdp_tpu
from manisdp_tpu.frontends.gset import maxcut_cost
from manisdp_tpu.ops.sparse import SymCOO
from manisdp_tpu.ops.eigs import lobpcg_certificate

C = SymCOO.from_scipy(maxcut_cost("/root/reference/data/Gset/G67.txt"))
n, p = C.n, 40
rs = np.random.RandomState(0)
Y = rs.randn(p, n); Y /= np.sqrt((Y**2).sum(0)); Y = jnp.asarray(Y)
z = C.quad_cols(Y)
k = 9

@jax.jit
def cert(Y, z, key, X0):
    def matvec(V):
        return C.matvec_block(V) - z[:, None] * V
    return lobpcg_certificate(matvec, n, k, key, deflate=Y, X0=X0)

X0 = jnp.asarray(rs.randn(n, k))
t0 = time.time()
r = cert(Y, z, jax.random.PRNGKey(0), X0)
jax.block_until_ready(r.lam_min)
print("cert compile+run:", time.time()-t0, "lam_min", r.lam_min, flush=True)
t0 = time.time()
r = cert(Y, z*1.000001, jax.random.PRNGKey(1), X0)
jax.block_until_ready(r.lam_min)
print("cert warm:", time.time()-t0, flush=True)
