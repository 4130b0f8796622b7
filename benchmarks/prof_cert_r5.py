"""Round-5 certificate probes.

1. Does jnp.linalg.eigh compile/run on axon for f32 at n ~ 1831/3241?
   (f64 eigh >= ~128 hangs the compiler — NOTES.md; f32 unknown.)
2. Host eigh cost: np.linalg.eigh (full) vs scipy syevr subset
   (smallest k + largest 1) at n = 1831 / 3241, f32 and f64.

Run: timeout 600 python benchmarks/prof_cert_r5.py
"""
import time

import numpy as np


def host_probes():
    import scipy.linalg as sla
    for n in (1831, 3241):
        rng = np.random.default_rng(0)
        A = rng.standard_normal((n, n))
        A = (A + A.T) / 2
        for dt in (np.float64, np.float32):
            X = A.astype(dt)
            t = time.time()
            np.linalg.eigh(X)
            t_full = time.time() - t
            t = time.time()
            sla.eigh(X, subset_by_index=[0, 8], driver="evr",
                     overwrite_a=False)
            t_sub = time.time() - t
            t = time.time()
            sla.eigh(X, subset_by_index=[n - 1, n - 1], driver="evr")
            t_top = time.time() - t
            print(f"host n={n} {np.dtype(dt).name}: full={t_full:.3f}s "
                  f"subset9={t_sub:.3f}s top1={t_top:.3f}s", flush=True)


def device_probes():
    import jax
    import jax.numpy as jnp
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    for n in (256, 1024, 1831, 3241):
        rng = np.random.default_rng(0)
        A = rng.standard_normal((n, n)).astype(np.float32)
        A = (A + A.T) / 2
        Ad = jax.device_put(jnp.asarray(A), dev)
        f = jax.jit(jnp.linalg.eigh)
        t = time.time()
        w, v = f(Ad)
        jax.block_until_ready(w)
        t_c = time.time() - t
        t = time.time()
        w, v = f(Ad)
        jax.block_until_ready(w)
        t_r = time.time() - t
        wh = np.asarray(w)
        ref = np.linalg.eigvalsh(A.astype(np.float64))
        err = np.max(np.abs(wh - ref)) / (1 + np.max(np.abs(ref)))
        print(f"dev f32 eigh n={n}: compile+run={t_c:.2f}s run={t_r:.3f}s "
              f"relerr={err:.2e}", flush=True)


if __name__ == "__main__":
    host_probes()
    device_probes()
