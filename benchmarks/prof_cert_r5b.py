"""Round-5 cert probes, part 2: compression gathers + f64 RR pieces.

- flat scalar gather (r4's rep_lin take) vs row-take M[rep][:, rep]
  at q=60/80 shapes, f32 and f64
- f64 device matmul (n, n) @ (n, 512)
- host f64 eigh at 512
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(f, *a, reps=3):
    f(*a)  # compile
    jax.block_until_ready(f(*a))
    t = time.time()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.time() - t) / reps


def main():
    for q in (60, 80):
        nn = 2 + q + q * q
        no = 1 + q + q * (q - 1) // 2
        rng = np.random.default_rng(0)
        rep = rng.integers(0, nn, size=no)
        M = rng.standard_normal((nn, nn))
        rep_lin = (rep[:, None] * nn + rep[None, :]).ravel()
        for dt in (jnp.float32, jnp.float64):
            Md = jnp.asarray(M, dtype=dt)
            rl = jnp.asarray(rep_lin)
            rp = jnp.asarray(rep)
            flat = jax.jit(lambda M, idx: (4.0 * jnp.take(M.reshape(-1), idx)
                                           ).reshape(no, no))
            rowcol = jax.jit(lambda M, r: 4.0 * M[r][:, r])
            t_flat = timeit(flat, Md, rl)
            t_rc = timeit(rowcol, Md, rp)
            a = np.asarray(flat(Md, rl))
            b = np.asarray(rowcol(Md, rp))
            ok = np.allclose(a, b)
            print(f"q={q} {np.dtype(dt).name}: flat={t_flat*1e3:.1f}ms "
                  f"rowcol={t_rc*1e3:.1f}ms match={ok}", flush=True)

    for n in (1831, 3241):
        rng = np.random.default_rng(1)
        X = jnp.asarray(rng.standard_normal((n, n)), dtype=jnp.float64)
        V = jnp.asarray(rng.standard_normal((n, 512)), dtype=jnp.float64)
        mm = jax.jit(lambda X, V: X @ V)
        t = timeit(mm, X, V)
        print(f"f64 matmul ({n},{n})@({n},512): {t*1e3:.1f}ms", flush=True)

    H = np.random.default_rng(2).standard_normal((512, 512))
    H = (H + H.T) / 2
    t = time.time()
    np.linalg.eigh(H)
    print(f"host f64 eigh(512): {time.time()-t:.3f}s", flush=True)
    H = np.random.default_rng(2).standard_normal((768, 768))
    H = (H + H.T) / 2
    t = time.time()
    np.linalg.eigh(H)
    print(f"host f64 eigh(768): {time.time()-t:.3f}s", flush=True)


if __name__ == "__main__":
    main()
