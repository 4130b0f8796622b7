"""Batched-instance driver: B MaxCut SDPs solved concurrently must each
match the single-instance driver's certified optimum."""

import numpy as np

from manisdp_tpu import solve_maxcut_batch, solve_maxcut_unitdiag


def random_sym_cost(n, seed):
    rs = np.random.RandomState(seed)
    B = rs.randn(n, n)
    C = 0.5 * (B + B.T)
    np.fill_diagonal(C, 0.0)
    return C


def test_batch_matches_single():
    n, B = 24, 4
    Cs = [random_sym_cost(n, seed) for seed in range(B)]
    batch = solve_maxcut_batch(Cs, tol=1e-7, verbose=False, max_outer=40)
    assert len(batch) == B
    for b, C in enumerate(Cs):
        single = solve_maxcut_unitdiag(C, tol=1e-7, verbose=False)
        assert batch[b].status == 0, f"instance {b} not optimal"
        assert batch[b].dinf < 1e-7
        # same certified optimum (independent runs, same problem)
        assert abs(batch[b].obj - single.obj) < 1e-5 * (1 + abs(single.obj))
        # unit diagonal feasibility
        assert np.allclose(np.diag(batch[b].X), 1.0, atol=1e-9)


def test_batch_on_batch_mesh():
    import jax
    from jax.sharding import Mesh

    n, B = 16, 8
    Cs = [random_sym_cost(n, seed) for seed in range(B)]
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("batch",))
    batch = solve_maxcut_batch(Cs, mesh=mesh, tol=1e-6, verbose=False,
                               max_outer=40)
    assert all(r.status == 0 for r in batch)
    assert all(r.dinf < 1e-6 for r in batch)
