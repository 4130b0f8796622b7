"""Mixed-precision inner solve: f32 RTR pre-stage + f64 refinement.

The f32 stage only warm-starts the f64 stage; certification (dinf) is
always f64, so the solution must reach the same 1e-8 KKT quality as the
pure-f64 path.
"""

import numpy as np

from manisdp_tpu import solve_maxcut_unitdiag


def _random_laplacian_cost(n=60, seed=0):
    rs = np.random.RandomState(seed)
    W = (rs.rand(n, n) < 0.2).astype(np.float64)
    W = np.triu(W, 1)
    W = W + W.T
    L = np.diag(W.sum(axis=1)) - W
    return -L / 4.0


def test_mixed_al_driver_matches_f64():
    from manisdp_tpu import solve_unitdiag
    from manisdp_tpu.frontends.moments import bqpmom

    rs = np.random.RandomState(1)
    n = 6
    Q = rs.randn(n, n)
    Q = 0.5 * (Q + Q.T)
    e = rs.randn(n)
    d = bqpmom(n, Q, e)
    r64 = solve_unitdiag(d.At, d.b, d.c, d.K.s, verbose=False)
    rmx = solve_unitdiag(d.At, d.b, d.c, d.K.s, verbose=False,
                         inner_dtype="mixed")
    assert r64.status == 0 and rmx.status == 0
    assert rmx.eta < 1e-8
    assert abs(rmx.obj - r64.obj) / (1 + abs(r64.obj)) < 1e-6


def test_mixed_matches_f64():
    C = _random_laplacian_cost()
    r64 = solve_maxcut_unitdiag(C, p0=8, verbose=False)
    rmx = solve_maxcut_unitdiag(C, p0=8, verbose=False,
                                inner_dtype="mixed")
    assert r64.status == 0 and rmx.status == 0
    assert rmx.dinf < 1e-8
    assert abs(rmx.obj - r64.obj) / (1 + abs(r64.obj)) < 1e-7
    # the f32 stage contributes iterations, so the mixed run's counter
    # includes both stages
    assert rmx.hess_calls > 0
