"""Gset graph loader -> Laplacian (equivalent of basicfunction/Laplacian.m).

Gset format: first line "nv ne", then ne lines "i j w" (1-based).
MaxCut SDP cost is C = -L/4 (example/example_maxcut.m:10-11).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def load_gset_laplacian(path: str) -> sp.csr_matrix:
    """Sparse graph Laplacian from a Gset edge-list file."""
    with open(path) as f:
        first = f.readline().split()
        nv, ne = int(first[0]), int(first[1])
        edges = np.loadtxt(f, ndmin=2)[:ne]
    i = edges[:, 0].astype(np.int64) - 1
    j = edges[:, 1].astype(np.int64) - 1
    w = edges[:, 2].astype(np.float64)
    W = sp.coo_matrix((np.concatenate([w, w]),
                       (np.concatenate([i, j]), np.concatenate([j, i]))),
                      shape=(nv, nv)).tocsr()
    deg = np.asarray(W.sum(axis=1)).ravel()
    return sp.diags(deg) - W


def maxcut_cost(path: str) -> sp.csr_matrix:
    """C = -L/4 for the MaxCut SDP."""
    return (-0.25) * load_gset_laplacian(path)
