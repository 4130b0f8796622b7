"""Device-resident dense eigen-certificate (f32 eigh + f64 refinement).

Replaces the round-4 host-eigh exact certificate for COMPRESSED
original-basis matrices (ops/symdual.SymDualOp.compress).  Measured on
TPU v5e (benchmarks/prof_cert_r5.py): host ``np.linalg.eigh`` costs
3 s (n = 1831) / 47 s (n = 3241) per call and was 33-68% of total
wall-clock on every SOS-dual workload; the device f32 ``jnp.linalg.eigh``
runs the same sizes in 0.09 s / 0.33 s (one-time compile, persisted by
the JAX cache).

Two tiers, mirroring the round-4 scheme (solvers/dual_al.py):

- ``far`` (max(gap, pinf) > cert_cheap_eta): f32 spectrum + escape
  directions only — nothing here decides termination, so f32 accuracy
  (|w - lam| <~ 2e-6 * ||X||, measured) is plenty.  Fully on device.

- ``near``: a CERTIFIED f64 lower bound on lam_min (and enclosure of
  lam_max), replacing the reference's host ``eig``
  (src/dual/ManiDSDP_unitdiag.m:84-88).  The f32 eigenbasis V is
  refined by Ogita-Aishima-style Newton steps in f64 on the MXU
  (T = X V, S = V'X V, B = V'V; E_ij = (S_ij + lam_i R_ij) /
  (lam_i - lam_j) for separated pairs, E = R/2 on near-degenerate
  pairs, V <- V + V E), then certified by GERSHGORIN on the
  congruence S - mu_min B:

      lam_min(X) - mu_min = lam_min(S - mu_min B, B)
                          >= min(0, gersh_min(S - mu_min B)) / lam_min(B)

  with lam_min(B) >= 1 - max offdiag row sum of |B - I| (Gershgorin
  again).  Every quantity is computed in f64 on device; the bound is
  sound up to f64 matmul roundoff (the same trust level as LAPACK's
  backward stability, which both the reference and the round-4 host
  path rely on).  A planted-cluster property test
  (tests/test_dense_cert.py) checks the certificate against
  np.linalg.eigh.

The near tier loops refinement (<= refine_max steps) until the
certified slack is below ``target`` or stops improving; if the bound
never certifies (pathological B conditioning) the caller falls back to
host eigh.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class DenseCertResult:
    lam_min: float          # certified lower bound (near) / f32 est (far)
    lam_max: float          # Rayleigh lower est; |err| <= slack
    num_neg: int
    neg_vecs: np.ndarray    # (n, k) host f64
    slack: float            # certified bound slack (0.0 for far tier)
    certified: bool
    # Ritz value of the lowest refined direction — an UPPER bound on
    # lam_min up to f64 roundoff (Rayleigh quotient), independent of
    # the Gershgorin slack.  When -lam_min_ritz already exceeds the
    # termination threshold, dinf > tol holds regardless of whether
    # the lower bound certified, so no host fallback is needed.
    lam_min_ritz: float = np.nan


@partial(jax.jit, static_argnums=(1,))
def _far_kernel(X32, k: int):
    w, V = jnp.linalg.eigh(X32)
    num_neg = jnp.sum(w < 0)
    return w[0], w[-1], num_neg, V[:, :k]


@jax.jit
def _eigh32_kernel(X32):
    return jnp.linalg.eigh(X32)


@jax.jit
def _oa_refine(X64, V):
    """One Ogita-Aishima refinement step in f64.  Returns the updated
    basis plus the CURRENT basis's certificate quantities (so the last
    refinement's cost also serves as the certification pass)."""
    T = X64 @ V
    S = V.T @ T
    S = 0.5 * (S + S.T)
    B = V.T @ V
    n = S.shape[0]
    db = jnp.diagonal(B)
    mu = jnp.diagonal(S) / db
    mu_min = jnp.min(mu)
    mu_max = jnp.max(mu)

    # --- certification of the CURRENT V (Gershgorin on S - mu B) ---
    eye = jnp.eye(n, dtype=X64.dtype)
    offB = jnp.sum(jnp.abs(B - eye), axis=1) - jnp.abs(jnp.diagonal(B) - 1.0)
    bmin = 1.0 - jnp.max(offB + jnp.abs(jnp.diagonal(B) - 1.0))
    G = S - mu_min * B
    gd = jnp.diagonal(G)
    grow = jnp.sum(jnp.abs(G), axis=1) - jnp.abs(gd)
    gersh_min = jnp.min(gd - grow)          # lam_min(G) >= gersh_min
    G2 = mu_max * B - S
    g2d = jnp.diagonal(G2)
    g2row = jnp.sum(jnp.abs(G2), axis=1) - jnp.abs(g2d)
    gersh2_min = jnp.min(g2d - g2row)       # lam_min(mu_max B - S)

    # --- OA update: separated pairs rotate, near-degenerate pairs
    # only re-orthogonalize (the certificate handles clusters) ---
    # first-order conditions (V1 = V(I+E), R := I - B):
    #   orthogonality  E + E' = R;
    #   diagonalization S_ij + mu_j E_ji + mu_i E_ij = 0 (i != j)
    # combined: E_ij = (S_ij + mu_j R_ij) / (mu_j - mu_i) for separated
    # pairs; near-degenerate pairs take the symmetric choice E = R/2
    # (pure re-orthogonalization — the Gershgorin certificate handles
    # intra-cluster structure without diagonalizing it).
    R = eye - B
    scale = jnp.maximum(jnp.abs(mu_min), jnp.abs(mu_max)) + 1e-30
    sep = 1e-3 * scale
    d = mu[None, :] - mu[:, None]
    safe = jnp.abs(d) > sep
    E_rot = (S + mu[None, :] * R) / jnp.where(safe, d, 1.0)
    E = jnp.where(safe, E_rot, 0.5 * R)
    V_new = V + V @ E
    return V_new, mu, mu_min, mu_max, gersh_min, gersh2_min, bmin


@partial(jax.jit, static_argnums=(2,))
def _order_cols(V, mu, k: int):
    idx = jnp.argsort(mu)
    return V[:, idx[:k]] / jnp.linalg.norm(V[:, idx[:k]], axis=0), \
        jnp.sum(mu < 0)


class DenseEighCert:
    """Stateless-ish engine; jit caches key on the (n, k) shapes."""

    def __init__(self, n: int, k: int, refine_max: int = 3):
        self.n = n
        self.k = k
        self.refine_max = refine_max

    def far(self, X32) -> DenseCertResult:
        lam_min, lam_max, num_neg, Vk = _far_kernel(X32, self.k)
        return DenseCertResult(
            lam_min=float(lam_min), lam_max=float(lam_max),
            num_neg=int(num_neg),
            neg_vecs=np.asarray(jax.device_get(Vk), dtype=np.float64),
            slack=0.0, certified=False)

    def near(self, X64, X32, target_rel: float) -> DenseCertResult:
        """Certified lam_min lower bound with slack <= target (attempted).

        ``target_rel`` is a RELATIVE slack goal: the absolute target is
        target_rel * (1 + |lam_max|) with lam_max estimated from the f32
        spectrum (e.g. 0.1 * tol so the slack sits an order below what
        the dinf <-> tol comparison can see).  Returns certified=False
        if the Gershgorin bound never achieved that slack (caller
        should fall back to a host eigh)."""
        w32, V32 = _eigh32_kernel(X32)
        target = target_rel * (1.0 + abs(float(w32[-1])))
        V = V32.astype(X64.dtype)
        best = None
        for _ in range(self.refine_max):
            V_new, mu, mu_min, mu_max, gmin, g2min, bmin = \
                _oa_refine(X64, V)
            bmin_f = float(bmin)
            if bmin_f <= 0.0:
                break
            slack = max(0.0, -float(gmin)) / bmin_f
            slack2 = max(0.0, -float(g2min)) / bmin_f
            cur = (max(slack, slack2), float(mu_min), float(mu_max),
                   mu, V)
            if best is None or cur[0] < best[0]:
                best = cur
            if best[0] <= target:
                break
            V = V_new
        if best is None:
            return DenseCertResult(np.nan, np.nan, 0,
                                   np.zeros((self.n, self.k)),
                                   np.inf, False)
        slack, mu_min, mu_max, mu, Vb = best
        Vk, num_neg = _order_cols(Vb, mu, self.k)
        return DenseCertResult(
            lam_min=mu_min - slack, lam_max=mu_max, num_neg=int(num_neg),
            neg_vecs=np.asarray(jax.device_get(Vk), dtype=np.float64),
            slack=slack, certified=slack <= target, lam_min_ritz=mu_min)
