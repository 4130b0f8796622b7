"""Gather-free SOS-dual operator on the expanded pair basis.

THE bottleneck of the SOS-dual (bqpsos-class) solves is the sparse
constraint pipeline: at q = 60 (n = 1831, m = 523,686, nnz(A) = n^2)
one ``A.apply`` measured 378 ms f64 / 54 ms f32 and ``A.adjoint``
408 ms f64 on TPU v5e (benchmarks/prof_dualops.py) — TPU scalar
gathers run at ~60M elem/s, ~100x below the VPU, and no gather-based
formulation can fix that.  This module removes the gathers entirely.

Structure exploited (reference src/basicfunction/bqpsos.m:17-31, rebuilt
in frontends/sos.py): the BQP SOS constraint matrix is a PARTITION —
each matrix entry (u, v) belongs to exactly one constraint row, the
squarefree monomial class mask(u) XOR mask(v) — with unit weights and
therefore diagonal AA'.  On the EXPANDED basis

    [ 1,  x_a (a < q),  slot(i, j) := x_i * x_j  for ALL ordered (i, j) ]

(n~ = 1 + q + q^2 columns; slot(i, i) = x_i^2 = 1 duplicates the
constant, slot(i, j)/slot(j, i) duplicate x_i x_j), the class of every
entry is a pure index-coincidence pattern, so:

  - ``apply``  = dense symmetrizations + partial traces of the (q,q,q,q)
    Q-block tensor (plus small L/constant-block terms) — MXU einsums and
    VPU reductions, ZERO gathers;
  - ``adjoint`` = masked broadcasts of per-degree dense coefficient
    tensors back into the (n~, n~) matrix — ZERO scatters.

The expanded program is itself a valid SOS program over the same
monomial set (duplicate basis entries only enlarge the certificate
class; any original unit-diagonal certificate S lifts to an expanded
one with identical polynomial and objective via S~ = Q'SQ + N with a
polynomial-neutral psd correction N on the duplicate pairs), so the
optimal bound matches the reference formulation on instances where the
order-2 relaxation is tight — verified against the original-basis
solver in tests/test_symdual.py.

m-space layout ("flat"): the per-class multiplier vector is stored as
the concatenation of DENSE per-degree tensors

    [ y0 (1,), y1 (q,), Y2 (q,q), Y3 (q,q,q), Y4 (q,q,q,q) ]

holding the class value at EVERY permutation of distinct indices;
repeated-index entries are don't-care (never read by ``adjoint``, and
the stored ``b`` is zero there).  This keeps the driver's vector
algebra (dot(b, y), idAAt * y) valid unchanged: a degree-2 class
{a,b} occupies the two slots (a,b), (b,a), so b2[a,b] = Q[a,b] makes
dot(b, y) = sum_alpha b_alpha y_alpha exactly.

Drop-in compatible with ops.dualops.DualOp for the dual_unitdiag
driver: same attribute/method surface (apply/adjoint/y_step/B/b/cf/
C/bA/Ac/idAAt/m/n/f).  Reference semantics preserved:
ManiDSDP_unitdiag.m:34-41 (iA, bA precompute), :74 (closed-form
y-step), :174-194 (cost/grad/hess algebra) — the algebra is untouched,
only the operator representation changes.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .dualops import SparseMat


def _blocks(M, q):
    """Split an (n~, n~) matrix into the basis blocks."""
    s = M[0, 0]
    u = M[0, 1:1 + q]
    uT = M[1:1 + q, 0]
    E = M[0, 1 + q:].reshape(q, q)
    F = M[1 + q:, 0].reshape(q, q)
    G = M[1:1 + q, 1:1 + q]
    H = M[1:1 + q, 1 + q:].reshape(q, q, q)      # H[b, i, j]
    K = M[1 + q:, 1:1 + q].reshape(q, q, q)      # K[i, j, b]
    T = M[1 + q:, 1 + q:].reshape(q, q, q, q)    # T[i, j, k, l]
    return s, u, uT, E, F, G, H, K, T


def _apply_tensor(M, q):
    """Per-degree class sums of an (n~, n~) matrix.

    Returns (y0 scalar, y1 (q,), Y2 (q,q), Y3 (q,q,q), Y4 (q,q,q,q));
    entries of Y2/Y3/Y4 at repeated indices are unspecified.

    Derivation: every ordered pair of expanded columns falls in exactly
    one index-coincidence pattern; the patterns partition into the
    einsum terms below (diagonal slots slot(i,i) carry the empty mask,
    so they are split out via the off-diagonal masks FIRST, making the
    full-range einsums exact with no inclusion-exclusion corrections).
    """
    s, u, uT, E, F, G, H, K, T = _blocks(M, q)
    dt = M.dtype
    moff = 1.0 - jnp.eye(q, dtype=dt)
    Tn = T * moff[:, :, None, None] * moff[None, None, :, :]
    Hn = H * moff[None, :, :]
    Kn = K * moff[:, :, None]

    # -- degree 0 (class of the constant monomial) --
    y0 = (s + jnp.trace(G) + jnp.trace(E) + jnp.trace(F)
          + jnp.einsum('ijij->', Tn) + jnp.einsum('ijji->', Tn)
          + jnp.einsum('iikk->', T))

    # -- degree 1: classes {a} --
    y1 = (u + uT
          + jnp.einsum('aii->a', H) + jnp.einsum('iia->a', Hn)
          + jnp.einsum('jaj->a', Hn)
          + jnp.einsum('iia->a', K) + jnp.einsum('iai->a', Kn)
          + jnp.einsum('ajj->a', Kn))

    # -- degree 2: classes {a,b} (dense; diagonal don't-care) --
    # A4 counts the shared-index Q x Q pairs whose a-containing slot
    # comes first; the b-first orderings are exactly its transpose.
    A4 = (jnp.einsum('acbc->ab', Tn) + jnp.einsum('accb->ab', Tn)
          + jnp.einsum('cabc->ab', Tn) + jnp.einsum('cacb->ab', Tn))
    Y2 = (G + G.T + E + E.T + F + F.T + A4 + A4.T
          + jnp.einsum('iiab->ab', T) + jnp.einsum('iiba->ab', T)
          + jnp.einsum('abkk->ab', T) + jnp.einsum('bakk->ab', T))

    # -- degree 3: classes {a,b,c} (x_e * slot pairs, both sides) --
    HH = Hn + jnp.swapaxes(Hn, 1, 2)
    Ka = jnp.transpose(Kn, (2, 0, 1))
    KK = Ka + jnp.swapaxes(Ka, 1, 2)
    S3 = HH + KK
    Y3 = (S3 + jnp.transpose(S3, (1, 0, 2)) + jnp.transpose(S3, (2, 1, 0)))

    # -- degree 4: full S4 symmetrization of the off-diagonal Q-block --
    P1 = Tn + jnp.transpose(Tn, (1, 0, 2, 3))
    P2 = P1 + jnp.transpose(P1, (0, 1, 3, 2))
    P3 = P2 + jnp.transpose(P2, (2, 3, 0, 1))
    Y4 = (P3 + jnp.transpose(P3, (0, 2, 1, 3))
          + jnp.transpose(P3, (0, 3, 2, 1)))
    return y0, y1, Y2, Y3, Y4


def _adjoint_tensor(y0, y1, Y2, Y3, Y4, q):
    """(n~, n~) matrix W with W[u, v] = class value of (u, v).

    Pure masked broadcasts — the inverse of the class map is evaluated
    by index-coincidence selection, never by scatter.
    """
    dt = Y4.dtype
    eye = jnp.eye(q, dtype=bool)

    E_w = jnp.where(eye, y0, Y2)                       # (0, Q) block
    G_w = jnp.where(eye, y0, Y2)                       # (L, L) block

    # (L, Q) block H_w[b, i, j]
    b3 = jax.lax.broadcasted_iota(jnp.int32, (q, q, q), 0)
    i3 = jax.lax.broadcasted_iota(jnp.int32, (q, q, q), 1)
    j3 = jax.lax.broadcasted_iota(jnp.int32, (q, q, q), 2)
    y1_b = y1[:, None, None]
    y1_i = y1[None, :, None]
    y1_j = y1[None, None, :]
    H_w = jnp.where(i3 == j3, y1_b,
                    jnp.where(b3 == i3, y1_j,
                              jnp.where(b3 == j3, y1_i, Y3)))

    # (Q, Q) block T_w[i, j, k, l] — priority: diagonal-slot patterns,
    # then equal pairs, then single shared index, else all-distinct.
    i4 = jax.lax.broadcasted_iota(jnp.int32, (q, q, q, q), 0)
    j4 = jax.lax.broadcasted_iota(jnp.int32, (q, q, q, q), 1)
    k4 = jax.lax.broadcasted_iota(jnp.int32, (q, q, q, q), 2)
    l4 = jax.lax.broadcasted_iota(jnp.int32, (q, q, q, q), 3)
    Y2_kl = Y2[None, None, :, :]
    Y2_ij = Y2[:, :, None, None]
    Y2_jl = Y2[None, :, None, :]
    Y2_jk = Y2[None, :, :, None]
    Y2_il = Y2[:, None, None, :]
    Y2_ik = Y2[:, None, :, None]
    fd = i4 == j4
    sd = k4 == l4
    same = ((i4 == k4) & (j4 == l4)) | ((i4 == l4) & (j4 == k4))
    T_w = jnp.where(
        fd & sd, y0,
        jnp.where(fd, Y2_kl,
                  jnp.where(sd, Y2_ij,
                            jnp.where(same, y0,
                                      jnp.where(i4 == k4, Y2_jl,
                                                jnp.where(i4 == l4, Y2_jk,
                                                          jnp.where(j4 == k4, Y2_il,
                                                                    jnp.where(j4 == l4, Y2_ik,
                                                                              Y4))))))))

    row0 = jnp.concatenate([y0[None], y1, E_w.reshape(-1)])
    rowsL = jnp.concatenate([y1[:, None], G_w, H_w.reshape(q, q * q)],
                            axis=1)
    rowsQ = jnp.concatenate([E_w.reshape(-1, 1),
                             jnp.transpose(H_w, (1, 2, 0)).reshape(q * q, q),
                             T_w.reshape(q * q, q * q)], axis=1)
    return jnp.concatenate([row0[None], rowsL, rowsQ], axis=0)


def _flatten(y0, y1, Y2, Y3, Y4):
    return jnp.concatenate([jnp.reshape(y0, (1,)), y1, Y2.reshape(-1),
                            Y3.reshape(-1), Y4.reshape(-1)])


def _split(y, q):
    o1 = 1 + q
    o2 = o1 + q * q
    o3 = o2 + q ** 3
    return (y[0], y[1:o1], y[o1:o2].reshape(q, q),
            y[o2:o3].reshape(q, q, q), y[o3:].reshape(q, q, q, q))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SymDualOp:
    """Gather-free drop-in for DualOp on BQP-SOS expanded data.

    ``n`` is the expanded basis size n~ = 1 + q + q^2; ``m`` the flat
    per-degree multiplier length 1 + q + q^2 + q^3 + q^4 (``m_true``
    carries the number of distinct monomial classes for logging).
    """
    b: jax.Array               # (m,) flat, dual-weighted (see module doc)
    cf: jax.Array              # (f,)
    C: jax.Array               # (n, n) dense PSD-part cost (zeros for BQP)
    idAAt: jax.Array           # (m,) flat 1/class-size
    bA: jax.Array              # (n, n) dense mat(A' D^{-1} b)
    Ac: jax.Array              # (m,) flat A @ vec(C)
    B: SparseMat
    q: int = dataclasses.field(metadata=dict(static=True))
    m: int = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))
    f: int = dataclasses.field(metadata=dict(static=True))
    m_true: int = dataclasses.field(metadata=dict(static=True))

    # ---- DualOp-compatible surface --------------------------------------
    def apply(self, M):
        return _flatten(*_apply_tensor(M, self.q))

    def adjoint(self, y):
        y0, y1, Y2, Y3, Y4 = _split(y, self.q)
        return _adjoint_tensor(y0, y1, Y2, Y3, Y4, self.q)

    def y_step(self, S):
        return self.idAAt * (self.apply(S) - self.Ac)

    # ---- construction ---------------------------------------------------
    @staticmethod
    def build_bqpsos(Q: np.ndarray, e: np.ndarray, q: int) -> "SymDualOp":
        """Expanded-basis operator for min x'Qx + e'x, x in {-1,1}^q.

        Mirrors frontends.sos.assemble_bqpsos semantics (reference
        bqpsos.m + README.md:261-271 free lower-bound variable) on the
        expanded basis.  b is NOT normalized — callers divide by
        max|b| as the reference examples do.
        """
        Q = np.asarray(Q, dtype=np.float64)
        e = np.asarray(e, dtype=np.float64).ravel()
        nn = 1 + q + q * q
        flat_m = 1 + q + q ** 2 + q ** 3 + q ** 4
        m_true = _num_classes(q)

        # dual-weighted flat b: per-slot values summing to the class b
        b1 = e
        B2 = np.asarray(Q, dtype=np.float64).copy()
        np.fill_diagonal(B2, 0.0)
        b_flat = np.concatenate([
            [np.trace(Q)], b1, B2.reshape(-1),
            np.zeros(q ** 3), np.zeros(q ** 4)])

        # class-size vector dAAt = apply(ones); repeated-index slots
        # are don't-care -> force 1 to keep idAAt finite
        ones = jnp.ones((nn, nn), dtype=jnp.float64)
        dAAt = np.array(_flatten(*_apply_tensor(ones, q)))
        dAAt[_dontcare_mask(q)] = 1.0

        # class-valued flat b (slot value = full class coefficient) for
        # the bA precompute: bA = mat(A' (b / dAAt))
        bc2 = 2.0 * B2
        b_class = np.concatenate([
            [np.trace(Q)], b1, bc2.reshape(-1),
            np.zeros(q ** 3), np.zeros(q ** 4)])
        idAAt = 1.0 / dAAt
        bA = _adjoint_tensor(*_split(jnp.asarray(b_class * idAAt), q), q)

        # NO free lower-bound block: on the expanded basis the dual
        # constraint it would impose (y_0 = 1) is already pinned by the
        # unit diagonal through the class-0 structure, and a redundant
        # equality makes the ADMM multiplier w drift in the degenerate
        # subspace — observed as a fixed ~1e-6-relative duality-gap
        # floor (obj = cf'w + sum(z) with an inconsistent w).  Without
        # the block, obj = sum(z) equals b'y exactly at optimality and
        # the recovered bound is b'y itself (matching the reference
        # free-variable value, README.md:261-271).
        import scipy.sparse as sp
        Bmat = SparseMat.from_scipy(sp.coo_matrix((flat_m, 0)))

        return SymDualOp(
            b=jnp.asarray(b_flat), cf=jnp.zeros(0, dtype=jnp.float64),
            C=jnp.zeros((nn, nn), dtype=jnp.float64),
            idAAt=jnp.asarray(idAAt), bA=jnp.asarray(bA),
            Ac=jnp.zeros(flat_m, dtype=jnp.float64), B=Bmat,
            q=q, m=flat_m, n=nn, f=0, m_true=m_true)


def _num_classes(q: int) -> int:
    from math import comb
    return 1 + q + comb(q, 2) + comb(q, 3) + comb(q, 4)


def _dontcare_mask(q: int) -> np.ndarray:
    """Boolean mask over the flat layout marking repeated-index slots."""
    m2 = np.eye(q, dtype=bool).reshape(-1)
    i3, j3, k3 = np.meshgrid(*([np.arange(q)] * 3), indexing="ij")
    m3 = ((i3 == j3) | (i3 == k3) | (j3 == k3)).reshape(-1)
    i4, j4, k4, l4 = np.meshgrid(*([np.arange(q)] * 4), indexing="ij")
    m4 = ((i4 == j4) | (i4 == k4) | (i4 == l4) |
          (j4 == k4) | (j4 == l4) | (k4 == l4)).reshape(-1)
    return np.concatenate([np.zeros(1 + q, dtype=bool), m2, m3, m4])


def expanded_masks(q: int) -> np.ndarray:
    """Monomial bitmask of every expanded basis column (host helper for
    the validation generator and tests)."""
    assert q <= 62
    masks = np.zeros(1 + q + q * q, dtype=np.uint64)
    masks[1:1 + q] = 1 << np.arange(q, dtype=np.uint64)
    ii, jj = np.meshgrid(np.arange(q), np.arange(q), indexing="ij")
    masks[1 + q:] = ((1 << ii.astype(np.uint64)) ^
                     (1 << jj.astype(np.uint64))).reshape(-1)
    return masks


def bqpsos_expanded_sparse(Q: np.ndarray, e: np.ndarray, q: int):
    """Expanded-basis BQP-SOS data as SPARSE SeDuMi-style arrays, for
    small-q validation of SymDualOp through the generic DualOp path.

    Returns (A_full, b, c, nn, f=1, dAAt) exactly as
    frontends.sos.assemble_bqpsos does for the original basis.
    """
    import scipy.sparse as sp
    from ..frontends.monomials import monomial_basis

    Q = np.asarray(Q, dtype=np.float64)
    e = np.asarray(e, dtype=np.float64).ravel()
    nn = 1 + q + q * q
    sp4 = monomial_basis(q, 4, max_power=1)
    lsp = sp4.shape[1]
    pow2 = (1 << np.arange(q, dtype=np.uint64))
    masks4 = (sp4.astype(np.uint64).T * pow2).sum(axis=1)
    order4 = np.argsort(masks4, kind="stable")
    sorted4 = masks4[order4]

    em = expanded_masks(q)
    iu, ju = np.meshgrid(np.arange(nn), np.arange(nn), indexing="ij")
    xm = np.bitwise_xor(em[iu.reshape(-1)], em[ju.reshape(-1)])
    rows = order4[np.searchsorted(sorted4, xm)]
    cols = ju.reshape(-1) * nn + iu.reshape(-1)   # column-major like _ent
    vals = np.ones(rows.shape[0])
    dAAt = np.bincount(rows, minlength=lsp).astype(np.float64)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(lsp, nn * nn)).tocsr()

    b = np.zeros(lsp)
    b[0] = np.trace(Q)
    mask1 = 1 << np.arange(q, dtype=np.uint64)
    b[order4[np.searchsorted(sorted4, mask1)]] = e
    i2, j2 = np.triu_indices(q, k=1)
    b[order4[np.searchsorted(
        sorted4, (1 << i2.astype(np.uint64)) ^ (1 << j2.astype(np.uint64)))]] \
        = 2.0 * Q[i2, j2]

    v = sp.coo_matrix(([1.0], ([0], [0])), shape=(lsp, 1))
    A_full = sp.hstack([v, A]).tocsr()
    c = np.zeros(1 + nn * nn)
    c[0] = 1.0
    return A_full, b, c, nn, 1, dAAt
