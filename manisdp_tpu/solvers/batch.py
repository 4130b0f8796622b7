"""Batched-instance MaxCut driver: B independent unit-diagonal SDPs
solved concurrently on one device or data-parallel over a ``batch`` mesh
axis.

The reference is strictly one-instance-at-a-time (single-process MATLAB,
SURVEY §2.7); instance batching is new TPU-native capability: the RTR
inner solve, saddle-escape line search and dual-certificate eigensolves
are vmapped over the instance axis, so the MXU processes the whole fleet
per kernel launch, and a ``jax.sharding`` batch axis spreads instances
across chips with zero cross-instance communication.

Scope: equal-size instances (one n), dense cost matrices — the regime
where batching pays (moderate n, many instances: scenario analysis,
per-seed sweeps, graph families).  Per-instance adaptive rank is kept:
each instance has its own active rank p_b inside one shared padded
buffer (p_pad, n); padding rows are exact zeros, which every manifold op
and the RTR preserve (zero rows are stationary), so lanes at different
ranks coexist in one compiled program.

Semantics per instance match solve_maxcut_unitdiag
(src/primal/ManiSDP_onlyunitdiag.m): RTR -> dual certificate
S = C - diag(z) -> rank truncate via factor SVD -> escape along negative
eigenvectors of S.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SolverOptions, merged_options
from ..core import Problem, TROptions, make_trustregions
from ..manifolds import Oblique
from .common import SDPResult, bucketed, make_line_search
from .maxcut import _make_inner


def _batched_fns(opt: SolverOptions):
    """vmapped RTR solve + line search + z/obj over the instance axis."""
    if opt.inner_dtype == "mixed":
        import warnings
        warnings.warn(
            "solve_maxcut_batch does not implement the mixed-precision "
            "inner solve yet; running the batch in float64 "
            "(inner_dtype='mixed' ignored)", stacklevel=3)
    solve, _solve32, line_search = _make_inner(opt, dense=True)
    vsolve = jax.jit(jax.vmap(
        lambda Y, C, t: solve(Y, C, t), in_axes=(0, 0, None)))
    vline = jax.jit(jax.vmap(line_search, in_axes=(0, 0, 0)))

    @jax.jit
    def vz(Y, C):
        z = jnp.einsum("bpn,bpn->bn", Y, jnp.einsum("bpn,bnm->bpm", Y, C))
        return z, jnp.sum(z, axis=1)

    return vsolve, vline, vz


def solve_maxcut_batch(Cs, options: Optional[SolverOptions] = None,
                       mesh=None, **overrides) -> list:
    """Solve B unit-diagonal SDPs min <C_b, X> s.t. diag(X)=1, X>=0.

    ``Cs``: sequence of B symmetric (n, n) arrays (or a (B, n, n) array).
    ``mesh``: optional jax.sharding.Mesh with a ``batch`` axis; instances
    are sharded across it (B must be a multiple of the axis size).

    Returns a list of B SDPResult, index-aligned with ``Cs``.
    """
    opt = merged_options("maxcut_unitdiag", options, **overrides)
    Cs = np.asarray([np.asarray(C, dtype=np.float64) for C in Cs])
    B, n, _ = Cs.shape
    Cs = 0.5 * (Cs + np.transpose(Cs, (0, 2, 1)))
    k_cert = opt.delta + 1

    if opt.verbose:
        print(f"ManiSDP-TPU (maxcut batch) is starting...", flush=True)
        print(f"batch = {B}, SDP size: n = {n}, m = {n}", flush=True)

    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = NamedSharding(mesh, P("batch"))
    C_dev = jnp.asarray(Cs) if sharding is None else \
        jax.device_put(jnp.asarray(Cs), sharding)

    fns_cache = {}

    def fns(p_pad):
        if p_pad not in fns_cache:
            fns_cache[p_pad] = _batched_fns(opt)
        return fns_cache[p_pad]

    key = jax.random.PRNGKey(opt.seed)
    p = np.full(B, opt.p0, dtype=np.int64)
    p_pad = bucketed(int(p.max()), opt.p_bucket)
    typdist = float(np.pi * np.sqrt(n))

    keys = jax.random.split(key, B)
    Y = np.zeros((B, p_pad, n))
    for b in range(B):
        Y[b, :opt.p0] = np.asarray(
            Oblique.rand(keys[b], opt.p0, n, opt.p0))
    Y = jnp.asarray(Y) if sharding is None else \
        jax.device_put(jnp.asarray(Y), sharding)
    U_dir = None

    done = np.zeros(B, dtype=bool)
    status = np.zeros(B, dtype=np.int64)
    obj = np.full(B, np.nan)
    dinf = np.full(B, np.nan)
    it_done = np.zeros(B, dtype=np.int64)
    z_final = np.zeros((B, n))
    t0 = time.time()
    it = 0

    for it in range(1, opt.max_outer + 1):
        vsolve, vline, vz = fns(p_pad)
        if U_dir is not None:
            Y = vline(Y, jnp.asarray(U_dir), C_dev)
        res = vsolve(Y, C_dev, typdist)
        Y = res.Y

        z_dev, obj_dev = vz(Y, C_dev)
        z_h = np.asarray(jax.device_get(z_dev))
        obj_now = np.asarray(jax.device_get(obj_dev))

        # batched dual certificate on host: S_b = C_b - diag(z_b)
        S = Cs.copy()
        S[:, np.arange(n), np.arange(n)] -= z_h
        vals, vecs = np.linalg.eigh(S)
        lam_min, lam_max = vals[:, 0], vals[:, -1]
        dinf_now = np.maximum(0.0, -lam_min) / (1.0 + lam_max)
        num_neg = np.sum(vals < 0, axis=1)

        newly = (~done) & (dinf_now < opt.tol)
        for b in np.nonzero(~done)[0]:
            obj[b], dinf[b] = obj_now[b], dinf_now[b]
            z_final[b] = z_h[b]
            it_done[b] = it
        done |= newly
        if opt.verbose:
            print(f"Iter {it}, done {int(done.sum())}/{B}, "
                  f"median dinf:{np.median(dinf_now):0.1e}, "
                  f"p_pad:{p_pad}, time:{time.time() - t0:0.2f}s",
                  flush=True)
        if done.all():
            break

        # ---- per-instance rank update (host) ----
        Y_h = np.asarray(jax.device_get(Y))
        p_next = p.copy()
        plans = []
        for b in range(B):
            if done[b]:
                plans.append(None)
                continue
            Yb = Y_h[b, :p[b]]
            sv = np.linalg.svd(Yb, compute_uv=False) if p[b] > 1 else \
                np.array([np.linalg.norm(Yb)])
            r = max(int(np.sum(sv >= opt.theta * sv[0])), 1)
            nne = max(min(int(num_neg[b]), opt.delta), 1)
            plans.append((r, nne))
            p_next[b] = (r if r <= p[b] - 1 else p[b]) + nne
        p_pad_next = bucketed(int(p_next.max()), opt.p_bucket)
        p_pad_next = max(p_pad_next, p_pad)

        Y_new = np.zeros((B, p_pad_next, n))
        U_new = np.zeros((B, p_pad_next, n))
        for b in range(B):
            if done[b]:
                Y_new[b, :p[b]] = Y_h[b, :p[b]]
                continue
            r, nne = plans[b]
            Yb = Y_h[b, :p[b]]
            if r <= p[b] - 1:
                Uf, sf, Vtf = np.linalg.svd(Yb, full_matrices=False)
                Yb = Uf[:, :r].T @ Yb
            pb = Yb.shape[0]
            vs = vecs[b][:, :nne]
            if opt.line_search:
                Y_new[b, :pb] = Yb
                U_new[b, pb:pb + nne] = vs.T
            else:
                Yb = np.vstack([Yb, opt.alpha * vs.T])
                Yb = Yb / np.sqrt(np.sum(Yb ** 2, axis=0))
                Y_new[b, :pb + nne] = Yb
        p = p_next
        p_pad = p_pad_next
        Y = jnp.asarray(Y_new) if sharding is None else \
            jax.device_put(jnp.asarray(Y_new), sharding)
        U_dir = U_new if opt.line_search else None

    for b in np.nonzero(~done)[0]:
        status[b] = 1

    elapsed = time.time() - t0
    if opt.verbose:
        print(f"ManiSDP-TPU batch: {int(done.sum())}/{B} optimal, "
              f"time = {elapsed:0.2f}s", flush=True)

    Y_h = np.asarray(jax.device_get(Y))
    out = []
    for b in range(B):
        Yb = Y_h[b, :p[b]]
        out.append(SDPResult(
            X=Yb.T @ Yb, obj=float(obj[b]), Y=Yb, z=z_final[b],
            dinf=float(dinf[b]), eta=float(dinf[b]),
            time=elapsed, status=int(status[b]),
            iterations=int(it_done[b]) if done[b] else it))
    return out
