"""ManiSDP-TPU: a TPU-native low-rank semidefinite-program solver.

A from-scratch JAX/XLA re-design of the capability surface of
wangjie212/ManiSDP-matlab (see /root/reference): augmented-Lagrangian /
Riemannian-ADMM outer loops over a Burer-Monteiro factor Y with Riemannian
trust-region (truncated-CG) inner solves on oblique / sphere / Euclidean /
product manifolds, adaptive rank control via dual-matrix eigendecomposition,
and saddle-escape steps from negative eigenvectors.

Design (TPU-first, not a port):
  - functional core: every inner solve is ONE jitted call built from
    ``lax.while_loop``; cost/grad/hess communicate through explicit ``aux``
    pytrees instead of MATLAB closure state (reference relies on Manopt's
    StoreDB call-order caching, see ManiSDP_unitdiag.m:152-171).
  - static shapes for dynamic rank: the factor Y lives in a padded
    (p_pad, n) buffer whose trailing rows are zero; rank changes rewrite
    rows, the shape only changes when the padding bucket grows.
  - factored everything: X = Y'Y is never materialized on the hot path;
    the sparse constraint operator acts on Y via gather/segment-sum.
  - float64 end-to-end by default (KKT tol 1e-8 requires it).
"""

import os

import jax

# tol=1e-8 KKT residuals are unreachable in f32; enable f64 before any
# array is created. TPU f64 is emulated but the hot path is sparse /
# memory-bound, where the emulation overhead is small.
jax.config.update("jax_enable_x64", True)

# XLA compiles of large f64 while_loop programs are expensive on TPU
# (remote compile); persist them across processes.
_cache_dir = os.environ.get("MANISDP_JAX_CACHE",
                            os.path.expanduser("~/.cache/jax_manisdp"))
if _cache_dir:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from .config import SolverOptions  # noqa: E402
from .solvers.maxcut import solve_maxcut_unitdiag  # noqa: E402
from .solvers.batch import solve_maxcut_batch  # noqa: E402
from .solvers.unitdiag import solve_unitdiag  # noqa: E402
from .solvers.unittrace import solve_unittrace  # noqa: E402
from .solvers.general import solve_sdp  # noqa: E402
from .solvers.dispatch import solve_sedumi  # noqa: E402
from .solvers.dual_unitdiag import solve_dual_unitdiag  # noqa: E402
from .solvers.dual_general import solve_dual_sdp  # noqa: E402
from .frontends.gset import load_gset_laplacian  # noqa: E402
from . import recipes  # noqa: E402

__all__ = [
    "SolverOptions",
    "recipes",
    "solve_maxcut_unitdiag",
    "solve_maxcut_batch",
    "solve_unitdiag",
    "solve_sedumi",
    "solve_unittrace",
    "solve_sdp",
    "solve_dual_unitdiag",
    "solve_dual_sdp",
    "load_gset_laplacian",
]

__version__ = "0.1.0"
