"""Checkpoint / resume for the outer solver state.

The reference only supports warm starts via options.Y0
(ManiSDP.m:36-40); here the full outer AL/ADMM state — the factor, the
multipliers, the penalty, and counters — is a small dict of arrays
snapshotted to one .npz (SURVEY §5: "outer-loop state is a small
pytree ... natural checkpoint unit").  Drivers accept the loaded dict
through their resume parameters (Y0=..., y0=..., sigma0=...).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def save_state(path: str, *, Y, y=None, w=None, Xm=None, sigma=None,
               tier=None, iteration=None,
               extra: Dict[str, Any] | None = None):
    """Snapshot outer state to ``path`` (.npz)."""
    payload: Dict[str, Any] = {"Y": np.asarray(Y)}
    if y is not None:
        payload["y"] = np.asarray(y)
    if w is not None:
        payload["w"] = np.asarray(w)
    if Xm is not None:
        payload["Xm"] = np.asarray(Xm)
    if sigma is not None:
        payload["sigma"] = np.float64(sigma)
    if tier is not None:
        payload["tier"] = np.int64(tier)
    if iteration is not None:
        payload["iteration"] = np.int64(iteration)
    for k, v in (extra or {}).items():
        payload[f"extra_{k}"] = np.asarray(v)
    np.savez(path, **payload)


def load_state(path: str) -> Dict[str, Any]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def resume_kwargs(path: str) -> Dict[str, Any]:
    """Map a snapshot to the matching driver keyword arguments, so the
    public entry points can offer ``resume=path`` directly:

        solve_sdp(At, b, c, n, resume="ckpt.npz")

    Fields not present in the snapshot are simply omitted (e.g. the
    maxcut driver checkpoints only the factor)."""
    st = load_state(path)
    kw: Dict[str, Any] = {}
    if "Y" in st:
        kw["Y0"] = st["Y"]
    if "y" in st:
        kw["y0"] = st["y"]
    if "w" in st:
        kw["w0"] = st["w"]
    if "Xm" in st:
        kw["Xm0"] = st["Xm"]
    if "sigma" in st:
        kw["sigma0"] = float(st["sigma"])
    if "extra_ps" in st:
        kw["ps0"] = np.asarray(st["extra_ps"]).tolist()
    return kw
