"""sup <C,X>+<c,w> s.t. A(X)+B(w)=b, X>=0, diag(S)=1 — TPU equivalent
of src/dual/ManiDSDP_unitdiag.m (oblique slack factor + Riemannian ADMM).
Requires AA' diagonal (SOS bases); pass ``dAAt`` to skip recomputing it.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import SolverOptions
from ..ops.dualops import DualOp
from .common import SDPResult
from .dual_al import solve_dual_al


def solve_dual_unitdiag(A, b, c, n: int, f: int = 0,
                        dAAt=None,
                        options: Optional[SolverOptions] = None,
                        Y0: Optional[np.ndarray] = None,
                        resume: Optional[str] = None,
                        **overrides) -> SDPResult:
    """SeDuMi dual layout: A (m, f + n^2) sparse with the free block
    first (ManiDSDP_unitdiag.m:34-37), b (m,), c (f + n^2,).

    ``resume``: path of a checkpoint_every snapshot; loads the factor,
    multipliers (Xm, w) and penalty and continues that trajectory."""
    kw = {}
    if resume:
        from ..utils.checkpoint import resume_kwargs
        rk = resume_kwargs(resume)
        Y0 = rk.get("Y0", Y0)
        kw = {k: rk[k] for k in ("Xm0", "w0") if k in rk}
        if "sigma0" in rk:
            overrides.setdefault("sigma0", rk["sigma0"])
    from ..ops.symdual import SymDualOp
    op = A if isinstance(A, (DualOp, SymDualOp)) \
        else DualOp.build(A, b, c, n, f, dAAt)
    return solve_dual_al("dual_unitdiag", op, options, Y0=Y0, **kw,
                         **overrides)
