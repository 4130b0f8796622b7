"""One-call BQP moment-SDP primal solver on the expanded tensor
operator (ops/symmom.SymMomOp) — the gather-free fast path for the
reference's flagship primal workload (example/example_bqp.m:10-15:
bqpmom -> ManiSDP_unitdiag; measured 178 s at q = 60 in
/root/reference/data/primal.txt:16).

Equivalent problem to frontends.moments.bqpmom -> solve_unitdiag, with
obj / gap / pinf / dinf defined VERBATIM as the reference's (the
operator reproduces the constraint rows exactly — tests/test_symmom.py).

Parameter mapping (expanded-basis correspondence): on the
duplicate-symmetric subspace the expanded AL cost equals the original
AL cost EXACTLY as a function (apply reads copy-averages; values are
unchanged, unlike the SOS dual's 4x class inflation), so sigma needs NO
remapping.  The geometry still duplicates columns: an original factor
Y corresponds to the expanded factor with each unit column twice, every
coefficient matrix (C, A'w) spreads /4 over 2x2 copy slots, and each
expanded column's Euclidean gradient is HALF the original column's
(2 copies of each opposing column at 1/4 weight each).  Tangent norms
scale by sqrt(2) (duplicated columns), so

    gradnorm_expanded = gradnorm_original / sqrt(2)
    tau1, tau2       -> sqrt(2) * tau          (pinf unchanged)
    tolgradnorm      -> tolgradnorm / sqrt(2)

and escape vectors lift with 1/sqrt(2) per copy then scale by sqrt(2)
(solvers/primal_al.py compressed-cert branch), mirroring
solve_bqp_sos_dual's proven mapping with the sigma/4 factor removed.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import SolverOptions, VARIANT_DEFAULTS
from ..ops.symmom import SymMomOp
from .common import SDPResult
from .primal_al import solve_primal_al


def solve_bqp_mom(Q, e, q: int,
                  options: Optional[SolverOptions] = None,
                  **overrides) -> SDPResult:
    """Primal moment-SDP of min x'Qx + e'x over {-1,1}^q."""
    op = SymMomOp.build_bqpmom(Q, e, q)
    d = VARIANT_DEFAULTS["unitdiag"]
    s2 = float(np.sqrt(2.0))
    overrides.setdefault("tau1", d["tau1"] * s2)
    overrides.setdefault("tau2", d["tau2"] * s2)
    overrides.setdefault("tolgradnorm", 1e-8 / s2)
    # keep the reference default p0 = 2 (ManiSDP_unitdiag.m:10); the
    # driver's log(m) fallback would see the inflated flat length
    overrides.setdefault("p0", d.get("p0", 2))
    return solve_primal_al("unitdiag", op, options, **overrides)
