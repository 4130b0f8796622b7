"""SeDuMi-cone dispatcher: route (At, b, c, K) to the right driver.

The reference leaves this to the user (each example picks its ManiSDP
variant); for SDPLIB-style data we add what it lacks: LP cones.  A
``K.l`` block is folded as K.l Euclidean 1x1 blocks into the
multiblock driver — a 1x1 PSD block IS a nonnegative variable
(x = y^2 >= 0), and read_sdpa already orders the LP part first, which
is exactly the multiblock vec layout for leading 1x1 blocks.  This
unlocks the SDPLIB arch/ss/control classes the reference drivers
cannot run (example_sdplib.py previously raised on K.l > 0).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import SolverOptions
from .common import SDPResult
from .general import solve_sdp
from .multiblock import solve_multiblock


def solve_sedumi(data, options: Optional[SolverOptions] = None,
                 **overrides) -> SDPResult:
    """Solve SeDuMi-format data (e.g. from frontends.sdpa.read_sdpa):
    single PSD block -> general driver; multiple blocks and/or an LP
    cone -> multiblock driver with the LP part as 1x1 blocks."""
    K = data.K
    l = int(getattr(K, "l", 0) or 0)
    s = K.s if isinstance(K.s, (list, tuple, np.ndarray)) else [K.s]
    s = [int(x) for x in s]
    if l == 0 and len(s) == 1:
        return solve_sdp(data.At, data.b, data.c, s[0], options,
                         **overrides)
    ns = [1] * l + s
    return solve_multiblock(data.At, data.b, data.c, ns=ns, nob=0,
                            options=options, **overrides)
