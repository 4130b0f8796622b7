"""SDPLIB certified-optimum regression (data/sdplib/README:26-120).

The reference treats the SDPLIB table of certified optima as its
ground-truth oracle (SURVEY §4.4).  These instances exercise the
general (Euclidean) driver on three different problem classes: Lovász
theta (theta1), graph partitioning (gpp100) and MaxCut (mcp250-1).
Note fromsdpa negates the objective (max -> min), so our optimum is
the negative of the README value for max-form instances.
"""

import os

import numpy as np
import pytest

from manisdp_tpu import solve_sdp
from manisdp_tpu.frontends.sdpa import read_sdpa

SDPLIB = os.environ.get("MANISDP_SDPLIB_DIR",
                        "/root/reference/data/sdplib")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SDPLIB),
    reason=f"SDPLIB data not found at {SDPLIB} "
           "(set MANISDP_SDPLIB_DIR)")


@pytest.mark.parametrize("name,certified,sign,kw", [
    ("gpp100", -4.49435e+01, -1.0, dict()),
    ("mcp250-1", 3.172643e+02, -1.0, dict()),
    # theta-class needs the endgame tuning (see recipes 'theta_sdplib')
    ("theta1", 2.300000e+01, -1.0, dict(tr_maxiter=8, tr_maxinner=40)),
])
def test_sdplib_certified_optimum(name, certified, sign, kw):
    d = read_sdpa(f"{SDPLIB}/{name}.dat-s")
    res = solve_sdp(d.At, d.b, d.c, d.K.s[0], verbose=False, tol=1e-6,
                    max_outer=300, **kw)
    assert res.status == 0, f"{name}: eta={res.eta:.2e}"
    assert res.eta < 1e-5
    rel = abs(sign * res.obj - certified) / (1.0 + abs(certified))
    assert rel < 1e-4, f"{name}: obj={res.obj}, certified={certified}"
