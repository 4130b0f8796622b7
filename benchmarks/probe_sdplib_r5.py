"""Round-5 SDPLIB probes: candidate recipes for new regression rows
(maxG11, ss30, qap9) and tightened arch0/control1 (VERDICT r5 items
6-7).  CPU-only; prints eta/obj/time per (instance, recipe)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from manisdp_tpu import solve_sedumi
from manisdp_tpu.frontends.sdpa import read_sdpa

SDPLIB = "/root/reference/data/sdplib"

CASES = [
    ("maxG11", {}, dict(max_outer=500)),
    ("ss30", dict(tr_maxiter=20, tr_maxinner=80, sigma0=1.0,
                  sigma_min=1e-1, tau1=1e-2, tau2=1e-1),
     dict(max_outer=300)),
    ("qap9", dict(tr_maxiter=20, tr_maxinner=80, sigma0=1e1,
                  sigma_min=1e0, tau1=1e-3, tau2=1e-2),
     dict(max_outer=300)),
    ("arch0", dict(tr_maxiter=30, tr_maxinner=150, sigma0=1.0,
                   sigma_min=1e-1, tau1=1e-2, tau2=1e-1,
                   endgame_boost=True, boost_tr_maxiter=40,
                   boost_tr_maxinner=300), dict(max_outer=500)),
    ("control1", dict(tr_maxiter=30, tr_maxinner=200, sigma0=1e1,
                      sigma_min=1e0, tau1=1e-3, tau2=1e-2,
                      boost_tr_maxiter=50, boost_tr_maxinner=400),
     dict(max_outer=400)),
]

which = sys.argv[1:] if len(sys.argv) > 1 else None
for name, kw, extra in CASES:
    if which and name not in which:
        continue
    d = read_sdpa(f"{SDPLIB}/{name}.dat-s")
    t0 = time.time()
    try:
        res = solve_sedumi(d, verbose=False, tol=1e-8,
                           **dict(kw, **extra))
        print(f"{name}: status={res.status} eta={res.eta:.2e} "
              f"obj={-res.obj:.7e} iters={res.iterations} "
              f"t={time.time()-t0:.1f}s", flush=True)
    except Exception as ex:
        print(f"{name}: FAILED {ex!r}", flush=True)
