import time, sys
from manisdp_tpu import solve_maxcut_unitdiag
from manisdp_tpu.frontends.gset import maxcut_cost

C = maxcut_cost("/root/reference/data/Gset/G67.txt")
t0 = time.time()
res = solve_maxcut_unitdiag(C, p0=40, verbose=True)
print("G67 cold total", time.time()-t0, "obj", res.obj, "dinf", res.dinf,
      "hess", res.hess_calls, flush=True)
t0 = time.time()
res = solve_maxcut_unitdiag(C, p0=40, verbose=True)
print("G67 warm", time.time()-t0, "obj", res.obj, "dinf", res.dinf, flush=True)
