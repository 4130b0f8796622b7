import time, json
from manisdp_tpu import solve_maxcut_unitdiag
from manisdp_tpu.frontends.gset import maxcut_cost

C = maxcut_cost("/root/reference/data/Gset/G67.txt")
solve_maxcut_unitdiag(C, p0=40, verbose=False)   # warm all compiles
t0 = time.time()
res = solve_maxcut_unitdiag(C, p0=40, verbose=False)
print("warm total", time.time()-t0, flush=True)
print("timers", json.dumps(res.timers), "hess", res.hess_calls,
      "iters", res.iterations, flush=True)
