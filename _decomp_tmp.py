import time
import jax
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/trajopt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from trajopt_tpu.benchmarks import make_glass_upright
from trajopt_tpu.ops.qp import QPSettings
from trajopt_tpu.solver.types import SQPParams
from trajopt_tpu.solver.sqp import _solve, _plan, _convexify

B = 128
spec, data, _, _ = make_glass_upright(batch=B, n_steps=30, dtype=jnp.float32)

# (0) convexify alone
plan = _plan(spec)
cvx_fn = jax.jit(jax.vmap(lambda d: _convexify(plan, d, d.x0)))
r = cvx_fn(data); jax.block_until_ready(r)
t0 = time.perf_counter()
for _ in range(5):
    r = cvx_fn(data); jax.block_until_ready(r)
print(f"convexify alone: {(time.perf_counter()-t0)/5*1000:.1f} ms")

def run_with(nqp, qpiter, label):
    params = SQPParams(max_total_qp_solves=nqp,
                       qp=QPSettings(eps_abs=1e-4, eps_rel=1e-6,
                                     max_iter=qpiter, check_interval=25,
                                     adaptive_rho_interval=100))
    f = jax.jit(lambda d: jax.vmap(lambda dd: _solve(spec, params, dd))(d))
    r = f(data); jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = f(data); jax.block_until_ready(r)
    dt = time.perf_counter()-t0
    ok = int((np.asarray(r.status)==1).sum())
    print(f"{label}: {dt*1000:.0f} ms, converged {ok}/{B}, mean_nqp {float(np.asarray(r.n_qp_solves).mean()):.1f}")

run_with(1, 25, "1 qp x 25 admm")
run_with(12, 25, "12 qp x 25 admm")
run_with(12, 200, "12 qp x <=200 admm")
run_with(12, 1000, "12 qp x <=1000 admm")
run_with(120, 1000, "120 qp x <=1000 admm (bench cfg)")
