import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
if "--f64" in sys.argv:
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/trajopt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from trajopt_tpu.benchmarks import make_glass_upright
from trajopt_tpu.ops.qp import QPSettings
from trajopt_tpu.solver.sqp import _solve
from trajopt_tpu.solver.types import SQPParams
dt = jnp.float64 if "--f64" in sys.argv else jnp.float32
solver = "struct" if "--struct" in sys.argv else "ipm"
budget = int([a for a in sys.argv if a.startswith("--budget=")][0].split("=")[1]) if any(a.startswith("--budget=") for a in sys.argv) else 200
spec, data, _, _ = make_glass_upright(batch=8, n_steps=30, dtype=dt)
params = SQPParams(
    max_total_qp_solves=budget,
    qp=QPSettings(eps_abs=1e-4, eps_rel=1e-6, max_iter=1000,
                  check_interval=25, adaptive_rho_interval=100,
                  solver=solver, max_ipm_iter=40),
)
run = jax.jit(lambda d: jax.vmap(lambda dd: _solve(spec, params, dd))(d))
res = run(data)
jax.block_until_ready(res)
print(f"{dt.__name__} {solver} budget={budget} status:", np.asarray(res.status))
print("n_qp_solves:", np.asarray(res.n_qp_solves))
print("max viol:", np.asarray(res.cnt_viols).max(axis=1).round(5))
