import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/trajopt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from trajopt_tpu.benchmarks import make_glass_upright
from trajopt_tpu.ops.qp import QPSettings
from trajopt_tpu.solver.sqp import _solve
from trajopt_tpu.solver.types import SQPParams
spec, data, _, _ = make_glass_upright(batch=2, n_steps=30, dtype=jnp.float64)
params = SQPParams(
    max_total_qp_solves=200,
    qp=QPSettings(eps_abs=1e-5, eps_rel=1e-7, max_iter=2000,
                  check_interval=25, adaptive_rho_interval=100,
                  solver="ipm", max_ipm_iter=60),
)
run = jax.jit(lambda d: jax.vmap(lambda dd: _solve(spec, params, dd))(d))
res = run(data)
jax.block_until_ready(res)
print("status:", np.asarray(res.status), "qp:", np.asarray(res.n_qp_solves))
print("viol groups:", [ (n, np.asarray(v).round(5)) for n, v in zip(spec.cnt_names if hasattr(spec,'cnt_names') else range(res.cnt_viols.shape[1]), np.asarray(res.cnt_viols).T) ])
