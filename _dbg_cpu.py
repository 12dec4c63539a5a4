import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import sys
f64 = "--f64" in sys.argv
if f64:
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/trajopt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from trajopt_tpu.benchmarks import bench_params, make_glass_upright
from trajopt_tpu.solver.sqp import _solve
dt = jnp.float64 if f64 else jnp.float32
spec, data, _, _ = make_glass_upright(batch=8, n_steps=30, dtype=dt)
params = bench_params()
run = jax.jit(lambda d: jax.vmap(lambda dd: _solve(spec, params, dd))(d))
res = run(data)
jax.block_until_ready(res)
print("dtype", dt.__name__, "status:", np.asarray(res.status))
print("n_qp_solves:", np.asarray(res.n_qp_solves))
print("max viol:", np.asarray(res.cnt_viols).max(axis=1))
