import sys, time
import jax
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/trajopt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from trajopt_tpu.benchmarks import make_glass_upright
from trajopt_tpu.ops.qp import QPSettings
from trajopt_tpu.solver.sqp import _solve
from trajopt_tpu.solver.types import SQPParams
solver = sys.argv[1] if len(sys.argv) > 1 else "struct"
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
spec, data, _, _ = make_glass_upright(batch=batch, n_steps=30, dtype=jnp.float32)
params = SQPParams(
    max_total_qp_solves=60,
    qp=QPSettings(eps_abs=1e-4, eps_rel=1e-6, max_iter=1000,
                  check_interval=25, adaptive_rho_interval=100,
                  solver=solver, max_ipm_iter=40),
)
run = jax.jit(lambda d: jax.vmap(lambda dd: _solve(spec, params, dd))(d))
res = run(data); jax.block_until_ready(res)
t0 = time.perf_counter()
for _ in range(3):
    res = run(data); jax.block_until_ready(res)
dt3 = (time.perf_counter() - t0) / 3
st = np.asarray(res.status); mv = np.asarray(res.cnt_viols).max(axis=1)
ok = int(((st == 1) & (mv < 1e-3)).sum())
print(f"solver={solver} batch={batch} wall={dt3:.3f}s ok={ok}/{batch} "
      f"solves/s={ok/dt3:.1f} status_counts={np.bincount(st, minlength=6)} "
      f"viol_max={mv.max():.2e} mean_qp={np.asarray(res.n_qp_solves).mean():.1f}")
