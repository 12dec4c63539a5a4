import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/trajopt_tpu_jax_cache")
import jax.numpy as jnp, numpy as np
from trajopt_tpu.benchmarks import make_glass_upright
spec, data, chain, world = make_glass_upright(batch=2, n_steps=30, dtype=jnp.float64)
x0 = data.x0[0]
for i, term in enumerate(spec.cost_terms):
    p = jax.tree.map(lambda a: a[0], data.cost_params[i])
    v = term.value(x0, p)
    e = term.err(x0, p)
    print("cost", term.name, "value:", float(v), "err max:", float(e.max()))
for i, term in enumerate(spec.cnt_terms):
    p = jax.tree.map(lambda a: a[0], data.cnt_params[i])
    v = term.violation(x0, p)
    print("cnt", term.name, "violation:", float(v))
