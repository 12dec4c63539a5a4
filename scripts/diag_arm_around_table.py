"""Diagnose the failing arm_around_table parity solve.

Runs the reference's own config through the stack with record_history on,
under a selectable backend, and prints the full iteration history plus
world statistics (pair counts, row counts).
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from trajopt_tpu.collision.decompose import ingest_model_meshes
from trajopt_tpu.collision.world import build_collision_world
from trajopt_tpu.kinematics.chain import build_chain
from trajopt_tpu.kinematics.urdf import parse_srdf, parse_urdf_file
from trajopt_tpu.problem.json_io import load_problem
from trajopt_tpu.solver.sqp import solve
from trajopt_tpu.solver.types import STATUS_NAMES, SQPParams
from trajopt_tpu.ops.qp import QPSettings
from trajopt_tpu.terms.collision import trajectory_in_collision

DATA = "/root/reference/trajopt_common/data"
PKG = {"trajopt_common": "/root/reference/trajopt_common"}

backend = sys.argv[1] if len(sys.argv) > 1 else "admm"
cfg_name = sys.argv[2] if len(sys.argv) > 2 else "arm_around_table.json"

t0 = time.time()
m = parse_urdf_file(f"{DATA}/arm_around_table.urdf")
m = parse_srdf(m, open(f"{DATA}/pr2.srdf").read())
ingest_model_meshes(m, PKG, max_verts=24)
chain = build_chain(m, "right_arm")
world = build_collision_world(m, chain)
print(f"scene built in {time.time()-t0:.1f}s: n_pairs={world.n_pairs}, "
      f"n_geoms={len(world.geoms)}")
kinds = {}
for (ka, kb), ia, ib, pos in world._groups:
    kinds[(ka, kb)] = len(pos)
print("pair groups:", kinds)

doc = json.load(open(f"{DATA}/config/{cfg_name}"))
n_sub_cap = 8 if "time" not in cfg_name else 4
spec, data, params = load_problem(doc, chain, world, n_sub_cap=n_sub_cap)
params = SQPParams(**{**params.__dict__,
                      "record_history": 200, "record_history_x": True,
                      "qp": QPSettings(solver=backend)})
print(f"n_x={spec.n_x}; terms:")
for t in spec.cost_terms:
    print(f"  cost {t.name}: rows={t.n_rows} kind={t.kind}")
for t in spec.cnt_terms:
    print(f"  cnt  {t.name}: rows={t.n_rows} kind={t.kind}")

t0 = time.time()
res = solve(spec, data, params)
res.x.block_until_ready()
t_first = time.time() - t0
t0 = time.time()
res = solve(spec, data, params)
res.x.block_until_ready()
t_warm = time.time() - t0
print(f"solve wall {t_first:.1f}s (compile+run), warm {t_warm:.2f}s  "
      f"status={STATUS_NAMES[int(res.status)]}"
      f"  n_qp={int(res.n_qp_solves)}  viol_max={float(jnp.max(res.cnt_viols)):.2e}")
H = np.asarray(res.history)
print("  it  old_merit model_merit new_merit   approx    exact    ratio     box   max_viol acc qp_st")
for i in range(min(int(res.n_qp_solves), 200)):
    r = H[i]
    print(f"{i:4d}  {r[0]:9.3f} {r[1]:11.3f} {r[2]:9.3f} {r[3]:9.2e} {r[4]:8.1e} "
          f"{r[5]:8.2f} {r[6]:8.2e} {r[7]:8.2e} {int(r[8])} {int(r[9])}")
X = np.asarray(res.x).reshape(-1, spec.n_cols)
print("final X:")
print(np.array2string(X, precision=3))
env_mask = np.array([("table" in a) or ("table" in b)
                     for a, b in world.pair_link_names()])
sd = float(trajectory_in_collision(world, jnp.asarray(X[:, :7]),
                                   pair_mask=env_mask))
print(f"independent swept env distance: {sd:.4f}")
