"""trajopt_tpu — a TPU-native sequential-convex trajectory optimization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of TrajOpt
(trajopt_sco / trajopt / trajopt_ifopt / trajopt_sqp reference stack):

- ``ops.qp``        : batched dense OSQP-equivalent ADMM QP solver (the inner loop)
- ``solver``        : trust-region penalty SQP engine as masked device loops
- ``kinematics``    : URDF ingestion, batched forward kinematics + geometric Jacobians
- ``collision``     : differentiable convex signed-distance + discrete/LVS/cast evaluators
- ``terms``         : joint/cartesian/collision/time cost & constraint terms
- ``problem``       : typed + JSON (reference-schema-compatible) problem construction
- ``parallel``      : SPMD batch sharding over device meshes
- ``models``        : robot model zoo (spherebot, boxbot, 7-DoF arm, ...)

Everything on the compute path is jit/vmap/shard_map-compatible with static shapes.
"""

__version__ = "0.1.0"
