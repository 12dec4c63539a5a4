"""Multi-process distributed path (parallel.distributed): 2 CPU processes
form one JAX job; each host builds only its slice and the global sharded
batch + cross-process reduction agree (SURVEY §2.8 deliverable; VERDICT r2
weak #7 — process_count > 1 was never exercised)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    sys.path.insert(0, %(repo)r)
    from trajopt_tpu.parallel import distributed as dist

    pid = int(sys.argv[1])
    dist.initialize(coordinator_address=%(addr)r, num_processes=2,
                    process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == 2, jax.process_count()
    mesh = dist.global_mesh()
    n_dev = len(jax.devices())

    # deterministic host assignment over 7 problems: [0,4) and [4,7)
    lo, hi = dist.host_slice(7)
    expect = (0, 4) if pid == 0 else (4, 7)
    assert (lo, hi) == expect, (lo, hi)

    # global batch from per-host local shards: value 100*pid + i per row
    rows_per_host = n_dev // 2 * 3  # keep divisible by device count
    local = np.arange(rows_per_host, dtype=np.float64) + 100.0 * pid
    sh = NamedSharding(mesh, P("batch"))
    g = jax.make_array_from_process_local_data(sh, local)
    total = jax.jit(jnp.sum, out_shardings=None)(g)
    expected_total = float(sum(np.arange(rows_per_host) + 100.0 * p
                               for p in (0, 1)).sum())
    assert abs(float(total) - expected_total) < 1e-9, float(total)
    print("WORKER_OK", pid, n_dev, float(total))
""")


@pytest.mark.skipif(os.environ.get("TRAJOPT_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_cpu_job(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER % {"repo": os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "addr": addr})
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} rc={p.returncode}\n{out[-3000:]}"
        assert "WORKER_OK" in out, out[-3000:]
