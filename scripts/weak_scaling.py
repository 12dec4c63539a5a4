#!/usr/bin/env python
"""Honest weak-scaling artifact (SCALING_r05+): fixed work PER device.

VERDICT r4 item 5: the round-4 artifact measured fixed-TOTAL wall on
core-sharing virtual devices — superlinear "efficiencies" (1.93x at 4
devices) that can only be partitioning artifacts.  This harness measures
the defensible quantity on a dev host:

* 1 -> 2 devices, ONE PINNED PHYSICAL CORE PER DEVICE (taskset): true
  weak scaling — resources per device held constant, work per device held
  constant, efficiency = rate(N)/(N * rate(1)).  This is the number the
  >= 0.8 north-star clause can be asserted against
  (tests/test_distributed.py::test_weak_scaling_two_pinned_devices).
* 4/8 virtual devices on a 2-core host are CORE-OVERSUBSCRIBED: rows are
  recorded with `oversubscribed: true` and measure host saturation, not
  framework scaling (the round-4 "8-device regression" was exactly this).
* The single-chip TPU anchor (BENCH_r*.json) is copied in for the
  solves/s-per-device denominator on real hardware.

Usage: python scripts/weak_scaling.py [--out SCALING_r05.json]
"""

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(n_devices, cores, batch_per_device, n_steps):
    """Run scaling_bench for one mesh size in a core-pinned subprocess."""
    cmd = []
    if cores is not None:
        cmd += ["taskset", "-c", cores]
    cmd += [sys.executable, os.path.join(REPO, "scripts", "scaling_bench.py"),
            "--cpu", "--devices", str(n_devices),
            "--batch-per-device", str(batch_per_device),
            "--n-steps", str(n_steps)]
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         timeout=3600)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    rows = [json.loads(ln) for ln in out.stdout.splitlines()
            if ln.startswith("{") and '"devices"' in ln and '"mode"' not in ln]
    return rows[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING_r05.json"))
    ap.add_argument("--batch-per-device", type=int, default=8)
    ap.add_argument("--n-steps", type=int, default=10)
    args = ap.parse_args()

    ncores = os.cpu_count() or 1
    have_taskset = shutil.which("taskset") is not None
    rows = []

    # pinned weak-scaling pair: one core per device
    pinned = have_taskset and ncores >= 2
    r1 = run_one(1, "0" if pinned else None,
                 args.batch_per_device, args.n_steps)
    r1["cores"] = "0" if pinned else f"all({ncores})"
    r1["oversubscribed"] = False
    rows.append(r1)
    r2 = run_one(2, "0,1" if pinned else None,
                 args.batch_per_device, args.n_steps)
    r2["cores"] = "0,1" if pinned else f"all({ncores})"
    r2["oversubscribed"] = ncores < 2
    r2["weak_efficiency_vs_1dev"] = round(
        r2["solves_per_sec"] / (2.0 * r1["solves_per_sec"]), 3)
    rows.append(r2)

    # oversubscribed tail: recorded, clearly labeled, NOT an efficiency claim
    for nd in (4, 8):
        r = run_one(nd, None, args.batch_per_device, args.n_steps)
        r["cores"] = f"all({ncores})"
        r["oversubscribed"] = nd > ncores
        r["weak_efficiency_vs_1dev"] = round(
            r["solves_per_sec"] / (nd * r1["solves_per_sec"]), 3)
        rows.append(r)

    # TPU single-chip anchor from the latest bench artifact
    anchor = None
    for name in sorted(os.listdir(REPO), reverse=True):
        if name.startswith("BENCH_r") and name.endswith(".json"):
            with open(os.path.join(REPO, name)) as f:
                b = json.load(f)
            anchor = {"artifact": name,
                      "solves_per_sec_per_chip": b.get("parsed", b).get("value")}
            break

    summary = {
        "mode": "weak_scaling_fixed_work_per_device",
        "host_physical_cores": ncores,
        "methodology": (
            "1->2 devices run with ONE PINNED CORE PER DEVICE (taskset), so "
            "resources and work per device are both constant — the honest "
            "weak-scaling pair a 2-core host can produce; efficiency = "
            "rate(N)/(N*rate(1)).  4/8-device rows are core-oversubscribed "
            "(devices > cores): they measure host saturation and explain "
            "the round-4 'regression' — they are NOT scaling efficiency.  "
            "Real ICI weak scaling needs a pod slice; the per-chip TPU "
            "anchor is attached for the solves/s/device denominator."),
        "scaling": rows,
        "tpu_anchor": anchor,
    }
    print(json.dumps(summary, indent=1))
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
