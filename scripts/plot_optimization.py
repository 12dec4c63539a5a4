#!/usr/bin/env python
"""Plot solver iteration logs (merit, trust box, violations).

Analog of the reference's trajopt/scripts/plot_optimization.py, reading the
CSV streams written by trajopt_tpu.utils.telemetry.write_logs.

Usage: python scripts/plot_optimization.py /tmp/trajopt_solver.log [out.png]
"""

import csv
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trajopt_solver.log"
    out = sys.argv[2] if len(sys.argv) > 2 else None
    with open(path) as f:
        reader = csv.reader(f)
        header = next(reader)
        rows = [[float(v) for v in r] for r in reader]
    if not rows:
        print("no iterations logged")
        return
    cols = {name: [r[i] for r in rows] for i, name in enumerate(header)}

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        # text fallback
        for name in ("old_merit", "trust_box_size", "max_cnt_viol"):
            print(f"{name}: " + " ".join(f"{v:.3g}" for v in cols[name]))
        return

    fig, axes = plt.subplots(3, 1, figsize=(8, 9), sharex=True)
    axes[0].semilogy(cols["old_merit"], label="merit")
    axes[0].semilogy(cols["new_merit"], label="new merit")
    axes[0].legend(); axes[0].set_ylabel("merit")
    axes[1].semilogy(cols["trust_box_size"])
    axes[1].set_ylabel("trust box")
    axes[2].semilogy([max(v, 1e-12) for v in cols["max_cnt_viol"]])
    axes[2].set_ylabel("max violation"); axes[2].set_xlabel("QP solve")
    fig.tight_layout()
    fig.savefig(out or path.replace(".log", ".png"), dpi=120)
    print("wrote", out or path.replace(".log", ".png"))


if __name__ == "__main__":
    main()
