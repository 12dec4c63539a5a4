"""CLI front end (python -m trajopt_tpu) — Config/CommandParser analog
(trajopt_common/config.hpp:16-71) + OptimizeProblem JSON entry."""

import json
import subprocess
import sys


def _run(args, timeout=600):
    return subprocess.run(
        [sys.executable, "-m", "trajopt_tpu", *args],
        capture_output=True, text=True, timeout=timeout,
        cwd="/root/repo")


def test_cli_solve(tmp_path):
    doc = {
        "basic_info": {"n_steps": 3, "manip": "manipulator",
                       "fixed_timesteps": [0]},
        "costs": [{"type": "joint_vel", "params": {"coeffs": [1],
                                                   "targets": [0, 0]}}],
        "constraints": [
            {"type": "joint_pos", "name": "goal",
             "params": {"coeffs": [1, 1], "targets": [1.0, 0.5],
                        "first_step": 2, "last_step": 2}}],
        "init_info": {"type": "stationary", "data": [0, 0]},
    }
    prob = tmp_path / "p.json"
    prob.write_text(json.dumps(doc))
    out = tmp_path / "r.json"
    r = _run(["solve", str(prob), "--model", "spherebot", "--platform", "cpu",
              "--f64", "--out", str(out)])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OPT_CONVERGED" in r.stdout
    res = json.loads(out.read_text())
    assert res["status"] == "OPT_CONVERGED"
    assert abs(res["trajectory"][2][0] - 1.0) < 1e-4


def test_cli_bad_problem(tmp_path):
    prob = tmp_path / "p.json"
    prob.write_text(json.dumps({
        "basic_info": {"n_steps": 2, "manip": "m"},
        "costs": [{"type": "nope", "params": {}}]}))
    r = _run(["solve", str(prob), "--model", "spherebot",
              "--platform", "cpu"])
    assert r.returncode != 0
    assert "unsupported term type" in (r.stderr + r.stdout)


def test_profiling_walltimer():
    from trajopt_tpu.utils.profiling import WallTimer
    t = WallTimer()
    with t.section("a"):
        with t.section("b"):
            pass
    rep = t.report()
    assert "a" in rep and "b" in rep
