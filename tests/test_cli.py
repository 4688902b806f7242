"""CLI round-trip: simulate → info → invert → info."""
import subprocess
import sys
import os


def run(args, cwd):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    return subprocess.run([sys.executable, "-m", "ionotomo_tpu", *args],
                          capture_output=True, text=True, cwd=cwd, env=env)


def test_cli_simulate_invert_info(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    obs = tmp_path / "obs.h5"
    sol = tmp_path / "sol.h5"
    r = run(["simulate", "--out", str(obs), "--antennas", "8",
             "--directions", "4", "--grid", "14"], repo)
    assert r.returncode == 0, r.stderr[-500:]
    assert obs.exists()

    r = run(["info", str(obs)], repo)
    assert r.returncode == 0
    assert "antennas: 8" in r.stdout

    r = run(["invert", str(obs), "--out", str(sol), "--grid", "14",
             "--samples", "17", "--cg-iters", "8", "--gn-iters", "1",
             "--checkpoint-dir", str(tmp_path / "ckpt"),
             "--metrics", str(tmp_path / "m.jsonl")], repo)
    assert r.returncode == 0, r.stderr[-500:]
    assert sol.exists()

    r = run(["info", str(sol)], repo)
    assert r.returncode == 0
    assert "timesteps: 1" in r.stdout
