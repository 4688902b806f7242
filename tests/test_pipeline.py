"""End-to-end pipeline + checkpoint/resume + Solution persistence tests."""
import dataclasses
import numpy as np

from ionotomo_tpu.config import EngineConfig, GridConfig, RayConfig, \
    SolverConfig, RuntimeConfig, PriorConfig
from ionotomo_tpu.data.synth import generate_example_datapack
from ionotomo_tpu.inversion.pipeline import InversionPipeline
from ionotomo_tpu.inversion.solution import Solution
from ionotomo_tpu.utils import checkpoint as ckpt


def small_config(tmp_path, **solver_kw):
    return EngineConfig(
        grid=GridConfig(shape=(14, 14, 14)),
        rays=RayConfig(n_samples=33),
        prior=PriorConfig(sigma=0.3, length_scale_km=90.0, kind="sqexp"),
        solver=SolverConfig(**{"gn_iters": 2, "cg_iters": 15,
                               **solver_kw}),
        runtime=RuntimeConfig(checkpoint_dir=str(tmp_path / "ckpt"),
                              metrics_path=str(tmp_path / "m.jsonl")),
    )


def make_dp(n_times=2, seed=3):
    # mjd fraction 0.45 → ~12:48 UT, daytime at the LOFAR site (full
    # Chapman ionization; night worlds have ~4x lower SNR at fixed noise)
    dp, truth = generate_example_datapack(
        n_antennas=8, n_directions=5, n_times=n_times, mjd0=58000.45,
        grid_shape=(14, 14, 14), noise_tecu=1e-3, seed=seed, n_samples=33)
    return dp, truth


def test_pipeline_runs_and_reduces_residual(tmp_path):
    dp, truth = make_dp()
    pipe = InversionPipeline(dp, small_config(tmp_path))
    sol = pipe.run(resume=False)
    assert sol.m.shape[0] == 2
    recs = pipe.metrics.read_all()
    assert len(recs) == 2
    assert all(np.isfinite(r["residual"]) for r in recs)
    # solution is persistable and reloadable
    p = tmp_path / "sol.h5"
    sol.save(p)
    sol2 = Solution.load(p)
    np.testing.assert_allclose(sol2.m, sol.m)
    assert sol2.config_json == sol.config_json


def test_pipeline_resume_after_kill_is_identical(tmp_path):
    """Fault-injection light (SURVEY.md §5.3): run 1 of 2 timesteps, then
    'crash' and resume — the final model must match an uninterrupted run."""
    dp, _ = make_dp()
    cfg = small_config(tmp_path)
    pipe = InversionPipeline(dp, cfg)
    sol_full = pipe.run(resume=False)

    # fresh pipeline, simulate crash after t=0 by manufacturing the same
    # checkpoint state the interrupted run would have left
    import shutil
    shutil.rmtree(cfg.runtime.checkpoint_dir)
    ckpt.save_checkpoint(cfg.runtime.checkpoint_dir, 1,
                         {"m_seq": sol_full.m[:1]}, cfg.to_json())
    pipe2 = InversionPipeline(dp, cfg)
    sol_resumed = pipe2.run(resume=True)
    np.testing.assert_allclose(sol_resumed.m[0], sol_full.m[0], atol=0)
    np.testing.assert_allclose(sol_resumed.m[1], sol_full.m[1], atol=1e-5)


def test_pipeline_kalman_mode(tmp_path):
    dp, truth = make_dp(n_times=3)
    dp.wind_kmps = truth["wind_kmps"]
    cfg = small_config(tmp_path, solver="kalman")
    pipe = InversionPipeline(dp, cfg)
    sol = pipe.run(resume=False)
    assert sol.m.shape[0] == 3
    assert (sol.diagnostics["post_residuals"]
            < sol.diagnostics["pre_residuals"]).all()


def test_pipeline_kalman_estimates_wind_when_absent(tmp_path):
    dp, truth = make_dp(n_times=3)
    assert not hasattr(dp, "wind_kmps")
    cfg = small_config(tmp_path, solver="kalman")
    pipe = InversionPipeline(dp, cfg)
    sol = pipe.run(resume=False)
    assert sol.m.shape[0] == 3
    recs = [r for r in pipe.metrics.read_all()
            if r.get("event") == "wind_estimated"]
    assert len(recs) == 1
    assert np.isfinite(recs[0]["wind_kmps"]).all()


def test_pipeline_bent_ray_mode(tmp_path):
    """bent=True traces Fermat paths through the prior model and inverts
    along them; at 150 MHz the result must closely match the straight-ray
    solve (small bending), validating the frozen-path linearisation."""
    dp, _ = make_dp(n_times=1)
    cfg = small_config(tmp_path)
    import dataclasses
    from ionotomo_tpu.config import RayConfig
    cfg_bent = dataclasses.replace(
        cfg, rays=RayConfig(n_samples=33, n_steps=32, bent=True))
    sol_s = InversionPipeline(dp, cfg).run(resume=False)
    import shutil
    shutil.rmtree(cfg.runtime.checkpoint_dir)
    sol_b = InversionPipeline(dp, cfg_bent).run(resume=False)
    assert np.isfinite(sol_b.m).all()
    # same reconstruction to within the (small) bending difference
    scale = np.abs(sol_s.m).max()
    assert np.abs(sol_b.m - sol_s.m).max() < 0.05 * scale


def test_pipeline_ignores_flagged_data(tmp_path):
    """Corrupt + flag a block of observations: the solve must match the
    clean solve (flags soft-mask via noise inflation)."""
    import shutil
    dp, _ = make_dp(n_times=1)
    cfg = small_config(tmp_path)
    dp.flags[3, 0, :] = True
    sol_flag_clean = InversionPipeline(dp, cfg).run(resume=False)

    # corrupt the flagged entries: solution must not move
    shutil.rmtree(cfg.runtime.checkpoint_dir)
    dp.dtec[3, 0, :] += 1e4
    sol_flag_bad = InversionPipeline(dp, cfg).run(resume=False)
    scale = np.abs(sol_flag_clean.m).max()
    assert np.abs(sol_flag_bad.m - sol_flag_clean.m).max() < 1e-4 * scale

    # sanity: without the flag the same garbage corrupts the solve
    shutil.rmtree(cfg.runtime.checkpoint_dir)
    dp.flags[3, 0, :] = False
    sol_bad = InversionPipeline(dp, cfg).run(resume=False)
    assert np.abs(sol_bad.m - sol_flag_clean.m).max() > 1e-2 * scale


def test_checkpoint_atomicity_and_latest(tmp_path):
    d = str(tmp_path / "c")
    ckpt.save_checkpoint(d, 1, {"x": np.arange(4)}, '{"a":1}')
    ckpt.save_checkpoint(d, 7, {"x": np.arange(4) * 2}, '{"a":2}')
    step, state, cfg = ckpt.resume(d)
    assert step == 7
    np.testing.assert_array_equal(state["x"], np.arange(4) * 2)
    assert cfg == '{"a":2}'
    # no tmp droppings
    import os
    assert all(not f.endswith(".tmp") for f in os.listdir(d))


def test_resume_skips_corrupt_newest_checkpoint(tmp_path):
    d = str(tmp_path / "c")
    ckpt.save_checkpoint(d, 1, {"x": np.arange(3)}, "{}")
    ckpt.save_checkpoint(d, 2, {"x": np.arange(3) * 2}, "{}")
    # corrupt the newest file in place (simulating a hard-kill mid-flush)
    newest = ckpt.latest_checkpoint(d)
    with open(newest, "wb") as f:
        f.write(b"garbage")
    step, state, cfg = ckpt.resume(d)
    assert step == 1
    np.testing.assert_array_equal(state["x"], np.arange(3))


def test_config_json_roundtrip():
    cfg = EngineConfig(grid=GridConfig(shape=(32, 16, 8)))
    cfg2 = EngineConfig.from_json(cfg.to_json())
    assert cfg2 == cfg
    assert cfg2.grid.shape == (32, 16, 8)


def test_pipeline_kalman_chunked_matches_single_scan(tmp_path):
    """kalman_chunk must not change the filter: chunked scans chained via
    advect_first/m_clim are the same program as one long scan."""
    dp, truth = make_dp(n_times=4)
    dp.wind_kmps = truth["wind_kmps"]
    import shutil
    cfg1 = small_config(tmp_path, solver="kalman", kalman_chunk=100)
    sol_one = InversionPipeline(dp, cfg1).run(resume=False)
    shutil.rmtree(cfg1.runtime.checkpoint_dir)
    cfg2 = small_config(tmp_path, solver="kalman", kalman_chunk=2)
    sol_chunk = InversionPipeline(dp, cfg2).run(resume=False)
    np.testing.assert_allclose(sol_chunk.m, sol_one.m, atol=1e-6)
    np.testing.assert_allclose(sol_chunk.diagnostics["pre_residuals"],
                               sol_one.diagnostics["pre_residuals"],
                               rtol=1e-5)


def test_pipeline_kalman_resume_after_kill_is_identical(tmp_path):
    """Kill the filter mid-sequence: resume must continue from the chunk
    checkpoint and produce the uninterrupted result (VERDICT r1 #5)."""
    dp, truth = make_dp(n_times=4)
    dp.wind_kmps = truth["wind_kmps"]
    cfg = small_config(tmp_path, solver="kalman", kalman_chunk=1)
    pipe = InversionPipeline(dp, cfg)
    sol_full = pipe.run(resume=False)

    # simulate the kill: keep only the checkpoint written after timestep 2
    import os, shutil
    d = cfg.runtime.checkpoint_dir
    for name in os.listdir(d):
        if name != "ckpt_00000002.npz":
            os.unlink(os.path.join(d, name))
    sol_resumed = InversionPipeline(dp, cfg).run(resume=True)
    np.testing.assert_allclose(sol_resumed.m[:2], sol_full.m[:2], atol=0)
    np.testing.assert_allclose(sol_resumed.m[2:], sol_full.m[2:], atol=1e-5)
    np.testing.assert_allclose(sol_resumed.diagnostics["post_residuals"],
                               sol_full.diagnostics["post_residuals"],
                               rtol=1e-4)


def test_pipeline_refuses_mismatched_checkpoint_config(tmp_path):
    """A stale checkpoint directory from a different run must be ignored,
    not warm-started from (ADVICE r1)."""
    dp, _ = make_dp()
    cfg = small_config(tmp_path)
    sol_clean = InversionPipeline(dp, cfg).run(resume=False)

    # stale directory: only a checkpoint from a run with a different prior
    import shutil
    shutil.rmtree(cfg.runtime.checkpoint_dir)
    other = dataclasses.replace(cfg, prior=PriorConfig(sigma=0.9))
    ckpt.save_checkpoint(cfg.runtime.checkpoint_dir, 1,
                         {"m_seq": sol_clean.m[:1] * 7.0}, other.to_json())
    pipe = InversionPipeline(dp, cfg)
    sol = pipe.run(resume=True)
    np.testing.assert_allclose(sol.m, sol_clean.m, atol=1e-6)
    events = [r for r in pipe.metrics.read_all()
              if r.get("event") == "checkpoint_config_mismatch"]
    assert len(events) == 1


def test_pipeline_resume_accepts_runtime_only_config_change(tmp_path):
    """Runtime fields (paths, cadence) may differ between the checkpoint
    and the resuming run — only physics/solver fields gate resume."""
    dp, _ = make_dp()
    cfg = small_config(tmp_path)
    pipe = InversionPipeline(dp, cfg)
    sol_full = pipe.run(resume=False)
    cfg2 = dataclasses.replace(
        cfg, runtime=RuntimeConfig(
            checkpoint_dir=cfg.runtime.checkpoint_dir,
            metrics_path=str(tmp_path / "other.jsonl"),
            checkpoint_every=5))
    pipe2 = InversionPipeline(dp, cfg2)
    sol2 = pipe2.run(resume=True)   # full checkpoint: nothing to redo
    np.testing.assert_allclose(sol2.m, sol_full.m, atol=0)


def test_pipeline_bent_retrace_mode_runs(tmp_path):
    """retrace_every>0 re-traces rays through the iterate (the reference's
    calc_rays-inside-the-loop); smoke: runs, finite, logs retraces."""
    dp, _ = make_dp(n_times=1)
    cfg = small_config(tmp_path)
    cfg = dataclasses.replace(
        cfg, rays=RayConfig(n_samples=33, n_steps=24, bent=True,
                            retrace_every=1),
        solver=SolverConfig(gn_iters=2, cg_iters=10))
    pipe = InversionPipeline(dp, cfg)
    m_t, diag = pipe.solve_snapshot(0)
    assert np.isfinite(np.asarray(m_t)).all()
    assert diag["retraces"] >= 1


def test_pipeline_batched_gn_matches_per_snapshot(tmp_path):
    """batched_gn (one vmapped program over timesteps, SURVEY §2.1 P2)
    must reproduce the independent per-snapshot solves."""
    dp, _ = make_dp(n_times=3)
    cfg = small_config(tmp_path, solver="batched_gn")
    pipe = InversionPipeline(dp, cfg)
    sol = pipe.run(resume=False)
    assert sol.m.shape[0] == 3

    cfg2 = small_config(tmp_path)
    pipe2 = InversionPipeline(dp, cfg2)
    prior = np.asarray(pipe2.m_prior)
    for t in range(3):
        m_t, _ = pipe2.solve_snapshot(t)      # independent (no warm chain)
        # vmap changes f32 reduction order; truncated CG amplifies it —
        # compare against the reconstruction delta (cf. test_multichip)
        delta = np.abs(np.asarray(m_t) - prior).max()
        assert np.abs(sol.m[t] - np.asarray(m_t)).max() < 0.05 * delta
    recs = [r for r in pipe.metrics.read_all()
            if r.get("solver") == "batched_gn"]
    assert len(recs) == 1 and recs[0]["timesteps"] == 3


def test_pipeline_enkf_chunked_and_resumable(tmp_path):
    """EnKF pipeline mode: chunked scans equal one scan (global-step keyed
    randomness + ensemble carry), and a kill-resume continues identically."""
    import shutil, os
    dp, truth = make_dp(n_times=4)
    dp.wind_kmps = truth["wind_kmps"]
    cfg1 = small_config(tmp_path, solver="enkf", kalman_chunk=100,
                        enkf_members=4)
    sol_one = InversionPipeline(dp, cfg1).run(resume=False)
    assert sol_one.m.shape[0] == 4
    assert sol_one.diagnostics["std_seq"].shape == sol_one.m.shape
    assert np.isfinite(sol_one.diagnostics["std_seq"]).all()

    shutil.rmtree(cfg1.runtime.checkpoint_dir)
    cfg2 = small_config(tmp_path, solver="enkf", kalman_chunk=2,
                        enkf_members=4)
    sol_chunk = InversionPipeline(dp, cfg2).run(resume=False)
    np.testing.assert_allclose(sol_chunk.m, sol_one.m, atol=1e-6)
    np.testing.assert_allclose(sol_chunk.diagnostics["std_seq"],
                               sol_one.diagnostics["std_seq"], atol=1e-6)

    # kill after the first chunk: keep only ckpt at step 2, resume
    d = cfg2.runtime.checkpoint_dir
    for name in os.listdir(d):
        if name != "ckpt_00000002.npz":
            os.unlink(os.path.join(d, name))
    sol_res = InversionPipeline(dp, cfg2).run(resume=True)
    np.testing.assert_allclose(sol_res.m, sol_one.m, atol=1e-5)


def test_resume_accepts_checkpoint_from_older_config_schema(tmp_path):
    """Checkpoints written before new SolverConfig fields existed must
    stay resumable: compatibility compares configs after a from_json
    round-trip so missing keys pick up defaults (advisor r2)."""
    import json
    dp, _ = make_dp()
    cfg = small_config(tmp_path)
    pipe = InversionPipeline(dp, cfg)
    sol_full = pipe.run(resume=False)

    # rewrite the newest checkpoint with a config json LACKING the
    # enkf_* fields (an old-schema checkpoint)
    old_raw = json.loads(cfg.to_json())
    for k in ("enkf_members", "enkf_inflation", "enkf_process_sigma"):
        old_raw["solver"].pop(k)
    import shutil
    shutil.rmtree(cfg.runtime.checkpoint_dir)
    ckpt.save_checkpoint(cfg.runtime.checkpoint_dir, 1,
                         {"m_seq": sol_full.m[:1]}, json.dumps(old_raw))
    pipe2 = InversionPipeline(dp, cfg)
    sol = pipe2.run(resume=True)
    np.testing.assert_allclose(sol.m[0], sol_full.m[0], atol=0)  # resumed
    events = [r for r in pipe2.metrics.read_all()
              if r.get("event") == "checkpoint_config_mismatch"]
    assert not events


def test_pipeline_multi_chapman_apriori(tmp_path):
    """apriori_model='multi_chapman' builds the E/F1/F2 prior: the
    pipeline runs, the prior differs from single-Chapman below the F2
    bottomside (where E/F1 add density), and the config round-trips."""
    import dataclasses
    from ionotomo_tpu.config import PhysicsConfig

    dp, _ = make_dp(n_times=1)
    cfg1 = small_config(tmp_path)
    cfg2 = dataclasses.replace(
        cfg1, physics=PhysicsConfig(apriori_model="multi_chapman"),
        runtime=dataclasses.replace(cfg1.runtime,
                                    checkpoint_dir=str(tmp_path / "c2"),
                                    metrics_path=str(tmp_path / "m2.jsonl")))
    assert EngineConfig.from_json(cfg2.to_json()) == cfg2
    p1 = InversionPipeline(dp, cfg1)
    p2 = InversionPipeline(dp, cfg2)
    zax = np.asarray(p1.grid.axes()[2])
    low = (zax > 90) & (zax < 220)
    pri1 = np.asarray(p1.m_prior)[..., low]
    pri2 = np.asarray(p2.m_prior)[..., low]
    assert (pri2 > pri1).mean() > 0.95
    sol = p2.run(resume=False)
    assert np.isfinite(np.asarray(sol.m)).all()


def test_pipeline_profile_dir_captures_trace(tmp_path):
    """runtime.profile_dir: the run writes a jax.profiler trace there."""
    import dataclasses
    import glob
    import os
    dp, _ = make_dp(n_times=1)
    cfg = small_config(tmp_path)
    cfg = dataclasses.replace(
        cfg, runtime=dataclasses.replace(
            cfg.runtime, profile_dir=str(tmp_path / "trace")))
    sol = InversionPipeline(dp, cfg).run(resume=False)
    assert np.isfinite(np.asarray(sol.m)).all()
    files = glob.glob(str(tmp_path / "trace" / "**" / "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files), files


def test_run_anchor_state_does_not_leak_between_runs(tmp_path):
    """run(anchors=a) then run() on the same pipeline must equal a fresh
    unanchored run (anchor state and the assimilated prior are reset)."""
    import jax.numpy as jnp
    from ionotomo_tpu.forward import tec as tec_mod
    from ionotomo_tpu.inversion import anchors as anch

    dp, truth = generate_example_datapack(n_antennas=6, n_directions=4,
                                          n_times=1, grid_shape=(14, 14, 14))
    def cfg(sub):
        return EngineConfig(
            grid=GridConfig(shape=(14, 14, 14)), rays=RayConfig(n_samples=17),
            solver=SolverConfig(gn_iters=1, cg_iters=6),
            runtime=RuntimeConfig(
                checkpoint_dir=str(tmp_path / sub / "c"),
                metrics_path=str(tmp_path / sub / "m.jsonl")))
    pipe = InversionPipeline(dp, cfg("a"))
    bundle = anch.vertical_anchor_bundle(pipe.grid, nx=2, ny=2, n_samples=17)
    v = tec_mod.tec(jnp.asarray(truth["m"][0]), truth["grid"], bundle)
    a = anch.TecAnchors(rays=bundle, values=v, noise_std=jnp.float32(10.0))
    sol_anch = pipe.run(resume=False, anchors=a)
    sol_after = pipe.run(resume=False)                 # no anchors now
    pipe_fresh = InversionPipeline(dp, cfg("b"))
    sol_fresh = pipe_fresh.run(resume=False)
    assert not np.allclose(sol_anch.m, sol_fresh.m)    # anchors did act
    np.testing.assert_allclose(sol_after.m, sol_fresh.m, atol=1e-6)

    # joint mode with a non-GN solver refuses instead of silently ignoring
    import pytest as _pytest
    cfg_l = EngineConfig(
        grid=GridConfig(shape=(14, 14, 14)), rays=RayConfig(n_samples=17),
        solver=SolverConfig(solver="lsqr_smoothness"),
        runtime=RuntimeConfig(checkpoint_dir=str(tmp_path / "c2"),
                              metrics_path=str(tmp_path / "m2.jsonl")))
    with _pytest.raises(ValueError, match="joint"):
        InversionPipeline(dp, cfg_l).run(resume=False, anchors=a,
                                         anchor_mode="joint")


def test_anisotropic_prior_through_config_and_resume_roundtrip(tmp_path):
    """PriorConfig.length_scale_km accepts (Lx, Ly, Lz); the config
    serialises into checkpoints and the resume compatibility check still
    matches after the tuple→list JSON round-trip."""
    dp, _ = generate_example_datapack(n_antennas=5, n_directions=3,
                                      n_times=1, grid_shape=(12, 12, 12))
    cfg = EngineConfig(
        grid=GridConfig(shape=(12, 12, 12)), rays=RayConfig(n_samples=17),
        prior=PriorConfig(kind="sqexp",
                          length_scale_km=(150.0, 150.0, 40.0)),
        solver=SolverConfig(gn_iters=1, cg_iters=5),
        runtime=RuntimeConfig(checkpoint_dir=str(tmp_path / "c"),
                              metrics_path=str(tmp_path / "m.jsonl")))
    pipe = InversionPipeline(dp, cfg)
    assert tuple(np.atleast_1d(pipe.cov.length_scale)) == (150.0, 150.0,
                                                           40.0)
    sol = pipe.run(resume=False)
    assert np.isfinite(sol.m).all()
    # resume check passes across the JSON round-trip
    pipe2 = InversionPipeline(dp, cfg)
    assert pipe2._config_compatible(cfg.to_json())


def test_pipeline_kalman_mixed_fidelity(tmp_path):
    """RayConfig.inner_samples plumbs mixed-fidelity updates through the
    kalman pipeline mode: runs, reduces residuals, and stays close to the
    full-fidelity filtered sequence."""
    dp, truth = make_dp(n_times=3)
    cfg = small_config(tmp_path, solver="kalman")
    sol_full = InversionPipeline(dp, cfg).run(resume=False)
    cfg_m = dataclasses.replace(cfg, rays=dataclasses.replace(
        cfg.rays, inner_samples=17))
    sol_m = InversionPipeline(dp, cfg_m).run(resume=False)
    assert sol_m.m.shape == sol_full.m.shape
    assert np.isfinite(sol_m.m).all()
    upd = np.sqrt(np.mean((sol_full.m[-1] - sol_full.m[0]) ** 2))
    # same world, same filter — the coarse-Jacobian sequence tracks the
    # full one to a fraction of the inter-step update scale
    diff = np.sqrt(np.mean((sol_m.m[-1] - sol_full.m[-1]) ** 2))
    assert diff < 0.5 * max(upd, 1e-6), (diff, upd)


def test_pipeline_kalman_wind_adaptation_chunked(tmp_path):
    """SolverConfig.wind_adapt_iters through the pipeline: runs, carries
    the refined wind across chunks (and into checkpoints), and the
    chunked run tracks the single-scan run closely. (Exact bitwise chunk
    parity holds for equal-length chunk programs — asserted in
    test_kalman.test_wind_adaptation_recovers_drift; different scan
    lengths fuse differently and the wind feedback amplifies the f32
    jitter, so cross-chunk-size comparison is tight-tolerance.)"""
    dp, truth = make_dp(n_times=3)
    cfg1 = small_config(tmp_path / "a", solver="kalman", kalman_chunk=100,
                        wind_adapt_iters=2)
    sol1 = InversionPipeline(dp, cfg1).run(resume=False)
    cfg2 = small_config(tmp_path / "b", solver="kalman", kalman_chunk=1,
                        wind_adapt_iters=2)
    sol2 = InversionPipeline(dp, cfg2).run(resume=False)
    upd = np.sqrt(np.mean((sol1.m[-1] - sol1.m[0]) ** 2))
    diff = np.sqrt(np.mean((sol1.m[-1] - sol2.m[-1]) ** 2))
    assert diff < 0.05 * max(upd, 1e-6), (diff, upd)
    # checkpoint carries the refined (not bootstrap) wind
    step, state, _ = ckpt.resume(cfg2.runtime.checkpoint_dir)
    assert step == 3
    assert np.isfinite(state["wind_kmps"]).all()
    w1 = ckpt.resume(cfg1.runtime.checkpoint_dir)[1]["wind_kmps"]
    np.testing.assert_allclose(state["wind_kmps"], w1, atol=5e-3)

def test_pipeline_kalman_wind_shear_state(tmp_path):
    """SolverConfig.wind_shear: the pipeline promotes the bootstrap wind
    to the (2,3) rigid+shear advection state, the filter runs and
    checkpoints it, and a checkpoint resume passes the already-promoted
    state through unchanged (no double promotion)."""
    dp, truth = make_dp(n_times=3)
    cfg = small_config(tmp_path / "s", solver="kalman", kalman_chunk=2,
                       wind_adapt_iters=1, wind_shear=True)
    pipe = InversionPipeline(dp, cfg)
    sol = pipe.run(resume=False)
    assert np.isfinite(sol.m).all()
    step, state, _ = ckpt.resume(cfg.runtime.checkpoint_dir)
    assert step == 3
    assert state["wind_kmps"].shape == (2, 3)
    assert np.isfinite(state["wind_kmps"]).all()
    # resume mid-sequence: promoted state accepted as-is
    import os
    ck = sorted(os.listdir(cfg.runtime.checkpoint_dir))
    # drop the final checkpoint so resume continues from step 2
    for f in ck:
        if f.endswith(".npz") and "0003" in f:
            os.remove(os.path.join(cfg.runtime.checkpoint_dir, f))
    pipe2 = InversionPipeline(dp, cfg)
    sol2 = pipe2.run(resume=True)
    np.testing.assert_allclose(sol2.m[-1], sol.m[-1], atol=1e-5)


def test_pipeline_snapshot_posterior_std(tmp_path):
    """solver.posterior_samples > 0: the snapshot run stores a per-voxel
    posterior std per timestep (RTO draws — pipeline.posterior_std),
    deterministic for a fixed seed, checkpointed under m_std, and the
    resumed run reproduces the uninterrupted std sequence exactly."""
    dp, _ = make_dp()
    cfg = small_config(tmp_path, posterior_samples=4)
    pipe = InversionPipeline(dp, cfg)
    sol = pipe.run(resume=False)
    std = sol.diagnostics["std_seq"]
    assert std.shape == sol.m.shape
    assert np.isfinite(std).all() and (std > 0).all()
    # the posterior contracts: sampled spread must sit below the prior
    # sigma on average (and nowhere blow past it by more than sampling
    # noise at 4 draws)
    assert std.mean() < 0.3
    assert std.max() < 0.3 * 2.5

    recs = [r for r in pipe.metrics.read_all()
            if "posterior_std_mean" in r]
    assert len(recs) == 2

    # determinism: a fresh pipeline reproduces the std bit-exactly
    pipe_b = InversionPipeline(dp, cfg)
    sol_b = pipe_b.run(resume=False)
    np.testing.assert_array_equal(sol_b.diagnostics["std_seq"], std)

    # crash-resume identity, including the std sequence
    import shutil
    shutil.rmtree(cfg.runtime.checkpoint_dir)
    ckpt.save_checkpoint(cfg.runtime.checkpoint_dir, 1,
                         {"m_seq": sol.m[:1], "m_std": std[:1]},
                         cfg.to_json())
    pipe2 = InversionPipeline(dp, cfg)
    sol2 = pipe2.run(resume=True)
    np.testing.assert_array_equal(sol2.diagnostics["std_seq"][0], std[0])
    np.testing.assert_allclose(sol2.diagnostics["std_seq"][1], std[1],
                               atol=1e-5)
    # solution round-trips with the std diagnostic
    p = tmp_path / "sol.h5"
    sol.save(p)
    assert np.array_equal(Solution.load(p).diagnostics["std_seq"], std)


def test_pipeline_kalman_noise_adaptation(tmp_path):
    """solver.noise_adapt_every: a world whose actual observation noise
    is 3x the datapack's claimed noise_std — the adaptive filter's
    evidence events must recover the inflation (checkpointed
    noise_scale ~ 3), not hurt skill vs the static filter, and the
    crash-resumed run must reproduce the adapted run exactly."""
    dp, truth = make_dp(n_times=4)
    dp.noise_std = dp.noise_std / 3.0   # claim 3x less noise than injected

    def run(sub, **kw):
        cfg = small_config(tmp_path / sub, solver="kalman",
                           kalman_chunk=2, **kw)
        pipe = InversionPipeline(dp, cfg)
        return pipe, cfg, pipe.run(resume=False)

    pipe_s, _, sol_s = run("static")
    pipe_a, cfg_a, sol_a = run("adapt", noise_adapt_every=1)

    events = [r for r in pipe_a.metrics.read_all()
              if r.get("event") == "noise_adapted"]
    assert len(events) == 1     # warm chunk boundaries only (c0=2; the
                                # cold c0=0 innovation is all signal)
    scale = events[-1]["noise_scale"]
    assert 1.8 < scale < 5.0, events
    step, state, _ = ckpt.resume(cfg_a.runtime.checkpoint_dir)
    assert step == 4
    assert float(state["noise_scale"]) == scale

    # correct R must not hurt the reconstruction (the static filter
    # overweights what is actually noise)
    err_s = float(np.sqrt(((sol_s.m[-1] - truth["m"]) ** 2).mean()))
    err_a = float(np.sqrt(((sol_a.m[-1] - truth["m"]) ** 2).mean()))
    assert err_a <= err_s * 1.02, (err_a, err_s)

    # crash-resume identity including the adapted scale
    import os
    for f in sorted(os.listdir(cfg_a.runtime.checkpoint_dir)):
        if f.endswith(".npz") and "0004" in f:
            os.remove(os.path.join(cfg_a.runtime.checkpoint_dir, f))
    pipe2 = InversionPipeline(dp, cfg_a)
    sol2 = pipe2.run(resume=True)
    np.testing.assert_allclose(sol2.m[-1], sol_a.m[-1], atol=1e-5)


def test_pipeline_beam_noise_inflation_and_determinism(tmp_path):
    """VERDICT r3 #5 plumbing: ``rays.beam_noise > 0`` traces a stochastic
    Fresnel beam per epoch through the prior field, inflates C_d in
    quadrature with the chaotic dTEC spread, and logs a ``beam_noise``
    metrics event per timestep. The beam key derives from (run seed,
    epoch index), so a fresh run of the same config is bit-identical —
    the chunked/resume contract the docstrings promise. The measured
    strong-turbulence skill comparison (beam vs uninflated vs globally
    inflated C_d) lives in bench/probe_beam.py; this test pins the
    production wiring."""
    dp, _ = make_dp()
    cfg = small_config(tmp_path / "a")
    cfg = dataclasses.replace(
        cfg, rays=dataclasses.replace(cfg.rays, beam_noise=3))
    pipe = InversionPipeline(dp, cfg)
    sol = pipe.run(resume=False)

    evs = [r for r in pipe.metrics.read_all()
           if r.get("event") == "beam_noise"]
    assert len(evs) == 2                      # one per timestep
    for e in evs:
        assert np.isfinite(e["mean"]) and e["mean"] >= 0.0
        assert e["max"] >= e["mean"]
        assert e["n_paths"] == 3

    # keyed beams: an independent run reproduces the solution exactly
    cfg2 = dataclasses.replace(
        cfg, runtime=dataclasses.replace(
            cfg.runtime, checkpoint_dir=str(tmp_path / "b" / "ckpt"),
            metrics_path=str(tmp_path / "b" / "m.jsonl")))
    sol2 = InversionPipeline(dp, cfg2).run(resume=False)
    np.testing.assert_array_equal(sol2.m, sol.m)

    # the inflation enters the misfit: solution differs from beam_noise=0
    cfg0 = dataclasses.replace(
        cfg2, rays=dataclasses.replace(cfg2.rays, beam_noise=0),
        runtime=dataclasses.replace(
            cfg2.runtime, checkpoint_dir=str(tmp_path / "c" / "ckpt"),
            metrics_path=str(tmp_path / "c" / "m.jsonl")))
    sol0 = InversionPipeline(dp, cfg0).run(resume=False)
    assert np.abs(sol0.m - sol.m).max() > 0.0


def test_pipeline_kalman_diag_spectrum_events(tmp_path):
    """VERDICT r4 #5: ``diag_spectrum_every > 0`` surfaces the filter
    update operator's conditioning as a runtime diagnostic — an
    ``update_spectrum`` metrics event per selected chunk boundary with
    the randomized top-rank eigenvalues of I + C^½JᵀC_d⁻¹JC^½
    (kalman.update_operator_eigs). λ₁ lower-bounds the operator's κ
    (its spectrum sits in [1, λ₁]), so a deployment can see when it
    enters the rounding-amplification regime documented in
    test_multichip (3e5× at 1e-3 TECU noise) without any extra run."""
    dp, _ = make_dp(n_times=3)
    cfg = small_config(tmp_path, solver="kalman", cg_iters=8,
                       diag_spectrum_every=1, kalman_chunk=2)
    pipe = InversionPipeline(dp, cfg)
    pipe.run(resume=False)
    evs = [r for r in pipe.metrics.read_all()
           if r.get("event") == "update_spectrum"]
    assert len(evs) == 2                     # chunk starts t=0 and t=2
    for e in evs:
        lam = e["lam"]
        assert len(lam) == e["rank"]
        assert all(np.isfinite(v) for v in lam)
        # I + PSD: every eigenvalue >= 1 (up to randomized-Ritz slack)
        assert lam[0] >= lam[-1] >= 0.9
        assert e["kappa_bound"] >= 1.0
        assert abs(e["kappa_bound"] - lam[0]) < 1e-6 * max(lam[0], 1.0)
        assert e["t"] in (0, 2)
