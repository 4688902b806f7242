"""EpochService: directory-watching streaming service (serving.py) —
ingest-once semantics, per-epoch Solutions, and bit-identical restart."""
import json
import os

import numpy as np
import pytest

from ionotomo_tpu.config import (EngineConfig, GridConfig, PriorConfig,
                                 RayConfig, SolverConfig)
from ionotomo_tpu.data.synth import generate_example_datapack
from ionotomo_tpu.inversion.solution import Solution
from ionotomo_tpu.serving import EpochService


def _epoch_files(directory, n_files, nt_each=1, seed=0, start=0):
    paths = []
    for i in range(start, start + n_files):
        dp, _ = generate_example_datapack(
            n_antennas=6, n_directions=4, n_times=nt_each,
            mjd0=58000.45 + i * nt_each * 30.0 / 86400.0,
            grid_shape=(12, 12, 12), seed=seed, n_samples=17)
        p = os.path.join(directory, f"epoch_{i:03d}.h5")
        dp.save(p)
        paths.append(p)
    return paths


def _cfg():
    return EngineConfig(
        grid=GridConfig(shape=(14, 14, 14)),
        rays=RayConfig(n_samples=17),
        prior=PriorConfig(kind="sqexp", length_scale_km=90.0),
        solver=SolverConfig(solver="kalman", cg_iters=8))


def test_service_ingests_once_and_restarts_identically(tmp_path):
    watch = tmp_path / "in"; watch.mkdir()
    out_a = tmp_path / "out_a"; out_b = tmp_path / "out_b"
    _epoch_files(str(watch), 2, nt_each=2)

    # uninterrupted service over all files
    svc = EpochService(str(watch), str(out_a), _cfg())
    assert svc.process_available() == 4
    assert svc.process_available() == 0          # ingest-once
    _epoch_files(str(watch), 1, start=2)         # one more file appears
    assert svc.process_available() == 1

    # interrupted twin: process 2 files, "crash", resume from state.npz
    svc_b = EpochService(str(watch), str(out_b), _cfg())
    # hide the last file to emulate arrival order
    os.rename(watch / "epoch_002.h5", tmp_path / "stash.h5")
    assert svc_b.process_available() == 4
    del svc_b
    os.rename(tmp_path / "stash.h5", watch / "epoch_002.h5")
    svc_b2 = EpochService(str(watch), str(out_b), _cfg())   # restart
    assert svc_b2.filter.t == 4                  # state restored
    assert svc_b2.process_available() == 1

    # outputs: 5 epochs, identical between the two services
    for d in (out_a, out_b):
        names = sorted(f for f in os.listdir(d) if f.startswith("epoch_"))
        assert names == [f"epoch_{i:06d}.h5" for i in range(5)]
    for i in range(5):
        sa = Solution.load(out_a / f"epoch_{i:06d}.h5")
        sb = Solution.load(out_b / f"epoch_{i:06d}.h5")
        np.testing.assert_allclose(sa.m, sb.m, atol=0)

    # diagnostics stream has one record per epoch
    recs = [json.loads(l) for l in open(out_a / "epochs.jsonl")]
    assert [r["epoch"] for r in recs] == list(range(5))
    assert all("pre_residual" in r for r in recs)


def test_service_enkf_emits_spread(tmp_path):
    watch = tmp_path / "in"; watch.mkdir()
    out = tmp_path / "out"
    _epoch_files(str(watch), 1)
    cfg = EngineConfig(
        grid=GridConfig(shape=(12, 12, 12)), rays=RayConfig(n_samples=17),
        prior=PriorConfig(kind="sqexp", length_scale_km=90.0),
        solver=SolverConfig(solver="enkf", cg_iters=6, enkf_members=4))
    svc = EpochService(str(watch), str(out), cfg)
    assert svc.run(poll_s=0.01, max_epochs=1) == 1
    sol = Solution.load(out / "epoch_000000.h5")
    assert "std" in sol.diagnostics
    assert np.isfinite(sol.diagnostics["std"]).all()


def test_service_cadence_config_guard_and_unreadable_files(tmp_path):
    watch = tmp_path / "in"; watch.mkdir()
    out = tmp_path / "out"
    # two single-epoch files 10 s apart: the advection step must follow
    # the actual cadence, not a hard-coded default
    for i in range(2):
        dp, _ = generate_example_datapack(
            n_antennas=6, n_directions=4, n_times=1,
            mjd0=58000.45 + i * 10.0 / 86400.0,
            grid_shape=(12, 12, 12), n_samples=17)
        dp.save(watch / f"e{i}.h5")
    svc = EpochService(str(watch), str(out), _cfg())
    assert svc.process_available() == 2
    assert abs(svc.filter.dt_s - 10.0) < 0.01

    # partially-written file: logged, retried, service survives; later
    # files are NOT processed ahead of it (time order preserved)
    (watch / "e2.h5").write_bytes(b"not an hdf5 file")
    dp3, _ = generate_example_datapack(
        n_antennas=6, n_directions=4, n_times=1,
        mjd0=58000.45 + 30.0 / 86400.0, grid_shape=(12, 12, 12),
        n_samples=17)
    dp3.save(watch / "e3.h5")
    assert svc.process_available() == 0
    recs = [json.loads(l) for l in open(out / "epochs.jsonl")]
    assert any(r.get("event") == "unreadable" for r in recs)
    dp3.save(watch / "e2.h5")                    # producer finishes e2
    assert svc.process_available() == 2

    # restart under a different configuration refuses the stale state
    import dataclasses
    import pytest as _pytest
    cfg2 = dataclasses.replace(
        _cfg(), prior=dataclasses.replace(_cfg().prior, sigma=0.9))
    with _pytest.raises(ValueError, match="different engine config"):
        EpochService(str(watch), str(out), cfg2)
    # cadence survives a same-config restart (persisted in the state)
    svc2 = EpochService(str(watch), str(out), _cfg())
    assert svc2.last_mjd is not None


def test_service_out_of_order_epoch_no_advection_and_restart(tmp_path):
    """A later-arriving file whose time sorts BEFORE the last assimilated
    epoch (allowed by the ingest contract) must assimilate without
    advection (dt_s = 0, advect_periodic identity), not be advected by the
    stale previous cadence — and a restart must reproduce the same dt_s
    rather than resetting to the 30 s default (ADVICE r2)."""
    watch = tmp_path / "in"; watch.mkdir()
    out_a = tmp_path / "out_a"; out_b = tmp_path / "out_b"

    def mk(i, mjd):
        dp, _ = generate_example_datapack(
            n_antennas=6, n_directions=4, n_times=1, mjd0=mjd,
            grid_shape=(12, 12, 12), seed=i, n_samples=17)
        dp.save(watch / f"z{i}.h5")

    # files named so sorted order is z0, z1, z2 but z1's TIME precedes
    # z0's (an out-of-order arrival) — needs nonzero wind to matter
    mk(0, 58000.45)
    mk(1, 58000.45 - 20.0 / 86400.0)
    svc = EpochService(str(watch), str(out_a), _cfg(),
                       wind_kmps=(0.5, 0.0, 0.0))
    assert svc.process_available() == 2
    assert svc.filter.dt_s == 0.0          # out-of-order: no advection
    del svc

    # restarted twin over the same stream, epoch-by-epoch
    svc_b = EpochService(str(watch), str(out_b), _cfg(),
                         wind_kmps=(0.5, 0.0, 0.0))
    assert svc_b.process_available() == 2
    del svc_b
    svc_b2 = EpochService(str(watch), str(out_b), _cfg(),
                          wind_kmps=(0.5, 0.0, 0.0))
    assert svc_b2.filter.dt_s == 0.0       # persisted, not reset to 30 s
    mk(2, 58000.45 + 40.0 / 86400.0)       # stream continues after restart
    assert svc_b2.process_available() == 1
    svc_a2 = EpochService(str(watch), str(out_a), _cfg(),
                          wind_kmps=(0.5, 0.0, 0.0))
    assert svc_a2.process_available() == 1
    for i in range(3):
        sa = Solution.load(out_a / f"epoch_{i:06d}.h5")
        sb = Solution.load(out_b / f"epoch_{i:06d}.h5")
        np.testing.assert_allclose(sa.m, sb.m, atol=0)


def test_concat_times_rejects_position_mismatch():
    from ionotomo_tpu.data.datapack import DataPack
    dp1, _ = generate_example_datapack(n_antennas=4, n_directions=2,
                                       n_times=1, grid_shape=(12, 12, 12),
                                       n_samples=9, seed=0)
    dp2, _ = generate_example_datapack(n_antennas=4, n_directions=2,
                                       n_times=1, mjd0=58000.46,
                                       grid_shape=(12, 12, 12),
                                       n_samples=9, seed=1)
    dp2.directions = dp1.directions.copy()       # same labels + dirs,
    import pytest as _pytest                      # different positions
    with _pytest.raises(AssertionError, match="position"):
        DataPack.concat_times([dp1, dp2])


def test_service_vtec_anchors_from_npz(tmp_path):
    """serve --vtec-anchors path: anchors built at bootstrap hold the
    filter's absolute level (values flow into every epoch's sub-update)."""
    import jax.numpy as jnp
    from ionotomo_tpu.forward import tec as tec_mod
    from ionotomo_tpu.inversion import anchors as anch

    watch = tmp_path / "in"; watch.mkdir()
    out = tmp_path / "out"
    _epoch_files(str(watch), 2)
    npz = tmp_path / "vtec.npz"
    np.savez(npz, points_xy=np.array([[-20.0, -20.0], [20.0, 20.0]]),
             values_tecu=np.array([25.0, 26.0]), noise_tecu=np.array(0.2))
    svc = EpochService(str(watch), str(out), _cfg(),
                       vtec_anchors_npz=str(npz))
    assert svc.process_available() == 2
    assert svc.filter.anchors is not None
    # the filtered field's VTEC at the anchor columns approaches the
    # anchored values (25-26 TECU = 25000-26000 working units)
    from ionotomo_tpu.inversion.solution import Solution
    sol = Solution.load(out / "epoch_000001.h5")
    bundle = anch.columns_bundle(svc.grid,
                                 [[-20.0, -20.0], [20.0, 20.0]])
    v = np.asarray(tec_mod.tec(jnp.asarray(sol.m[0]), svc.grid, bundle))
    np.testing.assert_allclose(v, [25000.0, 26000.0], rtol=0.10)


def test_service_anchor_restart_guard(tmp_path):
    """A restart with different/missing anchors refuses the stale state
    (anchors are part of the run's identity, like the config)."""
    import pytest as _pytest
    watch = tmp_path / "in"; watch.mkdir()
    out = tmp_path / "out"
    _epoch_files(str(watch), 1)
    npz = tmp_path / "vtec.npz"
    np.savez(npz, points_xy=np.array([[0.0, 0.0]]),
             values_tecu=np.array([30.0]), noise_tecu=np.array(0.5))
    svc = EpochService(str(watch), str(out), _cfg(),
                       vtec_anchors_npz=str(npz))
    assert svc.process_available() == 1
    with _pytest.raises(ValueError, match="anchors"):
        EpochService(str(watch), str(out), _cfg())      # anchors dropped
    np.savez(npz, points_xy=np.array([[5.0, 5.0]]),     # anchors changed
             values_tecu=np.array([30.0]), noise_tecu=np.array(0.5))
    with _pytest.raises(ValueError, match="anchors"):
        EpochService(str(watch), str(out), _cfg(),
                     vtec_anchors_npz=str(npz))
    # out-of-grid anchors are rejected up front
    np.savez(npz, points_xy=np.array([[5000.0, 0.0]]),
             values_tecu=np.array([30.0]), noise_tecu=np.array(0.5))
    watch2 = tmp_path / "in2"; watch2.mkdir()
    _epoch_files(str(watch2), 1)
    svc3 = EpochService(str(watch2), str(tmp_path / "out2"), _cfg(),
                        vtec_anchors_npz=str(npz))
    with _pytest.raises(ValueError, match="outside the grid"):
        svc3.process_available()


def test_service_time_varying_climatology(tmp_path):
    """physics.time_varying_clim: the per-epoch solar-modulated fade-pull
    target is wired through the service (outputs differ from the static-
    clim service across a multi-hour time span) and restarts stay
    bit-identical (the per-epoch clim depends only on file + config)."""
    import dataclasses
    from ionotomo_tpu.config import PhysicsConfig, SolverConfig

    watch = tmp_path / "in"; watch.mkdir()
    for i in range(3):
        dp, _ = generate_example_datapack(
            n_antennas=6, n_directions=4, n_times=1,
            mjd0=58000.45 + i * 3.0 / 24.0,        # 3-hour cadence
            grid_shape=(12, 12, 12), seed=i, n_samples=17)
        dp.save(watch / f"e{i}.h5")

    base = _cfg()
    cfg_tv = dataclasses.replace(
        base, physics=PhysicsConfig(time_varying_clim=True),
        solver=dataclasses.replace(base.solver, kalman_fade=0.6))
    cfg_st = dataclasses.replace(
        base, solver=dataclasses.replace(base.solver, kalman_fade=0.6))

    out_tv = tmp_path / "tv"; out_st = tmp_path / "st"
    assert EpochService(str(watch), str(out_tv),
                        cfg_tv).process_available() == 3
    assert EpochService(str(watch), str(out_st),
                        cfg_st).process_available() == 3
    m_tv = Solution.load(out_tv / "epoch_000002.h5").m
    m_st = Solution.load(out_st / "epoch_000002.h5").m
    assert np.abs(m_tv - m_st).max() > 1e-4     # the clim target moved

    # restart identity: interrupted twin reproduces the tv stream exactly
    out_b = tmp_path / "tv_b"
    os.rename(watch / "e2.h5", tmp_path / "stash.h5")
    assert EpochService(str(watch), str(out_b),
                        cfg_tv).process_available() == 2
    os.rename(tmp_path / "stash.h5", watch / "e2.h5")
    assert EpochService(str(watch), str(out_b),
                        cfg_tv).process_available() == 1
    for i in range(3):
        a = Solution.load(out_tv / f"epoch_{i:06d}.h5").m
        b = Solution.load(out_b / f"epoch_{i:06d}.h5").m
        np.testing.assert_array_equal(a, b)


def test_service_soundings_streaming_and_restart(tmp_path):
    """Streaming ionosonde assimilation (*.sounding.npz in the watch
    dir): held until the filter exists, assimilated once on arrival,
    folded into the climatology pull target, recorded in the JSONL, and
    bit-identical across a crash/restart."""
    import jax.numpy as jnp

    from ionotomo_tpu.data import ionosonde as iono
    from ionotomo_tpu.models import chapman

    watch = tmp_path / "in"; watch.mkdir()
    out_a = tmp_path / "out_a"; out_b = tmp_path / "out_b"
    _epoch_files(str(watch), 2)

    svc = EpochService(str(watch), str(out_a), _cfg())
    svc_b = EpochService(str(watch), str(out_b), _cfg())

    # a sounding arriving before any epoch is held while the filter
    # doesn't exist ("a0..." sorts before the epoch files, so the loop
    # visits it first), then assimilated by the end-of-poll revisit pass
    # in the SAME call that lands the epochs (ADVICE r3)
    np.savez(watch / "a0.sounding.npz",
             points_enu=np.array([[0.0, 0.0, 350.0]]),
             ne_m3=np.array([3e11]), noise_frac=np.array(0.05))
    assert svc.process_available() == 2
    assert "a0.sounding.npz" in svc.processed    # held, then ingested
    assert svc_b.process_available() == 2

    # build a sounding from a wrong-profile truth on the service grid
    grid = svc.grid
    m_true = chapman.log_parametrize(chapman.chapman_field(
        grid, h_peak_km=420.0))
    origin = np.asarray(grid.origin); span = np.asarray(
        grid.spacing) * (np.asarray(grid.shape) - 1)
    cx, cy = origin[0] + 0.5 * span[0], origin[1] + 0.5 * span[1]
    probes = iono.bottomside_probes(m_true, grid, [[cx, cy]],
                                    n_per_station=6, noise_log=0.05,
                                    seed=2)
    iono.probes_to_npz(watch / "a1.sounding.npz", probes)
    _epoch_files(str(watch), 1, start=2)

    m_clim_before = np.asarray(svc.filter.m_clim)
    assert svc.process_available() == 1     # epoch 2 + the a1 sounding
    assert "a1.sounding.npz" in svc.processed
    assert svc.process_available() == 0          # ingest-once
    # the learned correction is folded into the pull target
    assert not np.array_equal(np.asarray(svc.filter.m_clim),
                              m_clim_before)
    recs = [json.loads(l) for l in open(out_a / "epochs.jsonl")]
    snd = [r for r in recs if r.get("event") == "sounding"]
    assert [r["file"] for r in snd] == ["a0.sounding.npz",
                                       "a1.sounding.npz"]
    assert snd[1]["n_probes"] == 6
    assert all(r["mean_abs_dlogne"] > 0 for r in snd)

    # crash/restart twin: svc_b never sees the new files; a fresh
    # service over out_b must reproduce svc's stream bit-exactly
    del svc_b
    svc_b2 = EpochService(str(watch), str(out_b), _cfg())
    assert svc_b2.process_available() == 1
    for i in range(3):
        sa = Solution.load(out_a / f"epoch_{i:06d}.h5")
        sb = Solution.load(out_b / f"epoch_{i:06d}.h5")
        np.testing.assert_allclose(sa.m, sb.m, atol=0)
    np.testing.assert_array_equal(np.asarray(svc_b2.filter.m_clim),
                                  np.asarray(svc.filter.m_clim))
    np.testing.assert_array_equal(np.asarray(svc_b2._clim_delta),
                                  np.asarray(svc._clim_delta))

    # a permanently invalid sounding (out-of-grid) is recorded + skipped
    bad = iono.NeProbes(points=jnp.asarray([[1e5, 1e5, 300.0]]),
                        values=jnp.asarray([0.0]),
                        noise_std=jnp.asarray(0.05))
    iono.probes_to_npz(watch / "bad.sounding.npz", bad)
    assert svc.process_available() == 0
    assert "bad.sounding.npz" in svc.processed
    recs = [json.loads(l) for l in open(out_a / "epochs.jsonl")]
    assert any(r.get("event") == "bad_sounding" for r in recs)

def test_service_advice_r3_sounding_hardening(tmp_path):
    """ADVICE r3 regression battery for the sounding channel:
    (1) a held sounding sorting before the first epoch file is
    assimilated within the SAME process_available call that lands the
    epochs (run(max_epochs) can no longer exit with it pending);
    (2) a truncated/incomplete sounding npz is retried until its size is
    stable across two polls before being marked permanently bad;
    (3) sounding/bad_sounding/unreadable event records survive the
    restart JSONL prune;
    (4) restarting with different probe settings refuses."""
    watch = tmp_path / "in"; watch.mkdir()
    out = tmp_path / "out"

    # (1) sounding present BEFORE any epoch file: one call must land the
    # epochs AND the held sounding (the end-of-poll revisit pass)
    np.savez(watch / "a0.sounding.npz",
             points_enu=np.array([[0.0, 0.0, 350.0]]),
             ne_m3=np.array([3e11]), noise_frac=np.array(0.05))
    _epoch_files(str(watch), 1)
    svc = EpochService(str(watch), str(out), _cfg())
    assert svc.process_available() == 1
    assert "a0.sounding.npz" in svc.processed
    recs = [json.loads(l) for l in open(out / "epochs.jsonl")]
    assert any(r.get("event") == "sounding" for r in recs)

    # (2) an npz missing a schema member (what a truncated write looks
    # like once the zip directory exists): first poll retries, second
    # poll (size stable) marks it permanently bad
    np.savez(watch / "t0.sounding.npz",
             points_enu=np.array([[0.0, 0.0, 350.0]]))
    assert svc.process_available() == 0
    assert "t0.sounding.npz" not in svc.processed       # retried
    recs = [json.loads(l) for l in open(out / "epochs.jsonl")]
    assert any(r.get("event") == "unreadable"
               and r["file"] == "t0.sounding.npz" for r in recs)
    assert svc.process_available() == 0
    assert "t0.sounding.npz" in svc.processed           # size stable: bad
    recs = [json.loads(l) for l in open(out / "epochs.jsonl")]
    assert any(r.get("event") == "bad_sounding"
               and r["file"] == "t0.sounding.npz" for r in recs)

    # (3) restart: the event audit trail must survive the JSONL prune
    svc2 = EpochService(str(watch), str(out), _cfg())
    recs = [json.loads(l) for l in open(out / "epochs.jsonl")]
    assert any(r.get("event") == "sounding" for r in recs)
    assert any(r.get("event") == "bad_sounding" for r in recs)
    assert [r["epoch"] for r in recs if "epoch" in r] == [0]
    assert svc2.process_available() == 0

    # (4) different probe settings refuse to resume over the same state
    with pytest.raises(ValueError, match="probe"):
        EpochService(str(watch), str(out), _cfg(),
                     probe_update_clim=False)

def test_service_adaptive_r_streams_and_restarts(tmp_path):
    """Streaming adaptive R through the service (VERDICT r3 #3): with
    solver.adapt_r > 0 every epoch logs the learned r_scale, the scale
    persists in state.npz, and a killed/restarted service reproduces the
    adapted stream bit-exactly."""
    import dataclasses

    watch = tmp_path / "in"; watch.mkdir()
    out_a = tmp_path / "out_a"; out_b = tmp_path / "out_b"
    _epoch_files(str(watch), 3)
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, adapt_r=0.3))

    svc = EpochService(str(watch), str(out_a), cfg)
    assert svc.process_available() == 3
    recs = [json.loads(l) for l in open(out_a / "epochs.jsonl")]
    assert all("r_scale" in r for r in recs if "epoch" in r)
    assert svc.filter.r_scale != 1.0      # the EMA moved

    # interrupted twin: 2 epochs, crash, restart, finish
    svc_b = EpochService(str(watch), str(out_b), cfg)
    os.rename(watch / "epoch_002.h5", tmp_path / "stash.h5")
    assert svc_b.process_available() == 2
    del svc_b
    os.rename(tmp_path / "stash.h5", watch / "epoch_002.h5")
    svc_b2 = EpochService(str(watch), str(out_b), cfg)
    assert svc_b2.filter.r_scale != 1.0   # scale restored from state.npz
    assert svc_b2.process_available() == 1
    assert svc_b2.filter.r_scale == svc.filter.r_scale
    for i in range(3):
        sa = Solution.load(out_a / f"epoch_{i:06d}.h5")
        sb = Solution.load(out_b / f"epoch_{i:06d}.h5")
        np.testing.assert_array_equal(sa.m, sb.m)
    ra = [json.loads(l)["r_scale"] for l in open(out_a / "epochs.jsonl")
          if "epoch" in json.loads(l)]
    rb = [json.loads(l)["r_scale"] for l in open(out_b / "epochs.jsonl")
          if "epoch" in json.loads(l)]
    assert ra == rb


def test_service_diag_spectrum_events(tmp_path):
    """The serving twin of the pipeline's update-spectrum diagnostic
    (VERDICT r4 #5): with ``solver.diag_spectrum_every = N``, every N-th
    assimilated epoch logs an ``update_spectrum`` record into the
    epochs.jsonl stream — the deployment-facing view of the update
    operator's conditioning."""
    import dataclasses

    watch = tmp_path / "in"; watch.mkdir()
    out = tmp_path / "out"
    _epoch_files(str(watch), 3)
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, diag_spectrum_every=2))
    svc = EpochService(str(watch), str(out), cfg)
    assert svc.process_available() == 3
    recs = [json.loads(l) for l in open(out / "epochs.jsonl")]
    evs = [r for r in recs if r.get("event") == "update_spectrum"]
    assert [e["epoch"] for e in evs] == [0, 2]
    for e in evs:
        lam = e["lam"]
        assert lam[0] >= lam[-1] >= 0.9
        assert e["kappa_bound"] >= 1.0
    # the regular per-epoch records are untouched
    eps = [r for r in recs if "seconds" in r and "epoch" in r
           and r.get("event") is None]
    assert len(eps) == 3
