"""DataPack container, radio array, and synthetic-world tests
(SURVEY.md §4: the universal fixture is a small synthetic world)."""
import numpy as np

from ionotomo_tpu.data.datapack import DataPack
from ionotomo_tpu.data.radio_array import RadioArray, generate_lofar_like_array
from ionotomo_tpu.data.synth import generate_example_datapack


def test_lofar_like_array_layout():
    arr = generate_lofar_like_array()
    assert len(arr) == 62
    r = np.linalg.norm(arr.enu[:, :2], axis=1)
    assert r[:24].max() < 5.0          # core is compact
    assert r[24:].max() > 40.0         # remotes reach out
    assert np.abs(arr.enu[:, 2]).max() < 1.5  # near the tangent plane


def test_array_config_roundtrip(tmp_path):
    arr = generate_lofar_like_array(n_core=4, n_remote=4)
    p = tmp_path / "arr.cfg"
    arr.save_config(p)
    arr2 = RadioArray.load_config(str(p))
    np.testing.assert_allclose(arr2.itrs, arr.itrs, atol=1e-8)
    assert arr2.labels == arr.labels


def test_generate_example_datapack_and_hdf5_roundtrip(tmp_path):
    dp, truth = generate_example_datapack(
        n_antennas=8, n_directions=4, n_times=2, grid_shape=(24, 24, 24),
        noise_tecu=0.0, n_samples=33)
    assert dp.shape == (8, 2, 4)
    # reference antenna row is identically zero (noise-free)
    np.testing.assert_allclose(dp.dtec[dp.ref_antenna], 0.0, atol=1e-6)
    # non-reference antennas see structure
    assert np.abs(dp.dtec).max() > 1e-3
    # directions are above the horizon at all times
    d = dp.directions_enu()
    assert d.shape == (2, 4, 3)
    assert d[..., 2].min() > 0.3

    p = tmp_path / "dp.h5"
    dp.save(p)
    dp2 = DataPack.load(p)
    np.testing.assert_allclose(dp2.dtec, dp.dtec, atol=0)
    np.testing.assert_allclose(dp2.array.itrs, dp.array.itrs)
    assert dp2.ref_antenna == dp.ref_antenna
    np.testing.assert_allclose(dp2.times, dp.times)


def test_datapack_select_remaps_reference_antenna():
    dp, _ = generate_example_datapack(
        n_antennas=6, n_directions=3, n_times=1, grid_shape=(16, 16, 16),
        n_samples=17)
    sub = dp.select(antennas=[2, 0, 4], directions=[1, 2])
    assert sub.shape == (3, 1, 2)
    assert sub.ref_antenna == 1  # antenna 0 is now at position 1
    np.testing.assert_allclose(sub.dtec[:, 0, :],
                               dp.dtec[np.ix_([2, 0, 4], [0], [1, 2])][:, 0])


def test_noise_is_reproducible_and_scaled():
    dp1, _ = generate_example_datapack(n_antennas=5, n_directions=3,
                                       n_times=1, grid_shape=(16, 16, 16),
                                       noise_tecu=0.01, seed=7, n_samples=17)
    dp2, _ = generate_example_datapack(n_antennas=5, n_directions=3,
                                       n_times=1, grid_shape=(16, 16, 16),
                                       noise_tecu=0.01, seed=7, n_samples=17)
    np.testing.assert_allclose(dp1.dtec, dp2.dtec)
    assert np.all(dp1.noise_std > 0)


def test_datapack_select_rereferences_when_ref_dropped():
    """Dropping the reference antenna re-references the subset (exactly:
    T_i − T_j0 = d_i − d_j0), rather than silently pointing ref at row 0
    while the data stay referenced to the old antenna (ADVICE r1)."""
    dp, _ = generate_example_datapack(
        n_antennas=6, n_directions=3, n_times=2, grid_shape=(16, 16, 16),
        noise_tecu=0.0, n_samples=17)
    assert dp.ref_antenna == 0
    sub = dp.select(antennas=[3, 1, 4])          # drops antenna 0
    assert sub.ref_antenna == 0                  # new ref = first kept row
    # new reference row is identically zero
    np.testing.assert_allclose(sub.dtec[0], 0.0, atol=1e-12)
    # and the data equal dTEC referenced to antenna 3 directly
    want = dp.dtec[[3, 1, 4]] - dp.dtec[3:4]
    np.testing.assert_allclose(sub.dtec, want, atol=1e-12)
    # noise grew in quadrature for non-ref rows, stayed put for the ref row
    assert np.all(sub.noise_std[1:] >= dp.noise_std[[1, 4]])
    np.testing.assert_allclose(sub.noise_std[0], dp.noise_std[3])


def test_datapack_select_flags_propagate_from_new_ref():
    dp, _ = generate_example_datapack(
        n_antennas=5, n_directions=2, n_times=1, grid_shape=(16, 16, 16),
        n_samples=17)
    dp.flags[2, 0, 1] = True                     # will become the new ref
    sub = dp.select(antennas=[2, 3, 4])
    assert sub.flags[:, 0, 1].all()              # ref flag poisons the column
    assert not sub.flags[1:, 0, 0].any()


def test_datapack_frame_model_provenance(tmp_path):
    """The ICRS→ENU chain used to generate the data is persisted; files
    without the attribute (pre-upgrade) load as bare-GMST so their rays
    keep the geometry they were synthesized with (advisor r2)."""
    import h5py
    dp, _ = generate_example_datapack(
        n_antennas=4, n_directions=3, n_times=1, grid_shape=(12, 12, 12),
        n_samples=9)
    assert dp.frame_model == "iau2006"
    p = tmp_path / "dp.h5"
    dp.save(p)
    dp2 = DataPack.load(p)
    assert dp2.frame_model == "iau2006"
    np.testing.assert_allclose(dp2.directions_enu(), dp.directions_enu())

    # simulate a pre-upgrade file: drop the attribute
    with h5py.File(p, "a") as f:
        del f.attrs["frame_model"]
    dp3 = DataPack.load(p)
    assert dp3.frame_model == "gmst"
    # geometry differs measurably between the two chains at 2026 epochs
    a = dp2.directions_enu()
    b = dp3.directions_enu()
    assert np.abs(a - b).max() > 1e-4
    # select() propagates the provenance
    assert dp3.select(antennas=[0, 1]).frame_model == "gmst"


def test_phase_dtec_round_trip_and_unwrap():
    """phase() ↔ phase_to_dtec are exact inverses; from_phase recovers the
    dtec of a datapack from its (wrapped) phases when the time cadence
    keeps |dphi| < pi between epochs."""
    dp, _ = generate_example_datapack(
        n_antennas=5, n_directions=3, n_times=4, grid_shape=(12, 12, 12),
        noise_tecu=0.0, n_samples=17)
    # scale dtec so phases span multiple wraps but step < pi per epoch
    phase = dp.phase()
    scale = 4.0 / max(np.abs(phase).max(), 1e-9)
    dp.dtec = dp.dtec * scale
    phi = dp.phase()
    np.testing.assert_allclose(DataPack.phase_to_dtec(phi, dp.frequency_hz),
                               dp.dtec, rtol=1e-12)
    wrapped = np.angle(np.exp(1j * phi))
    dp2 = DataPack.from_phase(dp.array, dp.directions, dp.times, wrapped,
                              dp.frequency_hz)
    # unwrap recovers dtec up to a constant 2pi*k offset per (ant, dir)
    diff = dp2.dtec - dp.dtec
    per_series_spread = np.ptp(diff, axis=1)     # variation along time
    assert per_series_spread.max() < 1e-6 * max(np.abs(dp.dtec).max(), 1.0)


def test_multifrequency_phase_tec_fit():
    """Broadband TEC fit: exact recovery from noiseless multi-channel
    phases; with per-channel noise the fit beats every single channel and
    the derived noise_std matches the f_eff formula."""
    from ionotomo_tpu import constants
    from ionotomo_tpu.data.radio_array import generate_lofar_like_array
    from ionotomo_tpu.data.datapack import DataPack

    rng = np.random.default_rng(0)
    arr = generate_lofar_like_array(n_core=6, n_remote=2)
    na = len(arr)
    nt, nd, nf = 3, 4, 8
    dirs = np.stack([np.full(nd, 1.1), np.linspace(0.4, 0.6, nd)], -1)
    times = 58000.45 + np.arange(nt) / 1440.0
    dtec_true = rng.normal(scale=50.0, size=(na, nt, nd))
    dtec_true[0] = 0.0
    freqs = np.linspace(120e6, 180e6, nf)
    c = constants.PHASE_COEF * constants.TEC_SCALE
    phase = c * dtec_true[None] / freqs[:, None, None, None]

    dp = DataPack.from_multifrequency_phase(arr, dirs, times, phase,
                                            freqs, unwrap=False)
    np.testing.assert_allclose(dp.dtec, dtec_true, rtol=1e-10)
    assert dp.frequency_hz == freqs.min()

    sig = 0.05
    noisy = phase + rng.normal(scale=sig, size=phase.shape)
    dpn = DataPack.from_multifrequency_phase(arr, dirs, times, noisy,
                                             freqs, unwrap=False,
                                             phase_noise_rad=sig)
    err_fit = np.sqrt(np.mean((dpn.dtec - dtec_true) ** 2))
    for i in range(nf):
        err_one = np.sqrt(np.mean(
            (DataPack.phase_to_dtec(noisy[i], freqs[i]) - dtec_true) ** 2))
        assert err_fit < err_one
    f_eff = 1.0 / np.sqrt(np.sum(1.0 / freqs ** 2))
    want = sig * f_eff / c
    np.testing.assert_allclose(dpn.noise_std, want, rtol=1e-10)
    # and the fit error is statistically consistent with that noise level
    assert 0.7 * want < err_fit < 1.3 * want


def test_h5parm_roundtrip(tmp_path):
    """DataPack → losoto-layout h5parm → DataPack preserves geometry,
    values, flags and the differential-TEC invariant."""
    dp, _ = generate_example_datapack(n_antennas=6, n_directions=4,
                                      n_times=3, grid_shape=(16, 16, 16))
    dp.flags[2, 1, 1] = True
    p = tmp_path / "sols.h5"
    dp.to_h5parm(p)
    dp2 = DataPack.from_h5parm(p, noise_tecu=1e-3)
    assert dp2.shape == dp.shape
    # loading re-references (the ref row carries observation noise in the
    # synth world), so equality holds at the re-referenced level
    np.testing.assert_allclose(dp2.dtec, dp.dtec - dp.dtec[0:1],
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(dp2.directions, dp.directions, atol=1e-12)
    np.testing.assert_allclose(dp2.array.itrs, dp.array.itrs, atol=1e-9)
    assert dp2.array.labels == dp.array.labels
    np.testing.assert_allclose(dp2.times, dp.times, atol=1e-9)
    assert dp2.flags[2, 1, 1] and dp2.flags.sum() == 1
    assert np.allclose(dp2.dtec[dp2.ref_antenna], 0.0)


def test_h5parm_foreign_layout_and_phase(tmp_path):
    """Read an h5parm we didn't write: pol axis, permuted AXES order,
    absolute (un-referenced) TEC, antenna table larger than the soltab's
    antenna axis; plus a single-frequency phase soltab."""
    import h5py
    from ionotomo_tpu import constants

    rng = np.random.default_rng(0)
    arr = generate_lofar_like_array(n_core=3, n_remote=2, seed=1)
    na_tab, na, nt, nd = 5, 4, 2, 3
    names = np.asarray(arr.labels, dtype="S64")
    ant_dtype = np.dtype([("name", "S64"), ("position", np.float64, (3,))])
    ant_tab = np.zeros(na_tab, ant_dtype)
    ant_tab["name"] = names
    ant_tab["position"] = arr.itrs * 1e3
    src_dtype = np.dtype([("name", "S64"), ("dir", np.float64, (2,))])
    src = np.zeros(nd, src_dtype)
    src["name"] = np.asarray([f"P{j}" for j in range(nd)], dtype="S64")
    src["dir"] = np.stack([np.full(nd, 1.2), 0.9 + 0.01 * np.arange(nd)],
                          axis=-1)
    tec_abs = rng.normal(scale=0.05, size=(na, nd, nt, 2))  # TECU, +pol
    phase = rng.normal(scale=0.5, size=(1, nt, na, nd))     # freq leading

    p = tmp_path / "foreign.h5"
    with h5py.File(p, "w") as f:
        ss = f.create_group("sol000")
        ss.create_dataset("antenna", data=ant_tab)
        ss.create_dataset("source", data=src)
        st = ss.create_group("tec000")
        st.attrs["TITLE"] = np.bytes_(b"tec")
        v = st.create_dataset("val", data=tec_abs)
        v.attrs["AXES"] = np.bytes_(b"ant,dir,time,pol")
        st.create_dataset("time", data=58000.0 * 86400.0
                          + np.arange(nt) * 30.0)
        st.create_dataset("ant", data=names[:na])  # soltab subset
        st.create_dataset("dir", data=src["name"])
        st.create_dataset("pol", data=np.asarray([b"XX", b"YY"]))
        st2 = ss.create_group("phase000")
        st2.attrs["TITLE"] = np.bytes_(b"phase")
        v2 = st2.create_dataset("val", data=phase)
        v2.attrs["AXES"] = np.bytes_(b"freq,time,ant,dir")
        st2.create_dataset("weight", data=np.ones_like(phase))
        st2.create_dataset("freq", data=np.asarray([150e6]))
        st2.create_dataset("time", data=58000.0 * 86400.0
                           + np.arange(nt) * 30.0)
        st2.create_dataset("ant", data=names[:na])
        st2.create_dataset("dir", data=src["name"])

    dp = DataPack.from_h5parm(p, ref_antenna=1)
    assert dp.shape == (na, nt, nd)
    assert len(dp.array) == na                  # restricted to soltab ants
    assert np.allclose(dp.dtec[1], 0.0)         # re-referenced
    want = (tec_abs.mean(-1) - tec_abs.mean(-1)[1:2]).transpose(0, 2, 1)
    np.testing.assert_allclose(
        dp.dtec, want * constants.TECU / constants.TEC_SCALE, rtol=1e-9)

    dpp = DataPack.from_h5parm(p, soltab="phase000", ref_antenna=0)
    assert dpp.shape == (na, nt, nd)
    # phase view of the loaded dtec reproduces the referenced input phase
    # (up to the time-unwrap, identity here since |dphi|<pi)
    ref_phase = phase[0] - phase[0, :, 0:1]
    np.testing.assert_allclose(
        dpp.phase().transpose(1, 0, 2), ref_phase, atol=1e-6)


def test_h5parm_ref_flag_propagates_and_multifreq_noise_units(tmp_path):
    """A flagged reference-antenna sample mis-references every antenna for
    that (time, dir) — all rows must be flagged; and the multi-frequency
    phase noise conversion lands at the documented TEC-unit magnitude."""
    import h5py
    from ionotomo_tpu import constants

    dp, _ = generate_example_datapack(n_antennas=5, n_directions=3,
                                      n_times=2, grid_shape=(16, 16, 16))
    dp.flags[0, 1, 2] = True          # ref antenna is 0
    p = tmp_path / "s.h5"
    dp.to_h5parm(p)
    dp2 = DataPack.from_h5parm(p)
    assert dp2.flags[:, 1, 2].all()          # whole column flagged
    assert not dp2.flags[:, 0, 2].any()

    # multi-frequency phase: noise_std ≈ noise_tecu·(TECU/TEC_SCALE)·
    # f_eff/f_min ≤ that bound (broadband fit beats one channel)
    freqs = np.array([120e6, 150e6, 180e6])
    rng = np.random.default_rng(0)
    arr = generate_lofar_like_array(n_core=2, n_remote=1, seed=0)
    names = np.asarray(arr.labels, dtype="S64")
    ant_dtype = np.dtype([("name", "S64"), ("position", np.float64, (3,))])
    ant = np.zeros(3, ant_dtype); ant["name"] = names
    ant["position"] = arr.itrs * 1e3
    src_dtype = np.dtype([("name", "S64"), ("dir", np.float64, (2,))])
    src = np.zeros(2, src_dtype)
    src["name"] = np.asarray([b"A", b"B"]); src["dir"] = 1.0
    with h5py.File(tmp_path / "mf.h5", "w") as f:
        ss = f.create_group("sol000")
        ss.create_dataset("antenna", data=ant)
        ss.create_dataset("source", data=src)
        st = ss.create_group("phase000")
        st.attrs["TITLE"] = np.bytes_(b"phase")
        v = st.create_dataset(
            "val", data=rng.normal(size=(3, 2, 3, 2)) * 0.1)
        v.attrs["AXES"] = np.bytes_(b"freq,time,ant,dir")
        st.create_dataset("freq", data=freqs)
        st.create_dataset("time", data=58000.0 * 86400 + np.arange(2) * 30)
        st.create_dataset("ant", data=names)
        st.create_dataset("dir", data=src["name"])
    noise_tecu = 2e-3
    dpm = DataPack.from_h5parm(tmp_path / "mf.h5", soltab="phase000",
                               noise_tecu=noise_tecu)
    bound = noise_tecu * constants.TECU / constants.TEC_SCALE
    got = float(dpm.noise_std.mean())
    assert 0.2 * bound < got <= 1.001 * bound


def test_concat_times_merges_epoch_streams():
    dp, _ = generate_example_datapack(n_antennas=5, n_directions=3,
                                      n_times=4, grid_shape=(12, 12, 12),
                                      n_samples=9)
    a = dp.select(times=[0, 1])
    b = dp.select(times=[2, 3])
    merged = DataPack.concat_times([a, b])
    assert merged.shape == dp.shape
    np.testing.assert_allclose(merged.dtec, dp.dtec)
    np.testing.assert_allclose(merged.times, dp.times)
    np.testing.assert_array_equal(merged.flags, dp.flags)
    # decreasing times refused
    import pytest as _pytest
    with _pytest.raises(AssertionError, match="increasing"):
        DataPack.concat_times([b, a])
