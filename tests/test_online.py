"""Streaming (online) filter API: epoch-by-epoch push equals the batch
filter, and a killed service resumes identically from state_dict."""
import numpy as np
import jax
import jax.numpy as jnp

from ionotomo_tpu.geometry.rays import RayBundle
from ionotomo_tpu.inversion.kalman import (ensemble_kalman_filter,
                                           kalman_filter)
from ionotomo_tpu.inversion.online import OnlineEnsembleKalman, OnlineKalman
from ionotomo_tpu.inversion.priors import GPCovariance

from tests.test_kalman import moving_world


def test_online_kalman_matches_batch_filter():
    w = moving_world(nt=4)
    cov = GPCovariance.create(w["grid"], sigma=0.3, length_scale=80.0,
                              kind="sqexp")
    batch = kalman_filter(w["grid"], w["rays_seq"], w["d_seq"], w["noise"],
                          w["m_bg"], cov, w["wind"], w["dt_s"],
                          num_directions=w["n_dirs"], cg_iters=20,
                          fade=0.95)
    f = OnlineKalman(w["grid"], cov, w["m_bg"], w["wind"], w["dt_s"],
                     num_directions=w["n_dirs"], cg_iters=20, fade=0.95)
    for t in range(4):
        rb = RayBundle(points=w["rays_seq"].points[t],
                       ds=w["rays_seq"].ds[t])
        m_t, diag = f.step(rb, w["d_seq"][t], w["noise"])
        # Nt=1 programs fuse differently than the Nt=4 scan; truncated CG
        # amplifies f32 reduction-order noise and the deviation compounds
        # over chained steps — compare against the update scale
        delta = np.abs(np.asarray(batch.m_seq[t])
                       - np.asarray(w["m_bg"])).max()
        diff = np.abs(np.asarray(m_t) - np.asarray(batch.m_seq[t])).max()
        assert diff < 0.03 * delta, (t, diff, delta)
        assert diag["post_residual"] < diag["pre_residual"]


def test_online_kalman_state_roundtrip_resumes_identically():
    w = moving_world(nt=4)
    cov = GPCovariance.create(w["grid"], sigma=0.3, length_scale=80.0,
                              kind="sqexp")

    def make():
        return OnlineKalman(w["grid"], cov, w["m_bg"], w["wind"],
                            w["dt_s"], num_directions=w["n_dirs"],
                            cg_iters=15)

    def rb(t):
        return RayBundle(points=w["rays_seq"].points[t],
                         ds=w["rays_seq"].ds[t])

    f1 = make()
    outs1 = [np.asarray(f1.step(rb(t), w["d_seq"][t], w["noise"])[0])
             for t in range(4)]
    # "service restart" after epoch 1
    f2 = make()
    f2.step(rb(0), w["d_seq"][0], w["noise"])
    f2.step(rb(1), w["d_seq"][1], w["noise"])
    state = f2.state_dict()
    f3 = make()
    f3.load_state(state)
    for t in (2, 3):
        m_t, _ = f3.step(rb(t), w["d_seq"][t], w["noise"])
        np.testing.assert_allclose(np.asarray(m_t), outs1[t], atol=1e-6)


def test_online_enkf_matches_batch_filter():
    w = moving_world(nt=3)
    cov = GPCovariance.create(w["grid"], sigma=0.3, length_scale=80.0,
                              kind="sqexp")
    key = jax.random.key(7)
    batch = ensemble_kalman_filter(
        w["grid"], w["rays_seq"], w["d_seq"], w["noise"], w["m_bg"], cov,
        w["wind"], w["dt_s"], num_directions=w["n_dirs"], key=key,
        n_members=5, cg_iters=12)
    f = OnlineEnsembleKalman(w["grid"], cov, w["m_bg"], w["wind"],
                             w["dt_s"], num_directions=w["n_dirs"],
                             key=key, n_members=5, cg_iters=12)
    for t in range(3):
        rb = RayBundle(points=w["rays_seq"].points[t],
                       ds=w["rays_seq"].ds[t])
        mean, std, _ = f.step(rb, w["d_seq"][t], w["noise"])
        delta = np.abs(np.asarray(batch.mean_seq[t])
                       - np.asarray(w["m_bg"])).max() + 1e-6
        dm = np.abs(np.asarray(mean) - np.asarray(batch.mean_seq[t])).max()
        ds_ = np.abs(np.asarray(std) - np.asarray(batch.std_seq[t])).max()
        assert dm < 0.05 * delta, (t, dm, delta)
        assert ds_ < 0.05 * float(np.asarray(batch.std_seq[t]).mean()), \
            (t, ds_)


def test_online_mixed_fidelity_matches_batch_mixed():
    """Streaming mixed-fidelity (inner_samples>0) equals the batch filter
    run with the equivalent rays_inner_seq — the serving path's latency
    option is numerically the documented batch capability."""
    from ionotomo_tpu.geometry.rays import inner_bundle

    w = moving_world(nt=3)
    cov = GPCovariance.create(w["grid"], sigma=0.3, length_scale=80.0,
                              kind="sqexp")
    batch = kalman_filter(
        w["grid"], w["rays_seq"], w["d_seq"], w["noise"], w["m_bg"], cov,
        w["wind"], w["dt_s"], num_directions=w["n_dirs"], cg_iters=15,
        fade=0.95, rays_inner_seq=inner_bundle(w["rays_seq"], 25))
    f = OnlineKalman(w["grid"], cov, w["m_bg"], w["wind"], w["dt_s"],
                     num_directions=w["n_dirs"], cg_iters=15, fade=0.95,
                     inner_samples=25)
    for t in range(3):
        rb = RayBundle(points=w["rays_seq"].points[t],
                       ds=w["rays_seq"].ds[t])
        m_t, diag = f.step(rb, w["d_seq"][t], w["noise"])
        delta = np.abs(np.asarray(batch.m_seq[t])
                       - np.asarray(w["m_bg"])).max()
        diff = np.abs(np.asarray(m_t) - np.asarray(batch.m_seq[t])).max()
        assert diff < 0.03 * delta, (t, diff, delta)
        assert diag["post_residual"] < diag["pre_residual"]


def test_online_wind_adaptation_matches_batch():
    """Streamed wind adaptation: per-epoch refined wind carried in
    self.wind equals the batch adaptive filter's wind_seq; the state
    dict round-trips the adapted wind."""
    w = moving_world(nt=4)
    cov = GPCovariance.create(w["grid"], sigma=0.3, length_scale=80.0,
                              kind="sqexp")
    wind_bad = jnp.asarray([-0.1, 0.2, 0.0], jnp.float32)
    batch = kalman_filter(w["grid"], w["rays_seq"], w["d_seq"],
                          w["noise"], w["m_bg"], cov, wind_bad,
                          w["dt_s"], num_directions=w["n_dirs"],
                          cg_iters=15, fade=0.95, wind_adapt_iters=2)
    f = OnlineKalman(w["grid"], cov, w["m_bg"], wind_bad, w["dt_s"],
                     num_directions=w["n_dirs"], cg_iters=15, fade=0.95,
                     wind_adapt_iters=2)
    for t in range(4):
        rb = RayBundle(points=w["rays_seq"].points[t],
                       ds=w["rays_seq"].ds[t])
        m_t, diag = f.step(rb, w["d_seq"][t], w["noise"])
        np.testing.assert_allclose(np.asarray(diag["wind_kmps"]),
                                   np.asarray(batch.wind_seq[t]),
                                   atol=5e-3)
    state = f.state_dict()
    f2 = OnlineKalman(w["grid"], cov, w["m_bg"], wind_bad, w["dt_s"],
                      num_directions=w["n_dirs"], cg_iters=15, fade=0.95,
                      wind_adapt_iters=2)
    f2.load_state(state)
    np.testing.assert_allclose(f2.wind, f.wind)

def test_online_shear_wind_state():
    """OnlineKalman accepts the (2,3) rigid+shear wind state: steps run,
    the refined wind keeps its shape, the diag serializes it as a nested
    list, and the state dict round-trips it."""
    w = moving_world(nt=3)
    cov = GPCovariance.create(w["grid"], sigma=0.3, length_scale=80.0,
                              kind="sqexp")
    wind0 = jnp.asarray([[0.1, 0.1, 0.0], [0.0, 0.0, 0.0]], jnp.float32)
    f = OnlineKalman(w["grid"], cov, w["m_bg"], wind0, w["dt_s"],
                     num_directions=w["n_dirs"], cg_iters=10, fade=0.95,
                     wind_adapt_iters=1)
    for t in range(3):
        rb = RayBundle(points=w["rays_seq"].points[t],
                       ds=w["rays_seq"].ds[t])
        m_t, diag = f.step(rb, w["d_seq"][t], w["noise"])
        assert np.isfinite(np.asarray(m_t)).all()
        wk = np.asarray(diag["wind_kmps"])
        assert wk.shape == (2, 3) and np.isfinite(wk).all()
    assert f.wind.shape == (2, 3)
    state = f.state_dict()
    f2 = OnlineKalman(w["grid"], cov, w["m_bg"], wind0, w["dt_s"],
                      num_directions=w["n_dirs"], cg_iters=10, fade=0.95,
                      wind_adapt_iters=1)
    f2.load_state(state)
    np.testing.assert_allclose(f2.wind, f.wind)


def test_online_probe_assimilation_updates_state_and_clim_delta():
    """Streaming ionosonde soundings: OnlineKalman.assimilate_probes
    applies the sequential point-density update to the current state (the
    profile correction no TEC-derived epoch can supply — data/ionosonde
    module docstring) and returns the increment the serving layer folds
    into the climatology pull target."""
    from ionotomo_tpu.data import ionosonde as iono
    from ionotomo_tpu.inversion.profile import log_profile_rms
    from ionotomo_tpu.models import chapman as chap

    w = moving_world(nt=1)
    grid = w["grid"]
    cov = GPCovariance.create(grid, sigma=0.3, length_scale=80.0,
                              kind="sqexp")
    # the stream's background carries a wrong vertical profile; the
    # "true" ionosphere peaks 60 km higher
    m_true = chap.log_parametrize(chap.chapman_field(grid,
                                                     h_peak_km=420.0))
    f = OnlineKalman(grid, cov, w["m_bg"], w["wind"], w["dt_s"],
                     num_directions=w["n_dirs"], cg_iters=15)
    rb = RayBundle(points=w["rays_seq"].points[0], ds=w["rays_seq"].ds[0])
    f.step(rb, w["d_seq"][0], w["noise"])

    probes = iono.bottomside_probes(m_true, grid,
                                    [[-30.0, 20.0], [25.0, -35.0]],
                                    n_per_station=10, noise_log=0.05,
                                    seed=3)
    rms0 = float(log_profile_rms(f.m, m_true, grid))
    m_before = np.asarray(f.m)
    delta = f.assimilate_probes(probes)
    rms1 = float(log_profile_rms(f.m, m_true, grid))
    assert rms1 < 0.6 * rms0, (rms0, rms1)          # profile corrected
    np.testing.assert_array_equal(np.asarray(delta),
                                  np.asarray(f.m) - m_before)


def test_online_enkf_probe_sqrt_update_deterministic():
    """EnKF probe assimilation is the square-root (deterministic) form —
    bitwise repeatable so service restarts stay bit-identical — and is
    refused before the first epoch builds the ensemble."""
    import pytest

    from ionotomo_tpu.data import ionosonde as iono
    from ionotomo_tpu.forward.tec import log_ne_at
    from ionotomo_tpu.models import chapman as chap

    w = moving_world(nt=1)
    grid = w["grid"]
    cov = GPCovariance.create(grid, sigma=0.3, length_scale=80.0,
                              kind="sqexp")
    m_true = chap.log_parametrize(chap.chapman_field(grid,
                                                     h_peak_km=420.0))
    probes = iono.bottomside_probes(m_true, grid, [[0.0, 0.0]],
                                    n_per_station=8, noise_log=0.05,
                                    seed=5)

    def run():
        f = OnlineEnsembleKalman(grid, cov, w["m_bg"], w["wind"],
                                 w["dt_s"], num_directions=w["n_dirs"],
                                 key=jax.random.key(7), n_members=4,
                                 cg_iters=10)
        with pytest.raises(RuntimeError, match="first epoch"):
            f.assimilate_probes(probes)
        rb = RayBundle(points=w["rays_seq"].points[0],
                       ds=w["rays_seq"].ds[0])
        f.step(rb, w["d_seq"][0], w["noise"])

        def obs_spread(ens):
            h = jax.vmap(lambda m: log_ne_at(m, grid, probes.points))(ens)
            return float(jnp.std(h, axis=0).mean())

        spread0 = obs_spread(f.ens)
        delta = f.assimilate_probes(probes)
        return np.asarray(f.ens), np.asarray(delta), spread0, \
            obs_spread(f.ens)

    ens_a, delta_a, spread0, spread1 = run()
    ens_b, delta_b, _, _ = run()
    np.testing.assert_array_equal(ens_a, ens_b)      # deterministic
    np.testing.assert_array_equal(delta_a, delta_b)
    # the (I-KH) anomaly contraction tightens the OBSERVED directions
    # (the global grid-mean spread need not shrink — the update is local
    # to the sounder columns)
    assert spread1 < spread0, (spread0, spread1)

# --- adaptive observation-noise scale (VERDICT r3 #3) -----------------------

def _misstated_noise_world(nt=8, seed=0):
    """moving_world with the noise regime where adaptive R matters: extra
    white noise at a visible fraction of the signal budget (stated-noise
    mis-calibration is invisible when data are fit regardless — the MLE
    weights only rows where noise is a measurable innovation component)."""
    w = moving_world(nt=nt, seed=seed)
    rng = np.random.default_rng(seed + 100)
    extra = 0.3 * float(np.abs(np.asarray(w["d_seq"])).max())
    d_noisy = np.asarray(w["d_seq"]) + rng.normal(
        scale=extra, size=np.shape(w["d_seq"]))
    w["d_seq"] = jnp.asarray(d_noisy, jnp.float32)
    w["true_noise"] = jnp.float32(extra)
    return w


def test_online_adaptive_r_learns_noise_scale():
    """True noise 3x the stated level: the adaptive point filter's
    r_scale converges toward ~3 under the EMA, while a correctly-stated
    run stays near 1 — the streaming innovation-consistency adaptive R
    (VERDICT r3 #3; kalman._innov_noise_scale_sq + online._ema_scale)."""
    w = _misstated_noise_world(nt=8)
    cov = GPCovariance.create(w["grid"], sigma=0.3, length_scale=80.0,
                              kind="sqexp")

    def run(assumed_noise):
        f = OnlineKalman(w["grid"], cov, w["m_bg"], w["wind"], w["dt_s"],
                         num_directions=w["n_dirs"], cg_iters=15,
                         fade=0.95, adapt_r=0.3)
        scales = []
        for t in range(8):
            rb = RayBundle(points=w["rays_seq"].points[t],
                           ds=w["rays_seq"].ds[t])
            _, diag = f.step(rb, w["d_seq"][t], assumed_noise)
            scales.append(diag["r_scale"])
        return f.r_scale, scales

    s_wrong, hist = run(w["true_noise"] / 3.0)     # true = 3x stated
    s_right, _ = run(w["true_noise"])              # correctly stated
    assert 1.8 < s_wrong < 5.5, (s_wrong, hist)
    assert 0.55 < s_right < 1.8, s_right
    assert s_wrong > 1.8 * s_right, (s_wrong, s_right)


def test_online_enkf_adaptive_r_learns_noise_scale():
    """EnKF form: the same mis-stated-noise world, hph from the member
    forwards' spread (no probes needed)."""
    w = _misstated_noise_world(nt=8, seed=1)
    cov = GPCovariance.create(w["grid"], sigma=0.3, length_scale=80.0,
                              kind="sqexp")

    def run(assumed_noise):
        f = OnlineEnsembleKalman(w["grid"], cov, w["m_bg"], w["wind"],
                                 w["dt_s"], num_directions=w["n_dirs"],
                                 key=jax.random.key(3), n_members=6,
                                 cg_iters=10, fade=0.95, adapt_r=0.3)
        for t in range(8):
            rb = RayBundle(points=w["rays_seq"].points[t],
                           ds=w["rays_seq"].ds[t])
            _, _, diag = f.step(rb, w["d_seq"][t], assumed_noise)
            assert "r_scale" in diag
        return f.r_scale

    s_wrong = run(w["true_noise"] / 3.0)
    s_right = run(w["true_noise"])
    assert 1.7 < s_wrong < 6.0, s_wrong
    assert 0.5 < s_right < 2.0, s_right
    assert s_wrong > 1.6 * s_right, (s_wrong, s_right)


def test_online_adaptive_r_restart_bit_identity():
    """A killed-and-resumed adaptive-R stream reproduces the
    uninterrupted one bit-exactly: r_scale persists in state_dict and
    the probe randomness is keyed by the (persisted) epoch index."""
    w = _misstated_noise_world(nt=6)
    cov = GPCovariance.create(w["grid"], sigma=0.3, length_scale=80.0,
                              kind="sqexp")
    assumed = w["true_noise"] / 2.0

    def make():
        return OnlineKalman(w["grid"], cov, w["m_bg"], w["wind"],
                            w["dt_s"], num_directions=w["n_dirs"],
                            cg_iters=12, fade=0.95, adapt_r=0.25)

    def rb(t):
        return RayBundle(points=w["rays_seq"].points[t],
                         ds=w["rays_seq"].ds[t])

    f1 = make()
    out1, scales1 = [], []
    for t in range(6):
        m_t, diag = f1.step(rb(t), w["d_seq"][t], assumed)
        out1.append(np.asarray(m_t)); scales1.append(diag["r_scale"])

    f2 = make()
    for t in range(3):
        f2.step(rb(t), w["d_seq"][t], assumed)
    state = f2.state_dict()
    assert "r_scale" in state
    f3 = make()
    f3.load_state(state)
    assert f3.r_scale == scales1[2]
    for t in (3, 4, 5):
        m_t, diag = f3.step(rb(t), w["d_seq"][t], assumed)
        np.testing.assert_array_equal(np.asarray(m_t), out1[t])
        assert diag["r_scale"] == scales1[t]
