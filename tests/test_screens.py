"""Directional phase-screen tests: interpolation accuracy on held-out
directions + hyperparameter fitting."""
import numpy as np

from ionotomo_tpu.data.synth import generate_example_datapack
from ionotomo_tpu.inversion import screens


def world():
    dp, _ = generate_example_datapack(
        n_antennas=10, n_directions=20, n_times=1, mjd0=58000.45,
        grid_shape=(16, 16, 16), noise_tecu=1e-4, turbulence_amp=0.3,
        n_samples=33)
    return dp


def test_screen_interpolates_held_out_directions():
    dp = world()
    train = dp.select(directions=np.arange(15))
    scr = screens.fit_screen(train, 0)
    mean, var = screens.predict_screen(scr, dp.directions[15:])
    truth = dp.dtec[:, 0, 15:]
    # screens must beat the trivial per-antenna-mean predictor
    err_gp = np.abs(np.asarray(mean) - truth).mean()
    err_mean = np.abs(truth - train.dtec[:, 0, :].mean(
        axis=1, keepdims=True)).mean()
    assert err_gp < 0.8 * err_mean
    assert np.all(np.asarray(var) >= 0)


def test_screen_reproduces_training_points_at_low_noise():
    dp = world()
    scr = screens.fit_screen(dp, 0, noise_std=1e-3)
    mean, _ = screens.predict_screen(scr, dp.directions)
    scale = np.abs(dp.dtec[:, 0, :]).max()
    np.testing.assert_allclose(np.asarray(mean), dp.dtec[:, 0, :],
                               atol=2e-2 * scale)


def test_screen_hyperparameter_fit_runs_and_improves():
    dp = world()
    fitted = screens.fit_screen_hyperparameters(dp, 0, steps=80)
    scr = screens.fit_screen(dp, 0, kernel=fitted)
    mean, _ = screens.predict_screen(scr, dp.directions)
    assert np.isfinite(np.asarray(mean)).all()
