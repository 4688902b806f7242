"""Directional phase screens: per-antenna GP interpolation of dTEC over
the sky (the reference's screen-level GP-fit use of its GP toolkit,
SURVEY.md §2 "GP toolkit": "used for phase-screen smoothing/interpolation").

Given a DataPack timestep, fits an independent GP per antenna over
tangent-plane sky coordinates and predicts dTEC (hence dispersive phase)
at arbitrary directions — the calibration-screen product. All antennas
share the input locations, so the fits batch into one vmapped Cholesky
solve on device.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import gaussian_process as gp


class Screen(NamedTuple):
    """Fitted per-antenna sky screens at one timestep."""

    x: jax.Array           # (Nd, 2) tangent-plane coords of fit directions
    alpha: jax.Array       # (Na, Nd) Cholesky-solved weights per antenna
    chol: jax.Array        # (Nd, Nd) shared Cholesky factor
    center: np.ndarray     # (2,) ra/dec of the tangent point
    kernel: object
    noise_std: float


def _tangent_plane(radec, center):
    ra0, dec0 = center
    x = (radec[..., 0] - ra0) * np.cos(dec0)
    y = radec[..., 1] - dec0
    return np.stack([x, y], axis=-1)


def fit_screen(datapack, time_idx=0, kernel=None, noise_std=None) -> Screen:
    """Fit GP screens to dtec[:, time_idx, :] for every antenna at once."""
    radec = datapack.directions
    center = radec.mean(axis=0)
    x = jnp.asarray(_tangent_plane(radec, center), jnp.float32)
    d = jnp.asarray(datapack.dtec[:, time_idx, :], jnp.float32)  # (Na, Nd)
    if noise_std is None:
        noise_std = float(np.median(datapack.noise_std[:, time_idx, :]))
    if kernel is None:
        spread = float(np.abs(np.asarray(x)).max()) or 1.0
        kernel = gp.SquaredExponential(
            sigma=float(jnp.std(d)) + 1e-6, length_scale=0.5 * spread)

    k = kernel(x, x) + (noise_std**2) * jnp.eye(x.shape[0])
    alpha, chol = gp.cho_solve_stack(k, d.T)          # (Nd, Na)
    return Screen(x=x, alpha=alpha.T, chol=chol, center=center,
                  kernel=kernel, noise_std=noise_std)


def predict_screen(screen: Screen, radec_query):
    """Predict dTEC for every antenna at query directions.

    Returns (mean (Na, M), var (M,)) — the variance is antenna-independent
    because all antennas share locations and kernel.
    """
    xq = jnp.asarray(_tangent_plane(np.atleast_2d(radec_query),
                                    screen.center), jnp.float32)
    ks = screen.kernel(screen.x, xq)                  # (Nd, M)
    mean = screen.alpha @ ks                          # (Na, M)
    v = jax.scipy.linalg.solve_triangular(screen.chol, ks, lower=True)
    var = jnp.clip(jnp.diagonal(screen.kernel(xq, xq))
                   - jnp.sum(v * v, axis=0), 0.0)
    return mean, var


def fit_screen_hyperparameters(datapack, time_idx=0, antenna=None,
                               steps=150):
    """Maximise the marginal likelihood of the screen kernel on one
    antenna's data (or the antenna with the strongest signal) and return
    the fitted kernel for reuse in fit_screen."""
    d = np.asarray(datapack.dtec[:, time_idx, :])
    if antenna is None:
        antenna = int(np.argmax(np.abs(d).std(axis=1)))
    radec = datapack.directions
    x = jnp.asarray(_tangent_plane(radec, radec.mean(axis=0)), jnp.float32)
    y = jnp.asarray(d[antenna], jnp.float32)
    noise = float(np.median(datapack.noise_std[antenna, time_idx, :]))
    spread = float(np.abs(np.asarray(x)).max()) or 1.0
    k0 = gp.SquaredExponential(sigma=float(y.std()) + 1e-6,
                               length_scale=0.5 * spread)
    fitted, _ = gp.fit_hyperparameters(k0, x, y, noise, steps=steps)
    return fitted
