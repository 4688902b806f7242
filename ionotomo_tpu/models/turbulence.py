"""Turbulent ionosphere perturbations via spectral synthesis (device-side).

Reference capability (SURVEY.md §2 "Turbulence / frozen-flow simulation"):
synthetic turbulent log-n_e perturbations with a von Kármán/Kolmogorov-like
spectrum, realized by filtering white noise in Fourier space. TPU-native
form: one forward/inverse 3D FFT pair under jit; realizations are
embarrassingly parallel via vmap over split PRNG keys (SURVEY.md §2.1 P3).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..core.grids import Grid3D


def _wavenumbers(grid: Grid3D):
    """|k| magnitude lattice (rad/km) for the grid, rfft layout on last axis.

    Shapes come from static metadata; spacings stay traced so the same
    compiled program serves any grid placement.
    """
    nx, ny, nz = grid.shape
    kx = 2 * jnp.pi * jnp.asarray(np.fft.fftfreq(nx), jnp.float32) \
        / grid.spacing[0]
    ky = 2 * jnp.pi * jnp.asarray(np.fft.fftfreq(ny), jnp.float32) \
        / grid.spacing[1]
    kz = 2 * jnp.pi * jnp.asarray(np.fft.rfftfreq(nz), jnp.float32) \
        / grid.spacing[2]
    return jnp.sqrt(kx[:, None, None] ** 2 + ky[None, :, None] ** 2
                    + kz[None, None, :] ** 2)


def von_karman_amplitude(kmag, outer_scale_km=100.0, inner_scale_km=2.0,
                         exponent=-11.0 / 6.0):
    """sqrt of the von Kármán power spectrum with inner-scale rolloff.

    P(k) ∝ (k² + k0²)^(-11/6) · exp(-(k·l_i)²), k0 = 2π/L0.
    """
    k0 = 2 * jnp.pi / outer_scale_km
    li = inner_scale_km / (2 * jnp.pi)
    p = (kmag**2 + k0**2) ** exponent * jnp.exp(-(kmag * li) ** 2)
    return jnp.sqrt(p)


@jax.jit
def _synthesize(grid: Grid3D, key, outer_scale_km, inner_scale_km):
    nx, ny, nz = grid.shape
    kmag = _wavenumbers(grid)
    amp = von_karman_amplitude(kmag, outer_scale_km, inner_scale_km)
    amp = amp.at[0, 0, 0].set(0.0)  # zero-mean field
    white = jax.random.normal(key, (nx, ny, nz), jnp.float32)
    spec = jnp.fft.rfftn(white) * amp
    field = jnp.fft.irfftn(spec, s=(nx, ny, nz)).astype(jnp.float32)
    std = jnp.std(field) + 1e-20
    return field / std


def turbulent_log_perturbation(grid: Grid3D, amplitude=0.5,
                               outer_scale_km=100.0, inner_scale_km=2.0,
                               seed=0, key=None):
    """One realization of a zero-mean, unit-std-scaled log-n_e perturbation.

    Returns amplitude × (normalized von Kármán field) on ``grid``.
    """
    if key is None:
        key = jax.random.key(seed)
    return amplitude * _synthesize(grid, key, float(outer_scale_km),
                                   float(inner_scale_km))


def turbulent_realizations(grid: Grid3D, n, amplitude=0.5,
                           outer_scale_km=100.0, inner_scale_km=2.0, seed=0):
    """vmapped batch of n independent realizations, (n, *grid.shape)."""
    keys = jax.random.split(jax.random.key(seed), n)
    f = jax.vmap(lambda k: _synthesize(grid, k, float(outer_scale_km),
                                       float(inner_scale_km)))
    return amplitude * f(keys)
