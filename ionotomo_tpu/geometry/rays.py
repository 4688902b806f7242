"""Straight-line ray sampling (device-side, static shapes).

The reference's ``calc_rays`` straight-line branch (SURVEY.md §3.2):
``x(s) = ant + s·k̂`` for s in [0, max_length], N samples per ray, for every
(antenna × time × direction). Here it is a pure jnp broadcast producing a
``RayBundle`` — a flat batch of rays plus quadrature geometry — which is the
native currency of the forward/adjoint operators and the axis that gets
sharded across chips (SURVEY.md §2.1 P1).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .. import constants


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RayBundle:
    """A flat batch of sampled rays.

    points:  (R, N, 3) sample positions [km]
    ds:      (R,) arc-length spacing between consecutive samples [km]
             (uniform per ray; bent rays are reparametrised to uniform s)
    """

    points: jax.Array
    ds: jax.Array

    @property
    def num_rays(self) -> int:
        return self.points.shape[0]

    @property
    def num_samples(self) -> int:
        return self.points.shape[1]


def sample_straight_rays(origins, directions,
                         max_length_km=constants.DEFAULT_MAX_LENGTH_KM,
                         n_samples=constants.DEFAULT_N_SAMPLES) -> RayBundle:
    """Sample straight rays: origins (R,3), unit directions (R,3) → RayBundle.

    ``n_samples`` should be odd so composite Simpson quadrature applies
    exactly (constants.DEFAULT_N_SAMPLES = 129).
    """
    origins = jnp.asarray(origins, jnp.float32)
    directions = jnp.asarray(directions, jnp.float32)
    s = jnp.linspace(0.0, max_length_km, n_samples, dtype=jnp.float32)
    pts = origins[:, None, :] + s[None, :, None] * directions[:, None, :]
    ds = jnp.full((origins.shape[0],), max_length_km / (n_samples - 1),
                  jnp.float32)
    return RayBundle(points=pts, ds=ds)


def inner_bundle(bundle: RayBundle, n_inner: int) -> RayBundle:
    """Coarse subsample of a uniformly-sampled bundle (every k-th sample,
    endpoints kept) for mixed-fidelity solves — the linear solve's
    Jacobian from the coarse rule, misfit at full fidelity (see
    solvers.map_gauss_newton ``rays_inner``). Works for straight AND
    bent bundles (both are uniform in arc length), and for stacked
    (Nt, R, N, 3) sequences. Requires (N−1) divisible by (n_inner−1).
    """
    n = bundle.points.shape[-2]
    if not 1 < n_inner < n:
        raise ValueError(f"inner_bundle: need 1 < n_inner={n_inner} < "
                         f"n_samples={n}")
    stride, rem = divmod(n - 1, n_inner - 1)
    if rem:
        raise ValueError(
            f"inner_bundle: n_samples-1={n - 1} not divisible by "
            f"n_inner-1={n_inner - 1} (try n_inner in "
            f"{[1 + (n - 1) // k for k in (2, 4) if (n - 1) % k == 0]})")
    return RayBundle(points=bundle.points[..., ::stride, :],
                     ds=bundle.ds * stride)


def make_ray_batch(antennas_enu, directions_enu):
    """Cartesian product (Na,3)×(Nd,3) → flat (Na*Nd, 3) origin/dir arrays.

    Row-major over (antenna, direction): ray r = i*Nd + k, matching the
    dTEC referencing convention in forward.tec.
    """
    ants = jnp.asarray(antennas_enu, jnp.float32)
    dirs = jnp.asarray(directions_enu, jnp.float32)
    na, nd = ants.shape[0], dirs.shape[0]
    origins = jnp.repeat(ants, nd, axis=0)
    directions = jnp.tile(dirs, (na, 1))
    return origins, directions


def calc_rays(antennas_enu, directions_enu, ne_field_m=None, grid=None,
              frequency_hz=None, straight_line_approx=True,
              max_length_km=constants.DEFAULT_MAX_LENGTH_KM,
              n_samples=constants.DEFAULT_N_SAMPLES,
              method="leapfrog"):
    """Reference-parity facade over the ray subsystem.

    Mirrors the reference's ``calc_rays(antennas, patches, …, ne_tci,
    frequency, straight_line_approx, max_length, N)`` entry point
    (SURVEY.md §2 "Ray calculation"): builds the (antenna × direction)
    product and dispatches to the straight sampler or the Fermat tracer.
    Per-time geometry is the caller's loop/vmap axis (directions_enu may be
    the slice for one time).

    Returns a RayBundle of shape (Na*Nd, N, 3), row-major over
    (antenna, direction).
    """
    origins, dvecs = make_ray_batch(antennas_enu, directions_enu)
    if straight_line_approx:
        return sample_straight_rays(origins, dvecs, max_length_km,
                                    n_samples)
    if ne_field_m is None or grid is None or frequency_hz is None:
        raise ValueError("bent rays need ne_field_m, grid, frequency_hz")
    from .fermat import trace_rays
    bundle, _ = trace_rays(ne_field_m, grid, origins, dvecs, frequency_hz,
                           max_length_km, n_steps=n_samples - 1,
                           keep_path=True, method=method)
    return bundle


def trapezoid_weights(n_samples: int, dtype=jnp.float32):
    """Composite trapezoid weights [1/2, 1, ..., 1, 1/2].

    Basis of the gradient-augmented (Hermite) TEC quadrature
    (forward.tec.tec_hermite): integrating the C¹ cubic-Hermite spline of
    (f, f') samples telescopes every interior derivative term, leaving
    trapezoid values + an h²/12·(f'_first − f'_last) endpoint correction —
    4th order for smooth integrands. Interior derivative data provably
    cannot enter any reflection-symmetric linear rule (the weights would
    have to be odd under reflection), so this *is* the full-information
    Hermite rule, not a truncation of one. Uniform weights also have no
    comb at the sample Nyquist frequency, unlike Simpson's alternating
    4/3, 2/3 pattern whose (−1)^n component couples unresolved
    voxel-scale structure straight into the integral.
    """
    if n_samples < 2:
        raise ValueError("need >= 2 samples")
    w = jnp.ones((n_samples,), dtype)
    return w.at[0].set(0.5).at[-1].set(0.5)


def simpson_weights(n_samples: int, dtype=jnp.float32):
    """Composite Simpson weights [1,4,2,...,4,1]/3 for odd n; trapezoid
    fallback on the last interval for even n (shouldn't happen in practice).
    """
    if n_samples < 2:
        raise ValueError("need >= 2 samples")
    if n_samples % 2 == 1:
        w = jnp.ones((n_samples,), dtype)
        w = w.at[1:-1:2].set(4.0)
        w = w.at[2:-1:2].set(2.0)
        return w / 3.0
    # even: Simpson on first n-1 points + trapezoid on final interval
    w = simpson_weights(n_samples - 1, dtype)
    w = jnp.concatenate([w, jnp.zeros((1,), dtype)])
    return w.at[-2:].add(0.5)
