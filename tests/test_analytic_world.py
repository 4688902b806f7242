"""The analytic honest-world: Fourier-mode von Kármán truth
(models.turbulence.FourierModes) and the callable-field bent tracer
(fermat.trace_rays_callable) that the inversion benches generate data
through, so that no solver's interpolation model defines reality
(bench/common.analytic_world; DESIGN.md §14)."""
import numpy as np
import jax
import jax.numpy as jnp

from ionotomo_tpu.geometry import fermat
from ionotomo_tpu.models import chapman
from ionotomo_tpu.models.turbulence import FourierModes, analytic_ne_fn
from reference_kernels import fermat_ref


def chapman_ne_np(h, n_peak=1e12, h_peak=350.0, scale=80.0):
    z = (np.asarray(h, np.float64) - h_peak) / scale
    return n_peak * np.exp(0.5 * (1.0 - z - np.exp(-z)))


def modes_np(modes):
    return (np.asarray(modes.ks, np.float64),
            np.asarray(modes.phases, np.float64),
            float(modes.amp))


def test_fourier_modes_statistics():
    """Zero-mean, std ≈ amplitude, band-limited at kmax."""
    modes = FourierModes(512, amplitude=0.3, outer_scale_km=120.0,
                         kmax_rad_km=0.5, seed=4)
    assert float(jnp.linalg.norm(modes.ks, axis=1).max()) <= 0.5 + 1e-6
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-500, 500, (20000, 3)), jnp.float32)
    v = np.asarray(modes.value(pts))
    # MC std of the std estimate ~ amplitude/sqrt(2K) plus sampling noise
    assert abs(v.std() - 0.3) < 0.05, v.std()
    assert abs(v.mean()) < 0.05


def test_fourier_modes_gradient_is_exact():
    modes = FourierModes(64, amplitude=0.4, outer_scale_km=100.0,
                         kmax_rad_km=0.3, seed=1)
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.uniform(-100, 100, (50, 3)), jnp.float32)
    v, g = modes.value_and_grad(pts)
    np.testing.assert_allclose(np.asarray(v), np.asarray(modes.value(pts)),
                               rtol=1e-6)
    # f64 twin
    ks, ph, amp = modes_np(modes)
    p64 = np.asarray(pts, np.float64)
    th = p64 @ ks.T + ph[None, :]
    v64 = amp * np.cos(th).sum(1)
    g64 = -amp * (np.sin(th)[:, :, None] * ks[None, :, :]).sum(1)
    np.testing.assert_allclose(np.asarray(v), v64, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g), g64, atol=1e-4)


def test_callable_tracer_matches_f64_oracle():
    """Device bent trace through the analytic world vs the adaptive f64
    oracle over the SAME closed-form field — no grids anywhere."""
    modes = FourierModes(48, amplitude=0.25, outer_scale_km=120.0,
                         kmax_rad_km=0.15, seed=7)
    bg = chapman.background_ne_fn()
    ne_fn = analytic_ne_fn(modes, bg)
    rng = np.random.default_rng(3)
    origins = jnp.asarray(np.concatenate(
        [rng.uniform(-30, 30, (3, 2)), np.zeros((3, 1))], -1), jnp.float32)
    zen = rng.uniform(0.1, 0.5, 3)
    az = rng.uniform(0, 2 * np.pi, 3)
    dirs = jnp.asarray(np.stack(
        [np.sin(zen) * np.sin(az), np.sin(zen) * np.cos(az),
         np.cos(zen)], -1), jnp.float32)
    b, t = jax.jit(lambda o, d: fermat.trace_rays_callable(
        ne_fn, o, d, 60e6, 1000.0, n_steps=128))(origins, dirs)

    ks, ph, amp = modes_np(modes)

    def ne_and_grad64(x):
        ne_bg = chapman_ne_np(x[2])
        z = (x[2] - 350.0) / 80.0
        g_bg = np.array([0.0, 0.0, ne_bg * 0.5 * (-1.0 + np.exp(-z))
                         / 80.0])
        th = x @ ks.T + ph
        mp = amp * np.cos(th).sum()
        gmp = -amp * (np.sin(th)[:, None] * ks).sum(0)
        e = np.exp(mp)
        return ne_bg * e, e * (g_bg + ne_bg * gmp)

    for i in range(3):
        end_ref, tec_ref_v = fermat_ref.trace_ray_callable_ref(
            ne_and_grad64, np.asarray(origins[i]), np.asarray(dirs[i]),
            60e6, 1000.0, rtol=1e-9, atol=1e-11)
        assert np.linalg.norm(np.asarray(b.points[i, -1]) - end_ref) \
            < 1e-2, i
        assert abs(float(t[i]) - tec_ref_v) / tec_ref_v < 2e-4


def test_analytic_world_samples_match_evaluator():
    """bench.common.analytic_world: the returned grid SAMPLES are the
    evaluator's own log-density at the grid nodes."""
    from bench.common import analytic_world
    from ionotomo_tpu.core.grids import Grid3D
    from ionotomo_tpu import constants
    grid = Grid3D.from_bounds((-200, -200, 0.0), (200, 200, 1100.0),
                              (12, 12, 16))
    m_true, ne_fn = analytic_world(grid, amplitude=0.2, seed=5,
                                   n_modes=64)
    pts = jnp.asarray(grid.meshgrid().reshape(-1, 3), jnp.float32)
    ne, _ = ne_fn(pts)
    m_eval = jnp.log(ne / constants.K_NE).reshape(grid.shape)
    np.testing.assert_allclose(np.asarray(m_true), np.asarray(m_eval),
                               atol=5e-4)


def test_fourier_modes_shifted_is_exact_translation():
    """Frozen-flow evolution in closed form: shifted(dx) evaluates the
    UNSHIFTED world at x−dx exactly (a phase shift, no grid, no wrap) —
    the property that makes the mode sum the honest time-evolving truth
    for config 5 (the filter's advect_periodic is then a model, not the
    truth's own evolution operator)."""
    modes = FourierModes(64, amplitude=0.3, outer_scale_km=120.0,
                         kmax_rad_km=0.5, seed=7)
    dx = jnp.asarray([37.5, -12.25, 4.0], jnp.float32)
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-300, 300, (256, 3)), jnp.float32)
    v_shift = modes.shifted(dx).value(pts)
    v_ref = modes.value(pts - dx)
    np.testing.assert_allclose(np.asarray(v_shift), np.asarray(v_ref),
                               rtol=0, atol=5e-5)
    # gradients translate identically
    vs, gs = modes.shifted(dx).value_and_grad(pts)
    vr, gr = modes.value_and_grad(pts - dx)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gr), atol=5e-6)
    # composition: two shifts = one combined shift (exact group action)
    v2 = modes.shifted(dx).shifted(dx).value(pts)
    v2r = modes.shifted(2 * dx).value(pts)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v2r), atol=5e-5)
