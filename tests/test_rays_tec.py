"""Tests for straight-ray sampling and the TEC forward equation
(SURVEY.md §4: endpoint/length invariants; TEC vs closed form; dTEC of the
reference antenna ≡ 0; oracle parity; adjoint exactness)."""
import numpy as np
import jax
import jax.numpy as jnp

from ionotomo_tpu.core.grids import Grid3D
from ionotomo_tpu.forward import tec as tec_mod
from ionotomo_tpu.geometry import rays as rays_mod
from ionotomo_tpu.models import chapman
from reference_kernels import tec_ref


def small_world(nx=24, seed=0, n_ants=4, n_dirs=3, perturb=0.3):
    rng = np.random.default_rng(seed)
    ants = np.concatenate([rng.uniform(-20, 20, (n_ants, 2)),
                           np.zeros((n_ants, 1))], axis=-1)
    # directions near zenith
    az = rng.uniform(0, 2 * np.pi, n_dirs)
    zen = rng.uniform(0.05, 0.5, n_dirs)
    dirs = np.stack([np.sin(zen) * np.sin(az), np.sin(zen) * np.cos(az),
                     np.cos(zen)], axis=-1)
    grid = chapman.grid_enclosing_rays(ants, dirs, max_length_km=1000.0,
                                       shape=(nx, nx, nx), h_min_km=0.0)
    ne = chapman.chapman_field(grid)
    m = np.asarray(chapman.log_parametrize(ne))
    if perturb:
        # horizontal structure so that dTEC is non-degenerate: a smooth
        # random field in log-density
        pts = grid.meshgrid()
        blob = np.zeros(grid.shape)
        for _ in range(4):
            c = np.array([rng.uniform(-150, 150), rng.uniform(-150, 150),
                          rng.uniform(200, 500)])
            w = rng.uniform(50, 150)
            blob += rng.normal() * np.exp(
                -0.5 * np.sum((pts - c) ** 2, -1) / w**2)
        m = m + perturb * blob
    return ants, dirs, grid, jnp.asarray(m, jnp.float32)


def test_ray_endpoints_and_length():
    origins = jnp.asarray([[0.0, 0.0, 0.0], [5.0, -3.0, 0.0]])
    dirs = jnp.asarray([[0.0, 0.0, 1.0], [0.6, 0.0, 0.8]])
    rb = rays_mod.sample_straight_rays(origins, dirs, max_length_km=900.0,
                                       n_samples=91)
    assert rb.points.shape == (2, 91, 3)
    np.testing.assert_allclose(np.asarray(rb.points[:, 0]),
                               np.asarray(origins), atol=1e-5)
    end = np.asarray(origins) + 900.0 * np.asarray(dirs)
    np.testing.assert_allclose(np.asarray(rb.points[:, -1]), end, atol=1e-3)
    np.testing.assert_allclose(np.asarray(rb.ds), 10.0, atol=1e-5)


def test_simpson_weights_integrate_cubic_exactly():
    n = 17
    w = np.asarray(rays_mod.simpson_weights(n, jnp.float32), np.float64)
    x = np.linspace(0.0, 1.0, n)
    h = x[1] - x[0]
    f = 3 * x**3 - x**2 + 2 * x - 1
    got = float(np.sum(f * w) * h)
    want = 3 / 4 - 1 / 3 + 1 - 1
    # weights are exact small rationals; only their f32 storage rounds
    assert abs(got - want) < 1e-7


def test_vertical_tec_matches_chapman_closed_form():
    """Vertical ray through a full Chapman layer ≈ N_peak·H·sqrt(2πe)."""
    grid = Grid3D.from_bounds((-50, -50, 0.0), (50, 50, 1500.0),
                              (8, 8, 256))
    ne = chapman.chapman_field(grid, n_peak=1e12, h_peak_km=350.0,
                               scale_km=80.0)
    m = chapman.log_parametrize(ne)
    rb = rays_mod.sample_straight_rays(
        jnp.asarray([[0.0, 0.0, 0.0]]), jnp.asarray([[0.0, 0.0, 1.0]]),
        max_length_km=1500.0, n_samples=257)
    got = float(tec_mod.tec(m, grid, rb)[0])
    want = tec_ref.chapman_tec_analytic(1e12, 350.0, 80.0,
                                        alt_rad=np.pi / 2)
    assert abs(got - want) / want < 2e-3


def test_dtec_reference_antenna_is_zero_and_matches_oracle():
    ants, dirs, grid, m = small_world()
    origins, dvecs = rays_mod.make_ray_batch(ants, dirs)
    rb = rays_mod.sample_straight_rays(origins, dvecs, n_samples=65)
    g = tec_mod.dtec(m, grid, rb, num_directions=dirs.shape[0], i0=1)
    g = np.asarray(g)
    np.testing.assert_allclose(g[1], 0.0, atol=1e-7)

    ref = tec_ref.dtec_ref(np.asarray(m, np.float64), np.asarray(grid.origin),
                           np.asarray(grid.spacing), np.asarray(rb.points),
                           np.asarray(rb.ds), num_directions=dirs.shape[0],
                           i0=1)
    # tolerance contract for the naive (subtract-two-big-integrals) path:
    # f32 cancellation bounds the error at ~eps * |TEC|, not |dTEC|
    tec_scale = np.abs(np.asarray(
        tec_ref.tec_ref(np.asarray(m, np.float64), np.asarray(grid.origin),
                        np.asarray(grid.spacing), np.asarray(rb.points),
                        np.asarray(rb.ds)))).max()
    np.testing.assert_allclose(g, ref, atol=2e-6 * tec_scale)

    # the paired path must do much better: errors at the dTEC scale
    gp = np.asarray(tec_mod.dtec_paired(m, grid, rb,
                                        num_directions=dirs.shape[0], i0=1))
    np.testing.assert_allclose(gp, ref, atol=2e-4 * np.abs(ref).max())
    assert np.abs(gp - ref).max() <= np.abs(g - ref).max() + 1e-9


def test_tec_linear_adjoint_is_exact_transpose():
    """<A x, y> == <x, A^T y> to f32 roundoff — the matrix-free Jacobian
    contract that the whole inversion engine rests on."""
    ants, dirs, grid, m = small_world(nx=16)
    origins, dvecs = rays_mod.make_ray_batch(ants, dirs)
    rb = rays_mod.sample_straight_rays(origins, dvecs, n_samples=33)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=grid.shape), jnp.float32)
    y = jnp.asarray(rng.normal(size=(rb.num_rays,)), jnp.float32)
    ax = tec_mod.tec_linear(x, grid, rb)
    aty = tec_mod.tec_linear_adjoint(y, grid, rb)
    lhs = float(jnp.vdot(ax, y))
    rhs = float(jnp.vdot(x, aty))
    assert abs(lhs - rhs) <= 1e-4 * max(abs(lhs), abs(rhs))


def test_adjoint_and_gradient_are_deterministic():
    """SURVEY §5.2: scatter-add ordering must be deterministic — repeated
    evaluation of the adjoint and of an AD gradient is bitwise identical."""
    import jax
    ants, dirs, grid, m = small_world(nx=16)
    origins, dvecs = rays_mod.make_ray_batch(ants, dirs)
    rb = rays_mod.sample_straight_rays(origins, dvecs, n_samples=33)
    y = jnp.asarray(np.random.default_rng(9).normal(size=(rb.num_rays,)),
                    jnp.float32)
    a1 = np.asarray(tec_mod.tec_linear_adjoint(y, grid, rb))
    a2 = np.asarray(tec_mod.tec_linear_adjoint(y, grid, rb))
    np.testing.assert_array_equal(a1, a2)

    g = jax.jit(jax.grad(lambda mm: jnp.sum(
        tec_mod.tec(mm, grid, rb) ** 2)))
    g1, g2 = np.asarray(g(m)), np.asarray(g(m))
    np.testing.assert_array_equal(g1, g2)


def test_tec_nonlinear_vjp_matches_finite_difference():
    """grad of sum(tec(m)) via jax.grad vs central finite differences."""
    ants, dirs, grid, m = small_world(nx=16)
    origins, dvecs = rays_mod.make_ray_batch(ants, dirs)
    rb = rays_mod.sample_straight_rays(origins, dvecs, n_samples=33)

    def loss(mm):
        return jnp.sum(tec_mod.tec(mm, grid, rb))

    g = np.asarray(jax.grad(loss)(m))
    rng = np.random.default_rng(4)
    v = rng.normal(size=grid.shape).astype(np.float32)
    eps = 1e-3
    fd = (float(loss(m + eps * v)) - float(loss(m - eps * v))) / (2 * eps)
    got = float(np.vdot(g, v))
    assert abs(fd - got) / max(abs(fd), 1e-8) < 5e-3


def test_multi_chapman_layer_stack():
    """E/F1/F2 composite profile: each layer peaks at its nominal height,
    the composite is >= any single layer, the plasmasphere tail decays
    exponentially above the F2 peak, and per-voxel day/night modulation
    weights the E layer more strongly than the transport-dominated F2."""
    import jax.numpy as jnp
    h = jnp.linspace(60.0, 1000.0, 2000)
    ne = chapman.multi_chapman_ne(h)
    assert np.isfinite(np.asarray(ne)).all() and (np.asarray(ne) > 0).all()
    # the global maximum is the F2 peak; E and F1 ride the F2 bottomside
    # as shoulders, so test them as *enhancements*: dropping a layer must
    # remove ~its peak density at its peak height
    ne_np = np.asarray(ne)
    h_np = np.asarray(h)
    assert abs(h_np[np.argmax(ne_np)] - 350.0) < 25.0
    for drop, h_peak, n_peak in (("E", 110.0, 1.2e11),
                                 ("F1", 180.0, 2.5e11)):
        rest = tuple(l for l in chapman.DEFAULT_LAYERS if l[0] != drop)
        ne_rest = np.asarray(chapman.multi_chapman_ne(h, layers=rest))
        i = np.searchsorted(h_np, h_peak)
        np.testing.assert_allclose(ne_np[i] - ne_rest[i], n_peak,
                                   rtol=0.05)
    # composite dominates the single F2 Chapman layer everywhere
    ne_f2 = np.asarray(chapman.chapman_ne(h, 1.0e12, 350.0, 80.0))
    assert (ne_np >= ne_f2 - 1e-3).all()
    # plasmasphere tail: above the F2 peak the tail-on profile exceeds the
    # tail-off one and approaches exp decay at the right scale
    ne_p = np.asarray(chapman.multi_chapman_ne(
        h, plasmasphere_n0=1e10, plasmasphere_scale_km=1000.0))
    hi = h_np > 700.0
    assert (ne_p[hi] > ne_np[hi]).all()
    # the tail onset is smooth: no density step anywhere (adjacent-sample
    # jumps stay far below the n0 step the naive where() would introduce)
    assert np.abs(np.diff(ne_p - ne_np)).max() < 0.05e10
    d = ne_p - ne_np
    i1, i2 = np.searchsorted(h_np, [700.0, 950.0])
    ratio = d[i2] / d[i1]
    want = np.exp(-(h_np[i2] - h_np[i1]) / 1000.0)
    np.testing.assert_allclose(ratio, want, rtol=0.05)
    # night (cos_chi=0): E/F1 collapse to the zenith floor faster than F2
    day = np.asarray(chapman.multi_chapman_ne(h, cos_chi=1.0))
    night = np.asarray(chapman.multi_chapman_ne(h, cos_chi=0.0))
    iE = np.searchsorted(h_np, 110.0)
    iF2 = np.searchsorted(h_np, 350.0)
    assert night[iE] / day[iE] < night[iF2] / day[iF2]

    # grid sampling with a per-voxel terminator: day half > night half at
    # the F2 peak altitude
    from ionotomo_tpu.core.grids import Grid3D
    g = Grid3D.from_bounds((0, 0, 100), (200, 200, 900), (8, 8, 16))
    cos = np.zeros((8, 8, 16), np.float32)
    cos[:4] = 1.0
    f = np.asarray(chapman.multi_chapman_field(g, cos_chi=jnp.asarray(cos)))
    k350 = np.argmin(np.abs(np.asarray(g.axes()[2]) - 350.0))
    assert f[:4, :, k350].mean() > f[4:, :, k350].mean()


def test_altitude_field_curvature():
    """altitude_field: exact z on the central column; matches the exact
    WGS84 ECEF chain off-axis (the reference's astropy-exact heights)."""
    from ionotomo_tpu.geometry import frames

    ref = frames.geodetic_to_ecef(np.deg2rad(52.9), np.deg2rad(6.9), 0.0)
    enu = frames.ENUFrame(ref)
    r_gauss = frames.gaussian_earth_radius(enu.lat)

    g = Grid3D.from_bounds((-500.0, -500.0, 0.0), (500.0, 500.0, 1000.0),
                           (5, 5, 5))
    h = np.asarray(chapman.altitude_field(g, earth_radius_km=r_gauss))
    z_axis = np.asarray(g.axes()[2])
    # central column: ENU z IS altitude
    np.testing.assert_allclose(h[2, 2, :], z_axis, atol=1e-3)
    # corners sit ~+39 km above their plane height at 707 km offset
    assert 30.0 < h[0, 0, 0] < 45.0
    # exact chain: ENU -> ECEF -> geodetic height, all voxels
    ax, ay = np.asarray(g.axes()[0]), np.asarray(g.axes()[1])
    X, Y, Z = np.meshgrid(ax, ay, z_axis, indexing="ij")
    pts = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)
    _, _, h_exact = frames.ecef_to_geodetic(enu.to_ecef(pts))
    err = np.abs(h - h_exact.reshape(h.shape))
    assert err.max() < 0.25  # km, osculating sphere vs ellipsoid at 707 km


def test_chapman_field_curved_vs_flat():
    """Curved evaluation thins the edge-of-grid topside: above the peak the
    true (higher) altitude means lower n_e than the flat-Earth sample."""
    g = Grid3D.from_bounds((-400.0, -400.0, 0.0), (400.0, 400.0, 1000.0),
                           (9, 9, 17))
    flat = np.asarray(chapman.chapman_field(g))
    curved = np.asarray(chapman.chapman_field(g, curved=True))
    z = np.asarray(g.axes()[2])
    k_top = np.searchsorted(z, 600.0)  # well above the 350 km peak
    # central column unchanged
    np.testing.assert_allclose(curved[4, 4, :], flat[4, 4, :], rtol=1e-5)
    # edge columns: curved < flat above the peak (altitude is higher)
    assert (curved[0, 0, k_top:] < flat[0, 0, k_top:]).all()
    # the multi-layer stack honours the same flag
    mflat = np.asarray(chapman.multi_chapman_field(g))
    mcurv = np.asarray(chapman.multi_chapman_field(g, curved=True))
    np.testing.assert_allclose(mcurv[4, 4, :], mflat[4, 4, :], rtol=1e-5)
    assert (mcurv[0, 0, k_top:] < mflat[0, 0, k_top:]).all()


def test_hermite_tec_matches_simpson_and_is_4th_order():
    """tec_hermite (gradient-augmented corrected trapezoid) agrees with
    the converged Simpson value, and its error on a smooth field falls
    ~4th order with sample count (the endpoint correction is what lifts
    trapezoid's 2nd order — without it the coarse error is much larger)."""
    ants, dirs, grid, m = small_world(nx=24)
    origins, dvecs = rays_mod.make_ray_batch(ants, dirs)
    rb_ref = rays_mod.sample_straight_rays(origins, dvecs, n_samples=1025)
    ref = np.asarray(tec_mod.tec(m, grid, rb_ref), np.float64)

    errs = {}
    for n in (17, 33, 129):
        rb = rays_mod.sample_straight_rays(origins, dvecs, n_samples=n)
        h = np.asarray(tec_mod.tec_hermite(m, grid, rb), np.float64)
        s = np.asarray(tec_mod.tec(m, grid, rb), np.float64)
        errs[n] = np.abs(h - ref).max()
        # the gradient-augmented rule beats Simpson at every usable n on
        # this world (measured: 12.7 vs 36.5 @17, 1.4 vs 6.0 @33,
        # 0.08 vs 0.30 @129)
        assert errs[n] < np.abs(s - ref).max()
    # high-order convergence: halving h cuts the error >~5x until the
    # interpolant/f32 floor (asymptotically 16x; 9.1x measured 17->33)
    assert errs[17] / errs[33] > 5.0


def test_dtec_paired_hermite_ref_row_zero_and_converges():
    ants, dirs, grid, m = small_world()
    origins, dvecs = rays_mod.make_ray_batch(ants, dirs)
    nd = dirs.shape[0]
    rb = rays_mod.sample_straight_rays(origins, dvecs, n_samples=65)
    gh = np.asarray(tec_mod.dtec_paired_hermite(m, grid, rb, nd, i0=1))
    np.testing.assert_allclose(gh[1], 0.0, atol=1e-7)
    # converged: hermite and simpson agree at high sample count
    rb_f = rays_mod.sample_straight_rays(origins, dvecs, n_samples=513)
    gh_f = np.asarray(tec_mod.dtec_paired_hermite(m, grid, rb_f, nd, i0=1))
    gs_f = np.asarray(tec_mod.dtec_paired(m, grid, rb_f, nd, i0=1))
    scale = np.abs(gs_f).max()
    np.testing.assert_allclose(gh_f, gs_f, atol=2e-4 * scale)
    # dispatcher routes correctly
    gq = np.asarray(tec_mod.dtec_paired_q(m, grid, rb, nd, 1, "hermite"))
    np.testing.assert_allclose(gq, gh, atol=0)


def test_hermite_operator_adjoint_is_exact_transpose():
    """The AD transpose of the hermite forward (what every solver uses via
    _dtec_operator) satisfies <J x, y> == <x, J^T y>."""
    from ionotomo_tpu.inversion.solvers import _dtec_operator
    ants, dirs, grid, m = small_world(nx=16)
    origins, dvecs = rays_mod.make_ray_batch(ants, dirs)
    rb = rays_mod.sample_straight_rays(origins, dvecs, n_samples=33)
    apply_j, apply_jt, _ = _dtec_operator(grid, rb, dirs.shape[0], 0, m,
                                          quadrature="hermite")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=grid.shape), jnp.float32)
    y = jnp.asarray(rng.normal(size=(ants.shape[0] * dirs.shape[0],)),
                    jnp.float32)
    lhs = float(jnp.vdot(apply_j(x), y))
    rhs = float(jnp.vdot(x, apply_jt(y)))
    assert abs(lhs - rhs) <= 1e-4 * max(abs(lhs), abs(rhs))


def test_map_gn_hermite_matches_simpson_solution():
    """The hermite-quadrature Gauss-Newton solve lands on the same model
    as the simpson solve (both operators are converged at this sampling
    on a smooth world) — the solver-level wiring test."""
    from ionotomo_tpu.inversion.priors import GPCovariance
    from ionotomo_tpu.inversion.solvers import map_gauss_newton
    ants, dirs, grid, m_true = small_world(nx=16, perturb=0.25)
    m_prior, _, _, _ = small_world(nx=16, perturb=0.0)[3], None, None, None
    _, _, _, m_prior = small_world(nx=16, perturb=0.0)
    origins, dvecs = rays_mod.make_ray_batch(ants, dirs)
    nd = dirs.shape[0]
    rb = rays_mod.sample_straight_rays(origins, dvecs, n_samples=65)
    d = tec_mod.dtec_paired(m_true, grid, rb, nd, 0)
    cov = GPCovariance.create(grid, sigma=0.3, length_scale=100.0,
                              kind="sqexp")
    kw = dict(num_directions=nd, gn_iters=1, cg_iters=15)
    rs = map_gauss_newton(grid, rb, d, 1.0, m_prior, cov,
                          quadrature="simpson", **kw)
    rh = map_gauss_newton(grid, rb, d, 1.0, m_prior, cov,
                          quadrature="hermite", **kw)
    # same reconstruction to well under the update's own scale
    upd = float(jnp.abs(rs.m - m_prior).max())
    assert upd > 1e-3                      # the solve actually did something
    assert float(jnp.abs(rs.m - rh.m).max()) < 0.05 * upd


def test_background_ne_fn_matches_field_builders():
    """The split-tracer's analytic background equals the grid field
    builders it mirrors — including per-layer solar sensitivity and the
    unmodulated plasmasphere tail in the multi-layer form (review r3)."""
    grid = Grid3D.from_bounds((-200, -200, 0.0), (200, 200, 1100.0),
                              (8, 8, 40))
    pts = jnp.asarray(grid.meshgrid().reshape(-1, 3), jnp.float32)

    # single layer with solar factor
    f1 = chapman.background_ne_fn(n_peak=9e11, h_peak_km=340.0,
                                  scale_km=70.0, cos_chi=0.3)
    ne1, _ = f1(pts)
    want1 = chapman.chapman_field(grid, n_peak=9e11, h_peak_km=340.0,
                                  scale_km=70.0, cos_chi=0.3)
    np.testing.assert_allclose(np.asarray(ne1).reshape(grid.shape),
                               np.asarray(want1), rtol=2e-5)

    # multi-layer at night: per-layer factor**sensitivity + unmodulated
    # plasmasphere tail must match multi_chapman_field exactly
    f2 = chapman.background_ne_fn(layers=chapman.DEFAULT_LAYERS,
                                  cos_chi=0.02, plasmasphere_n0=1e10)
    ne2, g2 = f2(pts)
    want2 = chapman.multi_chapman_field(grid, cos_chi=0.02,
                                        plasmasphere_n0=1e10)
    np.testing.assert_allclose(np.asarray(ne2).reshape(grid.shape),
                               np.asarray(want2), rtol=2e-5)
    assert np.isfinite(np.asarray(g2)).all()


def test_inner_bundle_subsamples_uniformly():
    """inner_bundle: every-k-th sample with endpoints kept and ds scaled,
    for flat (R,N,3) and stacked (Nt,R,N,3) bundles; clear errors on
    non-divisible or degenerate requests."""
    import pytest
    from ionotomo_tpu.geometry.rays import (RayBundle, inner_bundle,
                                            sample_straight_rays)

    origins = np.zeros((4, 3), np.float32)
    dirs = np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (4, 1))
    rb = sample_straight_rays(origins, dirs, max_length_km=600.0,
                              n_samples=65)
    rc = inner_bundle(rb, 33)
    assert rc.points.shape == (4, 33, 3)
    np.testing.assert_allclose(np.asarray(rc.points),
                               np.asarray(rb.points[:, ::2]))
    np.testing.assert_allclose(np.asarray(rc.ds), 2 * np.asarray(rb.ds))
    # endpoints preserved -> same integration interval
    np.testing.assert_allclose(np.asarray(rc.points[:, -1]),
                               np.asarray(rb.points[:, -1]))

    seq = RayBundle(points=jnp.stack([rb.points] * 3),
                    ds=jnp.stack([rb.ds] * 3))
    rcs = inner_bundle(seq, 17)          # stride 4
    assert rcs.points.shape == (3, 4, 17, 3)

    with pytest.raises(ValueError):
        inner_bundle(rb, 32)             # 64 % 31 != 0
    with pytest.raises(ValueError):
        inner_bundle(rb, 1)
    with pytest.raises(ValueError):
        inner_bundle(rb, 65)


def test_zp_operator_matches_cubic_physics():
    """The interp="zp" forward operators model the same field samples:
    dTEC within the inter-model budget of "cubic", vanishing reference
    row, and the Hermite/Simpson pair staying consistent under zp."""
    ants, dirs, grid, m = small_world()
    o, d = rays_mod.make_ray_batch(jnp.asarray(ants, jnp.float32),
                                   jnp.asarray(dirs, jnp.float32))
    rb = rays_mod.sample_straight_rays(o, d, max_length_km=1000.0,
                                       n_samples=65)
    nd = dirs.shape[0]
    g_c = np.asarray(tec_mod.dtec_paired_q(m, grid, rb, nd, 0, "hermite"))
    g_z = np.asarray(tec_mod.dtec_paired_q(m, grid, rb, nd, 0, "hermite",
                                           "zp"))
    assert np.allclose(g_z[0], 0.0)
    scale = np.abs(g_c).max()
    assert np.abs(g_z - g_c).max() < 0.02 * scale, (g_z, g_c)
    g_zs = np.asarray(tec_mod.dtec_paired_q(m, grid, rb, nd, 0, "simpson",
                                            "zp"))
    assert np.abs(g_zs - g_z).max() < 0.02 * scale


def test_zp_operator_adjoint_is_exact_transpose():
    """<J x, y> == <x, Jᵀ y> through prefilter + gather + quadrature for
    both the nonlinear paired-hermite Jacobian and the linear operator's
    explicit adjoint (which routes through jax.linear_transpose)."""
    ants, dirs, grid, m = small_world(nx=16)
    o, d = rays_mod.make_ray_batch(jnp.asarray(ants, jnp.float32),
                                   jnp.asarray(dirs, jnp.float32))
    rb = rays_mod.sample_straight_rays(o, d, max_length_km=1000.0,
                                       n_samples=33)
    nd = dirs.shape[0]
    rng = np.random.default_rng(5)

    def fwd(mm):
        return tec_mod.dtec_paired_hermite(mm, grid, rb, nd, 0, "zp")

    x = jnp.asarray(rng.normal(size=grid.shape), jnp.float32)
    _, jvp = jax.linearize(fwd, m)
    y = jnp.asarray(rng.normal(size=(ants.shape[0], nd)), jnp.float32)
    (jty,) = jax.linear_transpose(jvp, m)(y)
    lhs = float(jnp.vdot(jvp(x), y))
    rhs = float(jnp.vdot(x, jty))
    assert abs(lhs - rhs) <= 1e-4 * max(abs(lhs), 1.0)

    # linear operator + explicit adjoint entry point
    ne = jnp.asarray(rng.normal(size=grid.shape), jnp.float32)
    yr = jnp.asarray(rng.normal(size=(rb.num_rays,)), jnp.float32)
    lhs = float(jnp.vdot(tec_mod.tec_linear(ne, grid, rb, "zp"), yr))
    rhs = float(jnp.vdot(ne, tec_mod.tec_linear_adjoint(yr, grid, rb,
                                                        "zp")))
    assert abs(lhs - rhs) <= 1e-4 * max(abs(lhs), 1.0)


def test_map_gn_zp_matches_cubic_solution():
    """A MAP solve under interp="zp" reconstructs essentially the same
    model as under "cubic" on a smooth world (same data, same prior):
    the field-model choice is a numerics knob, not a physics change."""
    from ionotomo_tpu.inversion.priors import GPCovariance
    from ionotomo_tpu.inversion import solvers
    ants, dirs, grid, m_true = small_world(nx=20, n_ants=6, n_dirs=4)
    o, d = rays_mod.make_ray_batch(jnp.asarray(ants, jnp.float32),
                                   jnp.asarray(dirs, jnp.float32))
    rb = rays_mod.sample_straight_rays(o, d, max_length_km=1000.0,
                                       n_samples=33)
    nd = dirs.shape[0]
    d_obs = tec_mod.dtec_paired_q(m_true, grid, rb, nd, 0, "hermite")
    m_prior = chapman.log_parametrize(chapman.chapman_field(grid))
    cov = GPCovariance.create(grid, kind="exponential", sigma=0.3,
                              length_scale=80.0)
    sols = {}
    for interp in ("cubic", "zp"):
        res = solvers.map_gauss_newton(
            grid, rb, d_obs, 0.05, m_prior, cov, num_directions=nd,
            i0=0, gn_iters=2, cg_iters=15, interp=interp)
        sols[interp] = np.asarray(res.m)
        assert np.isfinite(sols[interp]).all()
    dm = np.abs(sols["zp"] - sols["cubic"]).max()
    span = np.abs(sols["cubic"] - np.asarray(m_prior)).max()
    assert dm < 0.15 * span, (dm, span)


def test_interp_fast_chunked_matches_monolithic(monkeypatch):
    """The lax.map point-chunking of tec._interp_fast (pencil-memory
    bound, budgets overridable via IONO_TEC_MONO_MB / IONO_TEC_CHUNK_MB
    — DESIGN.md §20) is
    a pure execution-shape choice: values AND the VJP through the field
    must match the monolithic path to f32 reduction-order noise, for
    every field model. Guards the budget knob: a wrong chunk/pad seam
    would show up here as a value or adjoint mismatch."""
    _, _, grid, m = small_world(nx=16)
    rng = np.random.default_rng(3)
    lo = np.asarray(grid.origin) + 1.0
    hi = lo + (np.asarray(grid.shape) - 3) * np.asarray(grid.spacing)
    pts = jnp.asarray(rng.uniform(lo, hi, (20011, 3)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(20011,)), jnp.float32)
    for interp in ("cubic", "zp", "zpc"):
        def val(field, p=pts, i=interp):
            return tec_mod._interp_fast(field, grid, p, i)
        monkeypatch.delenv("IONO_TEC_CHUNK_MB", raising=False)
        monkeypatch.delenv("IONO_TEC_MONO_MB", raising=False)
        v_mono, vjp_mono = jax.vjp(val, m)
        g_mono = vjp_mono(ct)[0]
        # budget of 1 MiB forces the lax.map path (chunk=8192 < 20011)
        monkeypatch.setenv("IONO_TEC_CHUNK_MB", "1")
        monkeypatch.setenv("IONO_TEC_MONO_MB", "0")
        v_chunk, vjp_chunk = jax.vjp(val, m)
        g_chunk = vjp_chunk(ct)[0]
        vtol = 1e-5 * float(jnp.abs(v_mono).max())
        np.testing.assert_allclose(np.asarray(v_chunk), np.asarray(v_mono),
                                   rtol=0, atol=vtol, err_msg=interp)
        scale = float(jnp.abs(g_mono).max())
        assert float(jnp.abs(g_chunk - g_mono).max()) <= 1e-5 * scale, interp
