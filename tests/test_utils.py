"""Metrics, debugging-mode, and turbulence/frozen-flow unit tests."""
import json

import numpy as np
import jax.numpy as jnp
import pytest

from ionotomo_tpu.core.grids import Grid3D
from ionotomo_tpu.models.turbulence import (turbulent_log_perturbation,
                                            turbulent_realizations)
from ionotomo_tpu.models.frozen_flow import (advect_periodic,
                                             frozen_flow_sequence)
from ionotomo_tpu.utils.metrics import MetricsWriter, rates, timed
from ionotomo_tpu.utils.debugging import checked, assert_all_finite


def test_metrics_jsonl_roundtrip(tmp_path):
    w = MetricsWriter(str(tmp_path / "sub" / "m.jsonl"))
    w.write(dict(step=0, residual=1.5))
    w.write(dict(step=1, residual=0.5, note="x"))
    recs = w.read_all()
    assert len(recs) == 2
    assert recs[1]["note"] == "x"
    assert all("t_wall" in r for r in recs)
    # file is valid JSONL
    lines = open(w.path).read().strip().splitlines()
    assert all(json.loads(ln) for ln in lines)


def test_rates_and_timer():
    r = rates(1000, 10, 2.0)
    assert r["rays_per_sec"] == 500.0
    assert r["ray_steps_per_sec"] == 5000.0
    rec = {}
    with timed(rec, "block"):
        sum(range(1000))
    assert rec["block"] > 0


def test_checked_raises_on_nan():
    def bad(x):
        return jnp.log(x)  # NaN for negative input

    f = checked(bad, enabled=True)
    ok = f(jnp.asarray([1.0, 2.0]))
    assert np.isfinite(np.asarray(ok)).all()
    with pytest.raises(Exception):
        f(jnp.asarray([-1.0]))
    # disabled mode propagates silently
    g = checked(bad, enabled=False)
    assert np.isnan(np.asarray(g(jnp.asarray([-1.0])))).all()


def test_assert_all_finite():
    assert_all_finite({"a": np.ones(3)})
    with pytest.raises(FloatingPointError):
        assert_all_finite({"a": np.asarray([1.0, np.nan])})


def test_turbulence_statistics():
    grid = Grid3D.from_bounds((0, 0, 0), (200, 200, 200), (32, 32, 32))
    f = turbulent_log_perturbation(grid, amplitude=0.4, seed=3)
    f = np.asarray(f)
    assert abs(f.std() - 0.4) < 1e-3       # normalised amplitude
    assert abs(f.mean()) < 1e-2            # zero mean
    # spectrum slope: large scales carry more power than small scales
    spec = np.abs(np.fft.rfftn(f)) ** 2
    k_low = spec[1:4, 1:4, 1:4].mean()
    k_high = spec[10:14, 10:14, 10:14].mean()
    assert k_low > 10 * k_high


def test_turbulent_realizations_independent():
    grid = Grid3D.from_bounds((0, 0, 0), (100, 100, 100), (16, 16, 16))
    r = np.asarray(turbulent_realizations(grid, 3, amplitude=0.3, seed=0))
    assert r.shape[0] == 3
    c01 = np.corrcoef(r[0].ravel(), r[1].ravel())[0, 1]
    assert abs(c01) < 0.2


def test_frozen_flow_shift_matches_roll():
    """Integer-voxel shifts must equal exact np.roll."""
    grid = Grid3D.create((0, 0, 0), (2.0, 2.0, 2.0), (16, 16, 16))
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.normal(size=grid.shape), jnp.float32)
    shifted = advect_periodic(f, grid, jnp.asarray([4.0, -2.0, 0.0]))
    want = np.roll(np.roll(np.asarray(f), 2, axis=0), -1, axis=1)
    np.testing.assert_allclose(np.asarray(shifted), want, atol=2e-4)


def test_frozen_flow_sequence_shapes_and_consistency():
    grid = Grid3D.create((0, 0, 0), (2.0, 2.0, 2.0), (12, 12, 12))
    f = jnp.asarray(np.random.default_rng(1).normal(size=grid.shape),
                    jnp.float32)
    seq = frozen_flow_sequence(f, grid, (1.0, 0.0, 0.0), 2.0, 3)
    assert seq.shape == (3,) + grid.shape
    np.testing.assert_allclose(np.asarray(seq[0]), np.asarray(f), atol=1e-4)
    one = advect_periodic(f, grid, jnp.asarray([2.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(seq[1]), np.asarray(one),
                               atol=1e-4)


def test_vtec_map_matches_profile_integral():
    """VTEC of a horizontally uniform Chapman field equals the 1-D
    profile integral in every column."""
    import jax.numpy as jnp
    from ionotomo_tpu.core.grids import Grid3D
    from ionotomo_tpu.forward.tec import vtec_map
    from ionotomo_tpu.geometry.rays import simpson_weights
    from ionotomo_tpu.models import chapman
    from ionotomo_tpu import constants

    g = Grid3D.from_bounds((0, 0, 80), (300, 300, 1000), (12, 10, 65))
    ne = chapman.chapman_field(g)
    m = chapman.log_parametrize(ne)
    v = np.asarray(vtec_map(m, g))
    assert v.shape == (12, 10)
    z = np.asarray(g.axes()[2])
    prof = np.asarray(chapman.chapman_ne(z))
    w = np.asarray(simpson_weights(65, np.float64))
    want = (prof * w).sum() * (z[1] - z[0]) * 1e3 / constants.TEC_SCALE
    np.testing.assert_allclose(v, want, rtol=1e-5)
    # sanity: a ~30 TECU Chapman column = ~3e4 working units (mTECU)
    assert 1e4 < want < 1e5


def test_structure_function_recovers_kolmogorov_slope():
    """Phases drawn from a GP with k(r) = s2*exp(-(r/L)^(5/3)) have
    D(b) = 2 s2 (b/L)^(5/3) for b << L: the fitted exponent must land on
    5/3 and the fitted amplitude on 2 s2 / L^(5/3)."""
    from ionotomo_tpu.utils.diagnostics import (structure_function,
                                                fit_structure_exponent)
    rng = np.random.default_rng(0)
    na, m, s2, big_l = 40, 6000, 0.8, 400.0
    pos = np.concatenate([rng.uniform(0, 60, (na, 2)),
                          np.zeros((na, 1))], -1)
    r = np.linalg.norm(pos[:, None, :2] - pos[None, :, :2], axis=-1)
    k = s2 * np.exp(-((r / big_l) ** (5.0 / 3.0)))
    chol = np.linalg.cholesky(k + 1e-10 * np.eye(na))
    vals = chol @ rng.standard_normal((na, m))
    b, d, n = structure_function(pos, vals, n_bins=10)
    ok = np.isfinite(d)
    assert ok.sum() >= 6 and (np.diff(d[ok]) > 0).mean() > 0.7
    beta, c, r_diff = fit_structure_exponent(b, d)
    assert abs(beta - 5.0 / 3.0) < 0.2
    np.testing.assert_allclose(c, 2 * s2 / big_l ** (5.0 / 3.0),
                               rtol=0.25)
    # D ~ 2 s2 (b/L)^(5/3) = 1 at b = L (2 s2)^(-3/5)... sanity: finite,
    # beyond the sampled baselines but within the 10x-extrapolation gate
    assert b[ok].max() < r_diff < 10 * 10 * b[ok].max()


def test_phase_structure_function_on_datapack():
    from ionotomo_tpu.data.synth import generate_example_datapack
    from ionotomo_tpu.utils.diagnostics import phase_structure_function

    dp, _ = generate_example_datapack(n_antennas=12, n_directions=6,
                                      n_times=2, grid_shape=(14, 14, 14),
                                      seed=5, n_samples=33)
    b, d, n = phase_structure_function(dp, n_bins=6)
    ok = np.isfinite(d)
    assert ok.sum() >= 3
    assert (d[ok] >= 0).all() and n.sum() == 12 * 11 / 2
