"""Antenna/facet selection + plotting smoke tests."""
import numpy as np

from ionotomo_tpu.data import selection
from ionotomo_tpu.data.synth import generate_example_datapack
from ionotomo_tpu.inversion.solution import Solution
from ionotomo_tpu.models import chapman
from ionotomo_tpu.core.grids import Grid3D
from ionotomo_tpu.plotting import plot_tools


def dp():
    d, _ = generate_example_datapack(n_antennas=12, n_directions=6,
                                     n_times=1, grid_shape=(12, 12, 12),
                                     n_samples=17)
    return d


def test_core_remote_partition():
    d = dp()
    core = selection.core_antenna_indices(d, radius_km=5.0)
    remote = selection.remote_antenna_indices(d, radius_km=5.0)
    assert len(core) + len(remote) == d.shape[0]
    assert len(set(core) & set(remote)) == 0
    assert len(core) >= 1 and len(remote) >= 1


def test_select_antennas_by_distance_keeps_ref():
    d = dp()
    sub = selection.select_antennas_by_distance(d, 5)
    assert sub.shape[0] <= 6
    assert sub.array.labels[sub.ref_antenna] == d.array.labels[d.ref_antenna]


def test_facet_max_spread_covers_field():
    d = dp()
    sub = selection.select_facets_max_spread(d, 3)
    assert sub.shape[2] == 3
    # algorithm properties: the centre-most direction is included, and the
    # farthest-from-centre direction is picked next (greedy farthest point)
    radec = d.directions
    x = (radec[:, 0] - radec[:, 0].mean()) * np.cos(radec[:, 1].mean())
    y = radec[:, 1] - radec[:, 1].mean()
    p = np.stack([x, y], -1)
    centermost = d.directions[np.argmin(np.linalg.norm(p, axis=1))]
    assert any(np.allclose(centermost, s) for s in sub.directions)
    first = int(np.argmin(np.linalg.norm(p, axis=1)))
    farthest = d.directions[
        np.argmax(np.linalg.norm(p - p[first], axis=1))]
    assert any(np.allclose(farthest, s) for s in sub.directions)


def test_drop_flagged_never_drops_ref():
    d = dp()
    d.flags[3] = True  # fully flag antenna 3
    d.flags[d.ref_antenna] = True  # and the reference
    sub = selection.drop_flagged(d, max_flag_fraction=0.5)
    assert 3 not in [i for i, lab in enumerate(sub.array.labels)
                     if lab == d.array.labels[3]]
    assert d.array.labels[d.ref_antenna] in sub.array.labels


def test_plots_render(tmp_path):
    d = dp()
    fig = plot_tools.plot_datapack(d, filename=str(tmp_path / "dp.png"))
    assert (tmp_path / "dp.png").exists()

    grid = Grid3D.from_bounds((0, 0, 0), (100, 100, 100), (10, 10, 10))
    m = np.asarray(chapman.log_parametrize(chapman.chapman_field(grid)))
    sol = Solution(grid, np.stack([m, m]))
    plot_tools.plot_model_slices(sol, filename=str(tmp_path / "sl.png"),
                                 truth=sol.ne(0))
    assert (tmp_path / "sl.png").exists()

    recs = [dict(timestep=0, residual=10.0, seconds=1.0),
            dict(timestep=1, residual=3.0, seconds=0.8)]
    plot_tools.plot_convergence(recs, filename=str(tmp_path / "cv.png"))
    assert (tmp_path / "cv.png").exists()


def test_select_antennas_by_distance_returns_exactly_n():
    """n close to Na used to collapse duplicates (np.unique over linspace)
    and silently return fewer antennas (ADVICE r1)."""
    from ionotomo_tpu.data import selection
    dp, _ = generate_example_datapack(
        n_antennas=10, n_directions=2, n_times=1, grid_shape=(12, 12, 12),
        n_samples=9)
    for n in (2, 7, 9, 10, 15):
        sub = selection.select_antennas_by_distance(dp, n)
        assert sub.shape[0] == min(n, 10), (n, sub.shape)
        assert dp.ref_antenna in [0]  # original ref still index 0
    # include_ref keeps the longest baseline in the picked set (the subset
    # ENU frame re-centres, so check membership by label)
    r = np.linalg.norm(dp.array.enu[:, :2], axis=1)
    sub = selection.select_antennas_by_distance(dp, 4)
    assert dp.array.labels[int(np.argmax(r))] in sub.array.labels
    assert dp.array.labels[dp.ref_antenna] in sub.array.labels


def test_animations_write_gifs(tmp_path):
    """Model-slice and datapack animations render and write real gif files
    (SURVEY.md §2 plotting row: 'animations'; VERDICT r1 #9)."""
    grid = Grid3D.from_bounds((-100, -100, 0), (100, 100, 400),
                              (10, 10, 10))
    m = np.stack([np.asarray(chapman.log_parametrize(
        chapman.chapman_field(grid))) + 0.01 * t for t in range(3)])
    sol = Solution(grid, m)
    p1 = tmp_path / "model.gif"
    plot_tools.animate_model(sol, filename=str(p1), fps=2)
    assert p1.exists() and p1.stat().st_size > 200

    d = dp()
    # fake a second timestep so the animation has motion
    import numpy as _np
    d.dtec = _np.concatenate([d.dtec, d.dtec * 0.5], axis=1)
    d.times = _np.concatenate([d.times, d.times + 0.01])
    d.flags = _np.concatenate([d.flags, d.flags], axis=1)
    d.noise_std = _np.concatenate([d.noise_std, d.noise_std], axis=1)
    p2 = tmp_path / "dp.gif"
    plot_tools.animate_datapack(d, filename=str(p2), fps=2)
    assert p2.exists() and p2.stat().st_size > 200


def test_flag_outliers_catches_spikes_not_signal():
    """MAD flagger: injected RFI spikes are flagged, the smooth ionospheric
    signal (including its trend) is not."""
    from ionotomo_tpu.data.selection import flag_outliers

    dp, _ = generate_example_datapack(n_antennas=6, n_directions=4,
                                      n_times=12, grid_shape=(12, 12, 12),
                                      noise_tecu=1e-3, n_samples=9,
                                      wind_kmps=(0.02, 0.01, 0.0))
    base_flags = dp.flags.copy()
    scale = np.abs(dp.dtec).max()
    dp.dtec[2, 5, 1] += 50.0 * scale          # RFI spike
    dp.dtec[4, 0, 3] -= 80.0 * scale          # spike at the series edge
    n = flag_outliers(dp, threshold=6.0)
    assert dp.flags[2, 5, 1] and dp.flags[4, 0, 3]
    # no collateral flags beyond a small false-positive allowance
    assert n <= 4
    # idempotent-ish: second call flags nothing new on clean data
    assert flag_outliers(dp, threshold=6.0) == 0
    # too-short series: untouched
    dp2, _ = generate_example_datapack(n_antennas=4, n_directions=2,
                                       n_times=2, grid_shape=(12, 12, 12),
                                       n_samples=9)
    assert flag_outliers(dp2) == 0
    del base_flags


def test_plot_vtec_map(tmp_path):
    from ionotomo_tpu.plotting.plot_tools import plot_vtec_map
    g = Grid3D.from_bounds((-100, -100, 0), (100, 100, 800), (12, 12, 12))
    m = np.asarray(chapman.log_parametrize(chapman.chapman_field(g)))
    sol = Solution(g, m[None])
    p = tmp_path / "vtec.png"
    plot_vtec_map(sol, filename=str(p), anchors_xy=[[-50, -50], [50, 50]])
    assert p.exists() and p.stat().st_size > 5000
