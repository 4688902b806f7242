"""Time-evolving tomography: frozen-flow Kalman filter (config 5).

Model (SURVEY.md §8): state = log-density grid m_t; transition = frozen-flow
advection by the bulk wind (n_e(x, t+Δt) = n_e(x − vΔt, t)) plus process
noise; measurement = the dTEC ray operator.

TPU-native filter design: the full voxel covariance (10⁶×10⁶ for 128³) is
never formed. Instead the filter runs in the **stationary-covariance
approximation** — the reference's own operating regime, where the prior
covariance C_m (GP kernel, applied spectrally) is advected-invariant
(stationary kernels commute with translation) and process noise re-inflates
toward C_m via the fade factor γ. The approximation's known limitation:
C never narrows with accumulated information, so per-step updates stay
prior-weighted (conservative gain, never over-confident). When calibrated
time-propagated uncertainty matters, use ``ensemble_kalman_filter`` below
— its ensemble carries the information the stationary filter discards,
with multiplicative ``inflation`` and additive ``process_sigma`` noise as
the standard EnKF calibration controls. (``spectrum_blend`` — refitting
the gain covariance from the ensemble's shell spectrum per step — is
retained as an experimental off-by-default knob: measured neutral in
every regime tried, including the dense-coverage/long-assimilation one
it was hypothesised for; see its parameter doc.)

    predict:  m_pred = advect(m_t, vΔt);  C ≡ C_m (γ-blended prior pull)
    update:   data-space representer solve, exactly config 4's CG:
              m_{t+1} = m_pred + C Jᵀ (J C Jᵀ + C_d)⁻¹ (d_t − g(m_pred))

The whole 30-step filter is one lax.scan over timesteps: ray geometry for
all steps is precomputed and stacked; no host round-trips inside the loop.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import linalg
from ..core.grids import Grid3D
from ..forward import tec as tec_mod
from ..geometry.rays import RayBundle
from ..models.frozen_flow import advect_periodic
from .priors import GPCovariance, fit_shell_spectrum


def initial_ensemble(grid: Grid3D, cov: GPCovariance, m0, key,
                     n_members: int):
    """The EnKF's initial ensemble: prior mean + n_members prior draws
    (the reserved key slot ``fold_in(key, 0x7FFFFFFF)`` — outside the
    per-step fold_in(key, t) stream, so chunked/resumed runs that re-seed
    per chunk never collide with it). Factored out so callers that want
    a member-sharded filter can build ens0, device_put it over a
    parallel.member_mesh, and pass it as ``ens0=``."""
    init_key = jax.random.fold_in(key, 0x7FFFFFFF)
    init_noise = jax.vmap(
        lambda k: cov.apply_sqrt(jax.random.normal(k, grid.shape)))(
            jax.random.split(init_key, n_members))
    return m0[None] + init_noise


def _wind_innovation_refine(grid, m_t, rays_t, d_t, cd_t, clim, wind,
                            dt_s, fade, num_directions, i0, quadrature,
                            interp, n_iters, damping, wind_mask):
    """Damped Gauss-Newton on the innovation over the wind parameters
    (kalman_filter ``wind_adapt_iters`` doc) — a (3,) rigid wind or a
    (2,3) rigid+shear state (models.frozen_flow.advect_periodic). The
    phase-ramp advection is analytic in the shift; jax.linearize gives
    the k-column Jacobian as k forward tangents through advect +
    forward model (k = number of unmasked parameters ≤ w.size)."""
    k = wind.size

    def resid(w):
        m_adv_w = advect_periodic(m_t, grid, (w * wind_mask) * dt_s)
        m_pred_w = fade * m_adv_w + (1 - fade) * clim
        return ((d_t.ravel()
                 - tec_mod.dtec_paired_q(m_pred_w, grid, rays_t,
                                         num_directions, i0,
                                         quadrature, interp).ravel())
                / jnp.sqrt(cd_t))

    basis = jnp.eye(k, dtype=wind.dtype).reshape((k,) + wind.shape)

    def gn_iter(w, _):
        r, jvp_w = jax.linearize(resid, w)
        j_cols = jnp.stack([jvp_w(e) for e in basis], axis=1)
        # explicit elementwise-then-sum contractions: the data axis may
        # be ray-sharded (sharding-in-types), where a dot_general over
        # the sharded axis is ambiguous but a sum-reduction is a psum.
        # Masked parameters have zero columns; the Levenberg term keeps
        # the system nonsingular and their update is exactly 0.
        g = jnp.sum(j_cols * r[:, None], axis=0)
        h = jnp.sum(j_cols[:, :, None] * j_cols[:, None, :], axis=0)
        lam = damping * (jnp.trace(h) / k + 1e-12)
        dw = jnp.linalg.solve(h + lam * jnp.eye(k), g).reshape(w.shape)
        return (w - dw) * wind_mask + w * (1 - wind_mask), None

    w_out, _ = jax.lax.scan(gn_iter, wind, None, length=n_iters)
    return w_out


#: Rows with noise variance above this are flag-inflated (serving uses
#: noise_std = 1e6 for flagged data → variance 1e12) and are excluded from
#: innovation-consistency statistics — they carry no information about the
#: true noise floor and their near-zero whitened innovations would bias
#: the estimated scale toward zero.
_FLAG_VAR_CUTOFF = 1e9


def _innov_noise_scale_sq(nu, s_diag, v_diag, n_iter: int = 8):
    """Per-epoch noise-scale-squared estimate ρ̂² from one innovation
    vector — the statistic behind the online filters' adaptive
    observation-noise scale (``OnlineKalman(adapt_r=...)``).

    Model: under the filter's own assumed statistics the innovation is
    ν_i ~ N(0, s_i + ρ²·v_i) with s_i = diag(H P_f Hᵀ) the predicted
    signal variance and v_i the currently-applied noise variance; ρ² = 1
    means the noise is calibrated. This function returns the
    one-parameter maximum-likelihood ρ̂² by its fixed-point iteration

        ρ² ← Σ_i a_i (ν_i² − s_i) / Σ_i a_i v_i,   a_i = v_i/(s_i+ρ²v_i)²

    NOT the naive moment match mean[(ν²−s)/v]: with truncated-Krylov
    tomography most rows have s_i ≫ v_i, where (ν_i² − s_i)/v_i is an
    enormous near-cancellation whose sampling noise (probe or ensemble)
    swamps the answer (measured: ±1e7 on a 12-row epoch whose true ρ² was
    9). The MLE weights a_i ~ v/(s+ρ²v)² give such rows asymptotically
    zero weight — only rows where noise is a visible fraction of the
    innovation budget inform ρ̂, which is exactly the identifiable subset.

    Flag-inflated rows (``_FLAG_VAR_CUTOFF``) are masked out entirely.
    The estimate is clipped to [1e-2, 1e4] per epoch; the online wrappers
    EMA it across epochs (``adapt_r`` is the EMA weight), so single-epoch
    sampling noise averages out."""
    mask = v_diag < _FLAG_VAR_CUTOFF
    v = jnp.where(mask, v_diag, 1.0)
    a_mask = mask.astype(nu.dtype)
    nu2 = nu * nu
    rho2 = jnp.float32(1.0)
    for _ in range(n_iter):        # unrolled: row-space ops, negligible
        tot = s_diag + rho2 * v
        a = a_mask * v / (tot * tot)
        num = jnp.sum(a * (nu2 - s_diag))
        den = jnp.sum(a * v)
        rho2 = jnp.clip(num / jnp.maximum(den, 1e-20), 1e-2, 1e4)
    return rho2


@partial(jax.jit, static_argnames=("num_directions", "i0", "rank",
                                   "power_iters", "oversample",
                                   "quadrature", "interp"))
def update_operator_eigs(grid: Grid3D, rays: RayBundle, noise_std, m_lin,
                         cov: GPCovariance, num_directions: int, key,
                         rank: int = 16, i0: int = 0, power_iters: int = 2,
                         oversample: int = 8,
                         quadrature: str = "hermite",
                         interp: str = "cubic"):
    """Top-``rank`` eigenpairs of the filter/MAP update operator
    I + C^{1/2} Jᵀ C_d⁻¹ J C^{1/2}, linearised at ``m_lin`` — a
    spectrum diagnostic (randomized subspace iteration,
    core.linalg.subspace_eigs): the decay of ``lam`` is the effective
    number of data-dominated directions per update and λ₁ the system's
    condition number, the quantities that size ``cg_iters``.

    NOT a preconditioner hook: spectrally deflating these directions in
    the truncated-CG updates is measurably harmful — it inverts the
    fit-dominant-directions-first order that truncation-as-
    regularisation relies on (4× error growth at matched depth on the
    tracking world; bench/probe_deflation.py, DESIGN.md §17).

    Cost: ``(power_iters + 1) · (rank + oversample)`` operator
    applications.
    """
    na = rays.points.shape[0] // num_directions
    cd = jnp.broadcast_to(jnp.asarray(noise_std),
                          (na, num_directions)).ravel() ** 2
    inv_cd = 1.0 / cd

    def fwd(m):
        return tec_mod.dtec_paired_q(m, grid, rays, num_directions, i0,
                                     quadrature, interp).ravel()

    _, jvp = jax.linearize(fwd, m_lin)
    vjp = jax.linear_transpose(jvp, m_lin)

    def matvec(u):
        v = cov.apply_sqrt(u.reshape(grid.shape))
        w = jvp(v) * inv_cd
        (z,) = vjp(w)
        return u + cov.apply_sqrt(z).ravel()

    return linalg.subspace_eigs(matvec, grid.num_voxels, rank, key,
                                iters=power_iters, oversample=oversample)


class KalmanResult(NamedTuple):
    m_seq: jax.Array            # (Nt, *grid.shape) filtered states
    residuals: jax.Array        # (Nt,) pre-update whitened residual norms
    post_residuals: jax.Array   # (Nt,) post-update whitened residual norms
    wind_seq: jax.Array = None  # (Nt, 3) — or (Nt, 2, 3) for the
                                # rigid+shear wind state — per-step wind
                                # [km/s] when wind_adapt_iters > 0
    innov_q: jax.Array = None   # (Nt,) per-epoch noise-scale-squared
                                # MLEs when innov_stats=True (see
                                # _innov_noise_scale_sq)


@partial(jax.jit, static_argnames=("num_directions", "i0", "cg_iters",
                                   "advect_first", "anchor_cg_iters",
                                   "quadrature", "interp", "wind_adapt_iters",
                                   "wind_adapt_horizontal", "innov_stats",
                                   "stats_probes", "interp_inner"))
def kalman_filter(grid: Grid3D, rays_seq: RayBundle, d_obs_seq, noise_std,
                  m0, cov: GPCovariance, wind_kmps, dt_s,
                  num_directions: int, i0: int = 0, cg_iters: int = 30,
                  cg_tol: float = 1e-4, fade: float = 1.0,
                  advect_first: bool = False, m_clim=None,
                  anchors=None, anchor_values_seq=None,
                  anchor_cov: GPCovariance = None,
                  anchor_cg_iters: int = 8,
                  quadrature: str = "hermite", interp: str = "cubic",
                  m_clim_seq=None,
                  rays_inner_seq: RayBundle = None,
                  wind_adapt_iters: int = 0,
                  wind_adapt_damping: float = 0.1,
                  wind_adapt_horizontal: bool = True,
                  innov_stats: bool = False, stats_key=None,
                  stats_probes: int = 2, interp_inner: str = None):
    """Run the filter over Nt timesteps.

    rays_seq: RayBundle with leading time axis — points (Nt, R, N, 3),
    ds (Nt, R). d_obs_seq: (Nt, Na, Nd). fade ∈ (0, 1]: per-step pull of
    the prediction toward the climatological prior mean m0 (process-noise
    proxy; 1.0 = pure frozen flow). ``advect_first``: advect before the
    first update too — used when this call continues a filter from a
    checkpointed state (m0 is then the filtered state at the previous
    timestep, not the t=0 initial condition), so the pipeline can chunk a
    long sequence into several scans without changing the result.
    ``m_clim``: the climatological field the fade pull targets (defaults to
    m0 — but a chunked continuation must pass the original prior, since its
    m0 is the carried filter state).

    ``anchors`` (inversion.anchors.TecAnchors): per-epoch absolute-TEC
    constraints (e.g. GNSS VTEC maps at the observation cadence). Each
    step's *prediction* is first MAP-updated against the epoch's anchor
    values through ``anchor_cov`` (the long-horizontal background-error
    covariance — pipeline.anchor_background_cov; required with anchors),
    then the dTEC update runs as usual — the per-step form of the
    sequential assimilation of DESIGN.md §8, pinning the absolute level
    the dTEC rows cannot see as it drifts over the sequence.
    ``anchor_values_seq`` (Nt, A) overrides ``anchors.values`` with
    per-epoch values (default: the same values every epoch).

    ``m_clim_seq`` (Nt, *grid.shape): per-epoch climatological fields —
    a streaming deployment crossing the day/night terminator must NOT
    fade toward a background frozen at bootstrap (VERDICT r2 weak #3);
    pass the solar-zenith-modulated Chapman field per epoch and the fade
    pull tracks the diurnal cycle. None (default) keeps the static
    ``m_clim``.

    ``rays_inner_seq``: optional coarser-sampled bundle over the SAME
    geometry (e.g. hermite@33 vs the fine @65) for the linear solve —
    mixed-fidelity (inexact Gauss-Newton) updates. The data misfit and
    all residuals are evaluated with the full-fidelity forward on
    ``rays_seq`` (the coarse rule's systematic quadrature bias never
    enters them); the update's Jacobian — rhs and matvec both, which is
    what keeps the step a contraction — is the coarse operator's.
    Measured (config 5, BENCH_LOCAL.md) vs the full-fidelity filter:
    ~1.55× faster (42.0 → 27.1 s) at ~1.5% held-out cost, where running
    *everything* coarse (the residuals too) loses ~4%.

    ``innov_stats`` (with ``stats_key``): also return the per-step
    noise-scale-squared MLE ``innov_q`` (see ``_innov_noise_scale_sq``)
    — the statistic behind the online filters' adaptive observation-noise
    scale. The signal term diag(H C_m Hᵀ) is estimated with
    ``stats_probes`` C^{1/2}-filtered probes per step pushed through the
    full-fidelity JVP (two extra forward tangents at the default); the
    probe draws are keyed by ``fold_in(stats_key, step)``, so chunked/
    restarted sequences reproduce the statistic bit-exactly.

    ``interp_inner``: mixed FIELD-MODEL fidelity — the update's Jacobian
    (rhs and matvec) runs on this field model while the innovation and
    residuals stay on ``interp`` (e.g. interp="cubic",
    interp_inner="zp" at 256³: the 8-row box-spline operator drives the
    step at ~2× lower gather cost; its near-Nyquist xy bias never
    enters the misfit — see solvers.map_gauss_newton and DESIGN.md
    §14/§16). Composes with ``rays_inner_seq``; with neither, the
    update is single-fidelity.

    Cross-step Krylov reuse is deliberately ABSENT: both measured forms
    hurt. Warm-starting the solution across steps accumulates fit depth
    against fresh noise and diverges (DESIGN.md §16), and spectral
    deflation of the shared dominant data directions
    (linalg.subspace_eigs + spectral_preconditioner; VERDICT r3 #2's
    "deflation basis") is measurably WORSE at every rank/accuracy tried
    — flattening the top of the spectrum inverts truncated CG's
    fit-dominant-directions-first order, which is precisely the
    regularisation this solver family relies on (measured 4× error
    growth at matched depth; bench/probe_deflation.py, DESIGN.md §17).

    ``wind_adapt_iters`` (> 0 enables): online wind tracking. Real
    frozen-flow drift is not constant over an observation run; a fixed
    wrong wind advects structure off its true path and the filter
    re-learns it from scratch each step. Before each predict (except the
    first step of a fresh sequence, which has no transition), the wind
    is refined by this many damped Gauss-Newton iterations on the
    *innovation*: w minimising ‖d_t − g(fade·advect(m_t, w·Δt) +
    (1−fade)·clim)‖²_{C_d⁻¹} — the spectral phase-ramp advection is
    analytic in the shift, so the 3-column Jacobian is three forward
    tangents. The carried wind persists across chunked calls via
    ``wind_seq[-1]`` → the next call's ``wind_kmps`` (the pipeline and
    online filters do this). ``wind_adapt_damping`` is the relative
    Levenberg damping (λ = damping·tr(JᵀJ)/3);
    ``wind_adapt_horizontal`` pins v_z = 0 (ionospheric drift is
    horizontal, and near-vertical rays leave v_z unconstrained —
    see models.frozen_flow.estimate_wind).

    **Vertical wind shear**: pass ``wind_kmps`` of shape (2, 3) — row 0
    the mid-grid wind, row 1 the linear-in-height horizontal wind
    difference reached at the grid's top/bottom (advect_periodic's shear
    form; E- and F-region plasma drift differently). The transition
    advects each z-slice by its own shift, and with
    ``wind_adapt_iters > 0`` the innovation GN refines all 4 unmasked
    parameters — online shear estimation.
    """
    m_clim = m0 if m_clim is None else m_clim
    d_seq = jnp.asarray(d_obs_seq)
    nt = d_seq.shape[0]
    # noise may be scalar, per-(antenna,direction), or fully per-timestep
    # (Nt, Na, Nd) — e.g. time-varying flag inflation
    cd_seq = (jnp.broadcast_to(jnp.asarray(noise_std), d_seq.shape)
              .reshape(nt, -1) ** 2)
    shift = jnp.asarray(wind_kmps, jnp.float32) * dt_s
    inner_model = interp_inner or interp
    mixed = rays_inner_seq is not None or inner_model != interp

    def update(m_pred, rays_t, rays_inner_t, d_t, cd_diag, k_stat):
        inv_cd = 1.0 / cd_diag
        def fwd(m):
            return tec_mod.dtec_paired_q(m, grid, rays_t, num_directions,
                                         i0, quadrature, interp).ravel()

        g0, jvp = jax.linearize(fwd, m_pred)
        r = d_t.ravel() - g0
        if innov_stats:
            # innovation-consistency statistic for adaptive R: probe
            # diag(H C_m Hᵀ) with stats_probes prior-filtered draws
            # through the full-fidelity JVP. The stationary filter
            # ASSUMES P_f = C_m (module docstring), so matching the
            # innovations to s + ρ²·cd under that same assumption
            # calibrates exactly the statistics its gain uses. Probe
            # draws are fresh per epoch (keyed), so their sampling
            # error averages out of the wrappers' EMA.
            zs = jax.random.normal(k_stat,
                                   (stats_probes,) + grid.shape)
            hph = jnp.mean(jax.vmap(
                lambda z: jvp(cov.apply_sqrt(z)) ** 2)(zs), axis=0)
            q = _innov_noise_scale_sq(r, hph, cd_diag)
        else:
            q = jnp.float32(0.0)
        if mixed:
            # mixed-fidelity (inexact Gauss-Newton; measured design,
            # BENCH_LOCAL.md config 5): the data misfit r is evaluated
            # with the full-fidelity forward — the coarse rule's
            # systematic quadrature bias never enters it — while the
            # Jacobian of the whole linear solve (rhs AND matvec) is the
            # coarser-sampled operator's. Using the coarse J on BOTH
            # sides is what keeps the step a contraction: a fine-J rhs
            # over a coarse-J system gives modes the coarse operator
            # cannot see an unregularised gradient step, which amplifies
            # over a long filter sequence (measured: NaN by step ~30 at
            # config-5 scale).
            def fwd_c(m):
                return tec_mod.dtec_paired_q(m, grid, rays_inner_t,
                                             num_directions, i0,
                                             quadrature,
                                             inner_model).ravel()
            _, jvp_c = jax.linearize(fwd_c, m_pred)
        else:
            jvp_c = jvp
        vjp_c = jax.linear_transpose(jvp_c, m_pred)

        # C^{1/2}-preconditioned model-space CG (see solvers.map_gauss_
        # newton): identity-plus-PSD system, truncated iterates are
        # regularised updates
        def matvec(u):
            v = cov.apply_sqrt(u.reshape(grid.shape))
            w = jvp_c(v) * inv_cd
            (z,) = vjp_c(w)
            return u + cov.apply_sqrt(z).ravel()

        rhs = cov.apply_sqrt(vjp_c(r * inv_cd)[0]).ravel()
        u, _ = linalg.cg(matvec, rhs, max_iters=cg_iters, tol=cg_tol)
        m_new = m_pred + cov.apply_sqrt(u.reshape(grid.shape))
        pre = jnp.linalg.norm(r / jnp.sqrt(cd_diag))
        post = jnp.linalg.norm((d_t.ravel() - fwd(m_new))
                               / jnp.sqrt(cd_diag))
        return m_new, pre, post, q

    if anchors is not None:
        from .anchors import anchor_map_step
        assert anchor_cov is not None, (
            "kalman_filter(anchors=...) needs anchor_cov (the background-"
            "error covariance, e.g. pipeline.anchor_background_cov())")
        a_vals_seq = (jnp.broadcast_to(anchors.values,
                                       (nt,) + anchors.values.shape[-1:])
                      if anchor_values_seq is None
                      else jnp.asarray(anchor_values_seq))
        a_inv_cd = 1.0 / jnp.broadcast_to(
            jnp.asarray(anchors.noise_std),
            anchors.values.shape[-1:]).ravel() ** 2

        def anchor_update(m_pred, a_vals):
            # pure regularised update about the prediction (m_pull=None);
            # the run's (quadrature, interp) thread through so anchor
            # rows are fit with the SAME operator discretization as the
            # dTEC rows (VERDICT r3 weak #3)
            return anchor_map_step(grid, m_pred, anchor_cov, anchors.rays,
                                   a_vals, a_inv_cd, anchor_cg_iters,
                                   cg_tol, quadrature=quadrature,
                                   interp=interp)
    else:
        a_vals_seq = jnp.zeros((nt, 1), jnp.float32)

    has_clim_seq = m_clim_seq is not None
    clim_xs = (jnp.asarray(m_clim_seq) if has_clim_seq
               else jnp.zeros((nt,), jnp.float32))   # scan-xs placeholder

    adapt = wind_adapt_iters > 0
    # mask broadcasts over the wind state's shape: (3,) rigid or (2,3)
    # rigid+shear (row 1's v_z is always pinned — see advect_periodic)
    wind_mask = jnp.broadcast_to(
        jnp.asarray([1.0, 1.0, 0.0 if wind_adapt_horizontal else 1.0],
                    jnp.float32),
        jnp.asarray(wind_kmps, jnp.float32).shape)

    def refine_wind(wind, m_t, rays_t, d_t, cd_t, clim):
        return _wind_innovation_refine(
            grid, m_t, rays_t, d_t, cd_t, clim, wind, dt_s, fade,
            num_directions, i0, quadrature, interp, wind_adapt_iters,
            wind_adapt_damping, wind_mask)

    def step(carry, inputs):
        (rays_pts, rays_ds, inner_pts, inner_ds, d_t, cd_t, a_t,
         is_first, clim_t, k_stat) = inputs
        m_t, wind = (carry if adapt else (carry, None))
        clim = clim_t if has_clim_seq else m_clim
        rays_t = RayBundle(points=rays_pts, ds=rays_ds)
        rays_inner_t = (RayBundle(points=inner_pts, ds=inner_ds)
                        if rays_inner_seq is not None
                        else (rays_t if mixed else None))
        if adapt:
            # no transition into a fresh sequence's first step → no wind
            # information in its innovation; keep the initial estimate
            wind_new = refine_wind(wind, m_t, rays_t, d_t, cd_t, clim)
            wind = jnp.where(is_first, wind, wind_new)
            shift_t = wind * dt_s
        else:
            shift_t = shift
        # predict: advect except at t=0 (state already at t=0)
        m_adv = advect_periodic(m_t, grid, shift_t)
        m_pred = jnp.where(is_first, m_t,
                           fade * m_adv + (1 - fade) * clim)
        if anchors is not None:
            m_pred = anchor_update(m_pred, a_t)
        m_new, pre, post, q = update(m_pred, rays_t, rays_inner_t, d_t,
                                     cd_t, k_stat)
        out = (m_new, pre, post,
               (wind if adapt else jnp.float32(0.0)), q)
        if adapt:
            return (m_new, wind), out
        return m_new, out

    is_first = jnp.zeros((nt,), bool).at[0].set(not advect_first)
    inner_xs = ((rays_inner_seq.points, rays_inner_seq.ds)
                if rays_inner_seq is not None
                else (jnp.zeros((nt,), jnp.float32),) * 2)
    if innov_stats:
        assert stats_key is not None, "innov_stats=True needs stats_key"
        stat_keys = jax.vmap(lambda t: jax.random.fold_in(stats_key, t))(
            jnp.arange(nt, dtype=jnp.int32))
    else:
        stat_keys = jnp.zeros((nt,), jnp.float32)   # scan-xs placeholder
    xs = (rays_seq.points, rays_seq.ds, *inner_xs, d_seq,
          cd_seq, a_vals_seq, is_first, clim_xs, stat_keys)
    carry0 = (m0, jnp.asarray(wind_kmps, jnp.float32)) if adapt else m0
    _, (m_seq, pre, post, wind_hist, q_seq) = jax.lax.scan(
        step, carry0, xs)
    return KalmanResult(m_seq=m_seq, residuals=pre, post_residuals=post,
                        wind_seq=(wind_hist if adapt else None),
                        innov_q=(q_seq if innov_stats else None))


class EnsembleKalmanResult(NamedTuple):
    mean_seq: jax.Array     # (Nt, *grid.shape) ensemble means
    std_seq: jax.Array      # (Nt, *grid.shape) ensemble spreads
    residuals: jax.Array    # (Nt,) pre-update whitened residuals (mean)
    ensemble: jax.Array     # (n_members, *grid.shape) final ensemble —
                            # the carry for chunked continuation (ens0)
    wind_seq: jax.Array = None   # (Nt, 3) or (Nt, 2, 3) when
                                 # wind_adapt_iters > 0
    innov_q: jax.Array = None    # (Nt,) per-epoch noise-scale-squared
                                 # MLEs when innov_stats=True — hph from
                                 # the forecast ensemble itself (no probes)


@partial(jax.jit, static_argnames=("num_directions", "i0", "cg_iters",
                                   "n_members", "advect_first",
                                   "spectrum_blend", "spectrum_bins",
                                   "anchor_cg_iters", "anchor_update",
                                   "quadrature", "interp", "wind_adapt_iters",
                                   "wind_adapt_horizontal", "member_axis",
                                   "innov_stats", "interp_inner"))
def ensemble_kalman_filter(grid: Grid3D, rays_seq: RayBundle, d_obs_seq,
                           noise_std, m0, cov: GPCovariance, wind_kmps,
                           dt_s, num_directions: int, key,
                           n_members: int = 8, i0: int = 0,
                           cg_iters: int = 20, cg_tol: float = 1e-4,
                           fade: float = 1.0, process_sigma: float = 0.0,
                           advect_first: bool = False, m_clim=None,
                           inflation: float = 1.0, ens0=None,
                           step_offset: int = 0,
                           spectrum_blend: float = 0.0,
                           spectrum_bins: int = 48,
                           anchors=None, anchor_values_seq=None,
                           anchor_cov: GPCovariance = None,
                           anchor_cg_iters: int = 8,
                           anchor_update: str = "sqrt",
                           quadrature: str = "hermite",
                           interp: str = "cubic", m_clim_seq=None,
                           rays_inner_seq: RayBundle = None,
                           wind_adapt_iters: int = 0,
                           wind_adapt_damping: float = 0.1,
                           wind_adapt_horizontal: bool = True,
                           member_axis: str = None,
                           innov_stats: bool = False,
                           interp_inner: str = None):
    """Ensemble variant: time-propagated posterior uncertainty.

    Goes beyond the reference's point-estimate filter: an ensemble of
    n_members states is advected by the frozen flow (plus optional process
    noise ~ process_sigma·C^{1/2}η per step) and each member is updated by
    a randomise-then-optimise solve against data perturbed with its own
    C_d^{1/2} draw — the vmapped batched-Krylov machinery of
    solvers.posterior_samples inside one lax.scan over time. The ensemble
    spread is a consistent (linearised-Gaussian) estimate of the filtered
    posterior std, including information accumulated across timesteps.

    Calibration controls (standard EnKF practice): ``inflation`` scales
    the predicted ensemble spread about its mean each step (>1 counters
    sampling-noise collapse of small ensembles); ``process_sigma`` adds
    C^{1/2}-correlated process noise per step (model error beyond pure
    frozen flow). Remaining behaviours to know: with truncated inner CG
    the member updates under-fit their perturbed residuals, which
    *inflates* the spread slightly (conservative uncertainty); and because
    dTEC data constrain only ~R directions of the voxel space, per-voxel
    spread stays near the prior σ even where the posterior mean is well
    determined — exercised in tests/test_kalman.py.

    Chunked continuation: pass the previous chunk's ``result.ensemble`` as
    ``ens0`` with ``advect_first=True``, ``m_clim`` = the original prior,
    and ``step_offset`` = the global index of this chunk's first timestep.
    Per-step randomness is derived by ``fold_in(key, global_step)``, so
    chunked and single-scan runs are bit-identical (tests/test_kalman.py).

    Adaptive spectral gain (``spectrum_blend`` ∈ [0, 1], experimental,
    default 0 = off): when > 0, each step's update covariance blends the
    static prior spectrum with the shell-fitted spectrum of the
    prediction-ensemble anomalies (priors.fit_shell_spectrum).
    **Measured neutral in every regime tried** (round 2: honest
    64³/2.4k-ray world, −0.5%; round 3: the hypothesised dense-coverage/
    long-assimilation regimes — 16³ with 192 rays × 16 steps and 10³
    with 200 rays × 24 steps at 0.5% noise, deep 60-iteration member CG:
    rmse and spread identical to 3 decimal places). The structural
    reason: dTEC's information contraction is confined to the ~R ray
    directions and excludes the common-mode null space, i.e. it is
    strongly *anisotropic and non-stationary* in k-space — exactly the
    structure a shell-isotropic stationary fit projects away, so the
    fitted spectrum barely departs from the prior. A gain that genuinely
    narrows would need the non-stationary ensemble covariance itself
    (classical localization), at rank-deficiency costs this engine's
    spectral design deliberately avoids. Retained for experimentation;
    chunked continuation stays bit-identical since the fit depends only
    on the carried ensemble.

    ``anchors``/``anchor_values_seq``/``anchor_cov``: per-epoch absolute-
    TEC anchoring of each member's *prediction* (see ``kalman_filter``).
    ``anchor_update="sqrt"`` (default) uses the deterministic square-root
    (ensemble-adjustment) form — mean updated with unperturbed values,
    anomalies contracted by (I−KH) — removing the perturbed-observation
    sampling noise that dominates at 8 members;
    ``anchor_update="stochastic"`` keeps the per-member perturbed-value
    RTO form (exact posterior covariance, but only in expectation).

    ``rays_inner_seq``: mixed-fidelity member updates — misfit and
    linearisation point at full fidelity, the solve's Jacobian (rhs and
    matvec) the coarser bundle's; see ``kalman_filter``.

    ``interp_inner``: mixed field-model member updates (see
    ``kalman_filter``).

    ``wind_adapt_iters``: online wind tracking (see ``kalman_filter``),
    refined on the noiseless ensemble *mean* each step — bulk drift is
    shared, not per-member. The refined wind rides the carry; pass
    ``wind_seq[-1]`` as the next chunk's ``wind_kmps``.

    ``innov_stats``: also return per-step noise-scale-squared MLEs
    (``innov_q``; see ``_innov_noise_scale_sq``). Unlike the point filter,
    no probes are needed: diag(H P_f Hᵀ) is the spread of the member
    forwards the updates already compute — the classic EnKF diagnostic
    at zero extra cost.

    ``member_axis``: internal — set by ``member_parallel_enkf`` when the
    function body runs inside a shard_map over that mesh axis, with
    ``ens0`` the per-device sub-ensemble (n_members stays the GLOBAL
    count). Cross-member reductions become pmean collectives; per-member
    random draws are generated at global shape on every device and
    sliced to the local rows, so the sharded filter consumes the exact
    same randomness as the unsharded one. Do not set directly.
    """
    m_clim = m0 if m_clim is None else m_clim
    d_seq = jnp.asarray(d_obs_seq)
    nt = d_seq.shape[0]
    cd_seq = (jnp.broadcast_to(jnp.asarray(noise_std), d_seq.shape)
              .reshape(nt, -1) ** 2)
    shift = jnp.asarray(wind_kmps, jnp.float32) * dt_s

    if anchors is not None:
        from .anchors import anchor_map_step
        assert anchor_cov is not None, (
            "ensemble_kalman_filter(anchors=...) needs anchor_cov")
        a_vals_seq = (jnp.broadcast_to(anchors.values,
                                       (nt,) + anchors.values.shape[-1:])
                      if anchor_values_seq is None
                      else jnp.asarray(anchor_values_seq))
        a_noise = jnp.broadcast_to(jnp.asarray(anchors.noise_std),
                                   anchors.values.shape[-1:]).ravel()
        a_inv_cd = 1.0 / a_noise ** 2
    else:
        a_vals_seq = jnp.zeros((nt, 1), jnp.float32)

    if member_axis is None:
        if ens0 is None:
            ens0 = initial_ensemble(grid, cov, m0, key, n_members)
        emean = lambda x: x.mean(0)              # noqa: E731
        estd = lambda x, mu: x.std(0)            # noqa: E731
        local_rows = lambda x: x                 # noqa: E731
    else:
        # inside shard_map over `member_axis`: ens0 is the REQUIRED local
        # sub-ensemble; spectrum_blend's shell fit is not axis-aware
        assert ens0 is not None and spectrum_blend == 0.0
        n_loc = ens0.shape[0]
        ix0 = jax.lax.axis_index(member_axis) * n_loc

        def emean(x):
            return jax.lax.pmean(x.mean(0), member_axis)

        def estd(x, mu):
            # global-biased std about the global mean (matches .std(0))
            return jnp.sqrt(jax.lax.pmean(
                ((x - mu[None]) ** 2).mean(0), member_axis))

        def local_rows(x):
            # slice this device's members out of a globally-shaped draw
            if jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
                kd = jax.lax.dynamic_slice_in_dim(
                    jax.random.key_data(x), ix0, n_loc, 0)
                return jax.random.wrap_key_data(
                    kd, impl=jax.random.key_impl(x))
            return jax.lax.dynamic_slice_in_dim(x, ix0, n_loc, 0)

    inner_model = interp_inner or interp
    mixed = rays_inner_seq is not None or inner_model != interp

    def member_update(m_pred, rays_t, rays_inner_t, d_t, cd_diag, eps,
                      cov_t):
        inv_cd = 1.0 / cd_diag

        def fwd(m):
            return tec_mod.dtec_paired_q(m, grid, rays_t, num_directions,
                                         i0, quadrature, interp).ravel()

        g0, jvp = jax.linearize(fwd, m_pred)
        if mixed:
            # mixed-fidelity inexact Gauss-Newton — see kalman_filter:
            # misfit full-fidelity, the solve's Jacobian (rhs AND
            # matvec) coarse
            def fwd_c(m):
                return tec_mod.dtec_paired_q(m, grid, rays_inner_t,
                                             num_directions, i0,
                                             quadrature,
                                             inner_model).ravel()
            _, jvp_c = jax.linearize(fwd_c, m_pred)
        else:
            jvp_c = jvp
        vjp_c = jax.linear_transpose(jvp_c, m_pred)
        r = d_t.ravel() + eps - g0

        def matvec(u):
            v = cov_t.apply_sqrt(u.reshape(grid.shape))
            w = jvp_c(v) * inv_cd
            (z,) = vjp_c(w)
            return u + cov_t.apply_sqrt(z).ravel()

        rhs = cov_t.apply_sqrt(vjp_c(r * inv_cd)[0]).ravel()
        u, _ = linalg.cg(matvec, rhs, max_iters=cg_iters, tol=cg_tol)
        pre = jnp.linalg.norm((d_t.ravel() - g0) / jnp.sqrt(cd_diag))
        # g0 also feeds the ensemble innovation-consistency statistic
        # (innov_stats): hph comes from the member forwards' spread
        return m_pred + cov_t.apply_sqrt(u.reshape(grid.shape)), pre, g0

    has_clim_seq = m_clim_seq is not None
    clim_xs = (jnp.asarray(m_clim_seq) if has_clim_seq
               else jnp.zeros((nt,), jnp.float32))   # scan-xs placeholder

    adapt = wind_adapt_iters > 0
    # mask broadcasts over the wind state's shape: (3,) rigid or (2,3)
    # rigid+shear (row 1's v_z is always pinned — see advect_periodic)
    wind_mask = jnp.broadcast_to(
        jnp.asarray([1.0, 1.0, 0.0 if wind_adapt_horizontal else 1.0],
                    jnp.float32),
        jnp.asarray(wind_kmps, jnp.float32).shape)

    def step(carry, inputs):
        (rays_pts, rays_ds, inner_pts, inner_ds, d_t, cd_t, a_t,
         is_first, t_global, clim_t) = inputs
        ens, wind = (carry if adapt else (carry, None))
        clim = clim_t if has_clim_seq else m_clim
        rays_t = RayBundle(points=rays_pts, ds=rays_ds)
        rays_inner_t = (RayBundle(points=inner_pts, ds=inner_ds)
                        if rays_inner_seq is not None
                        else (rays_t if mixed else None))
        k_t = jax.random.fold_in(key, t_global)
        k_adv, k_obs = jax.random.split(k_t)
        if adapt:
            # refine on the (noiseless) ensemble mean; members share the
            # refined wind — drift is a bulk property, not per-member
            wind_new = _wind_innovation_refine(
                grid, emean(ens), rays_t, d_t, cd_t, clim, wind, dt_s,
                fade, num_directions, i0, quadrature, interp,
                wind_adapt_iters, wind_adapt_damping, wind_mask)
            wind = jnp.where(is_first, wind, wind_new)
            shift_t = wind * dt_s
        else:
            shift_t = shift

        def predict(m, kq):
            m_adv = advect_periodic(m, grid, shift_t)
            pert = (process_sigma
                    * cov.apply_sqrt(jax.random.normal(kq, grid.shape)))
            return jnp.where(is_first, m,
                             fade * m_adv + (1 - fade) * clim + pert)

        ens_pred = jax.vmap(predict)(ens, local_rows(
            jax.random.split(k_adv, n_members)))
        # multiplicative covariance inflation about the ensemble mean —
        # a *forecast*-ensemble control, so it does not apply at the very
        # first step (the fresh prior draws have had no update-induced
        # spread collapse to counter; inflating them would overweight the
        # t=0 data against the configured prior sigma)
        infl_t = jnp.where(is_first, 1.0, inflation)
        ens_mean = emean(ens_pred)
        ens_pred = ens_mean[None] + infl_t * (ens_pred - ens_mean[None])
        if spectrum_blend > 0.0:
            # adaptive spectral gain: this step's update covariance is the
            # stationary-isotropic fit of the (inflated) prediction
            # anomalies, blended with the static prior spectrum
            s_fit = fit_shell_spectrum(ens_pred - ens_mean[None], grid,
                                       n_bins=spectrum_bins)
            spec_t = ((1.0 - spectrum_blend) * cov.spectrum
                      + spectrum_blend * s_fit)
            cov_t = dataclasses.replace(cov, spectrum=spec_t)
        else:
            cov_t = cov
        if anchors is not None:
            if anchor_update == "sqrt":
                # deterministic square-root form (VERDICT r2 weak #4):
                # mean updated with unperturbed values, anomalies
                # contracted by (I − KH) — no perturbed-anchor sampling
                # noise at tiny ensemble sizes (anchors.anchor_sqrt_update)
                from .anchors import anchor_sqrt_update
                ens_pred = anchor_sqrt_update(
                    grid, ens_pred, anchor_cov, anchors.rays, a_t,
                    a_inv_cd, anchor_cg_iters, cg_tol,
                    member_axis=member_axis, quadrature=quadrature,
                    interp=interp)
            else:
                # stochastic: anchor each member's prediction with its own
                # perturbed anchor values (keeps the ensemble a consistent
                # posterior sample; derived key leaves the existing
                # k_adv/k_obs stream — and thus unanchored runs — untouched)
                k_anc = jax.random.fold_in(k_t, 2)
                eps_a = local_rows(
                    jax.random.normal(k_anc, (n_members,) + a_t.shape)
                    * a_noise[None])
                ens_pred = jax.vmap(
                    lambda m, e: anchor_map_step(
                        grid, m, anchor_cov, anchors.rays, a_t + e,
                        a_inv_cd, anchor_cg_iters, cg_tol,
                        quadrature=quadrature,
                        interp=interp))(ens_pred, eps_a)
        eps = local_rows(jax.random.normal(k_obs, (n_members, d_t.size))
                         * jnp.sqrt(cd_t)[None, :])
        ens_new, pres, g0s = jax.vmap(
            lambda m, e: member_update(m, rays_t, rays_inner_t, d_t,
                                       cd_t, e, cov_t))(
                ens_pred, eps)
        mu_new = emean(ens_new)
        pre_mean = (pres.mean() if member_axis is None
                    else jax.lax.pmean(pres.mean(), member_axis))
        if innov_stats:
            # the ensemble's own innovation consistency: ν about the
            # forecast-mean forward, hph from the member forwards'
            # spread — the classic EnKF diagnostic, zero extra forwards
            mu_g = emean(g0s)
            hph = estd(g0s, mu_g) ** 2
            q = _innov_noise_scale_sq(d_t.ravel() - mu_g, hph, cd_t)
        else:
            q = jnp.float32(0.0)
        out = (mu_new, estd(ens_new, mu_new), pre_mean,
               (wind if adapt else jnp.float32(0.0)), q)
        if adapt:
            return (ens_new, wind), out
        return ens_new, out

    is_first = jnp.zeros((nt,), bool).at[0].set(not advect_first)
    t_global = step_offset + jnp.arange(nt, dtype=jnp.int32)
    inner_xs = ((rays_inner_seq.points, rays_inner_seq.ds)
                if rays_inner_seq is not None
                else (jnp.zeros((nt,), jnp.float32),) * 2)
    xs = (rays_seq.points, rays_seq.ds, *inner_xs, d_seq, cd_seq,
          a_vals_seq, is_first, t_global, clim_xs)
    carry0 = ((ens0, jnp.asarray(wind_kmps, jnp.float32)) if adapt
              else ens0)
    carry_f, (mean_seq, std_seq, pre, wind_hist, q_seq) = jax.lax.scan(
        step, carry0, xs)
    ens_f = carry_f[0] if adapt else carry_f
    return EnsembleKalmanResult(mean_seq=mean_seq, std_seq=std_seq,
                                residuals=pre, ensemble=ens_f,
                                wind_seq=(wind_hist if adapt else None),
                                innov_q=(q_seq if innov_stats else None))


def member_parallel_enkf(mesh, grid: Grid3D, rays_seq: RayBundle,
                         d_obs_seq, noise_std, m0, cov: GPCovariance,
                         wind_kmps, dt_s, *, ens0, n_members: int = 8,
                         **kwargs):
    """Member-parallel EnKF: shard_map over the mesh's 'members' axis
    (parallel.member_mesh) — P3 per-realization parallelism across chips.

    Each device owns n_members/n_devices members END TO END: advection,
    anchoring, and the whole Krylov member update — including the
    grid-sized FFT covariance applications that dominate EnKF cost and
    that ray-axis sharding cannot parallelize (they are per-member,
    not per-ray). Cross-chip traffic per step: the grid-sized pmean of
    the ensemble mean/std (+ one more for inflation centering) and the
    scalar reductions of the shared wind refinement — a few all-reduces
    riding ICI, vs the ~2·cg_iters per-member ones ray sharding pays.

    Randomness: every device draws the globally-shaped key/noise arrays
    and slices its local rows, so the sharded filter consumes exactly
    the same per-member draws as the unsharded one (parity tested to
    the f32 reduction bound in tests/test_multichip.py).

    Requirements: ``ens0`` is REQUIRED (build with ``initial_ensemble``
    and optionally device_put with parallel.member_sharding);
    ``n_members`` must divide by the mesh size (members are not padded —
    a phantom member would bias the ensemble mean); ``spectrum_blend``
    is unsupported (its shell fit is not member-axis aware). All other
    kwargs are ``ensemble_kalman_filter``'s.
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.sharding import MEMBER_AXIS

    if MEMBER_AXIS not in mesh.axis_names:
        raise ValueError(f"mesh has axes {mesh.axis_names}; build it with "
                         "parallel.member_mesh()")
    n_dev = mesh.shape[MEMBER_AXIS]
    if n_members % n_dev:
        raise ValueError(f"n_members={n_members} must divide the "
                         f"'{MEMBER_AXIS}' mesh size {n_dev} (members are "
                         "not padded)")
    if ens0 is None or ens0.shape[0] != n_members:
        raise ValueError("member_parallel_enkf requires ens0 with "
                         f"n_members={n_members} rows (use "
                         "initial_ensemble)")
    if kwargs.get("spectrum_blend", 0.0):
        raise ValueError("spectrum_blend is unsupported under member "
                         "sharding (shell fit is not member-axis aware)")
    adapt = kwargs.get("wind_adapt_iters", 0) > 0

    def run(ens0_loc):
        return ensemble_kalman_filter(
            grid, rays_seq, d_obs_seq, noise_std, m0, cov, wind_kmps,
            dt_s, ens0=ens0_loc, n_members=n_members,
            member_axis=MEMBER_AXIS, **kwargs)

    out_specs = EnsembleKalmanResult(
        mean_seq=P(), std_seq=P(), residuals=P(),
        ensemble=P(MEMBER_AXIS),
        wind_seq=(P() if adapt else None),
        innov_q=(P() if kwargs.get("innov_stats") else None))
    # check_vma=False: the member update's masked-convergence CG carries
    # per-member iteration counters whose init is member-invariant — the
    # static varying-axes validator rejects that (scan carry VMA
    # mismatch) even though the program is correct; the collectives
    # (pmean) are explicit and few.
    return jax.shard_map(run, mesh=mesh, in_specs=P(MEMBER_AXIS),
                         out_specs=out_specs, check_vma=False)(ens0)
