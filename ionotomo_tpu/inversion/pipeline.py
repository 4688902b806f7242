"""End-to-end inversion pipeline (reference: inversion_pipeline.py, L7;
SURVEY.md §3.1).

Host shell around the device core: load/accept a DataPack → build the
initial model (grid sized to enclose all rays, Chapman prior) → per
timestep: rays (straight or bent) → solve (MAP GN / LSQR / steepest /
Kalman over the whole sequence) → Solution + atomic checkpoints + JSONL
metrics. The per-timestep solve is one jitted program; the host only
orchestrates setup, checkpointing and logging (SURVEY.md §7 "Host/device
boundary").

Where the reference fanned out over dask workers (⊗ in SURVEY §3.1), this
pipeline shards the ray axis over the attached device mesh automatically
when more than one device is present.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig
from ..data.datapack import DataPack
from ..geometry import fermat, rays as rays_mod
from ..models import chapman
from ..parallel import sharding as shard_mod
from ..utils import checkpoint as ckpt_mod
from ..utils.metrics import MetricsWriter
from .kalman import kalman_filter
from .priors import GPCovariance
from .solution import Solution
from . import solvers


class InversionPipeline:
    """Drives a full reconstruction from a DataPack."""

    def __init__(self, datapack: DataPack, config: EngineConfig = None):
        self.datapack = datapack
        self.config = config or EngineConfig()
        self.metrics = MetricsWriter(self.config.runtime.metrics_path)
        dev = self.datapack.to_device_arrays()
        self.antennas = dev["antennas_enu"]
        self.directions = dev["directions_enu"]      # (Nt, Nd, 3)
        self.d_obs = dev["dtec"]                      # (Na, Nt, Nd)
        # flagged samples are soft-masked by noise inflation (their weight
        # in every C_d^-1-weighted misfit becomes ~0, shapes stay static)
        self.noise_std = np.where(dev["flags"], 1e6, dev["noise_std"])
        self.i0 = dev["ref_antenna"]
        self.grid = chapman.grid_enclosing_rays(
            self.antennas, self.directions.reshape(-1, 3),
            max_length_km=self.config.physics.max_length_km,
            shape=self.config.grid.shape,
            pad_km=self.config.grid.pad_km,
            h_min_km=self.config.grid.h_min_km)
        p = self.config.physics
        from ..geometry.frames import solar_cos_zenith
        cos_chi = float(solar_cos_zenith(self.datapack.times.mean(),
                                         self.datapack.array.enu_frame))
        ne0 = chapman.chapman_field(self.grid, n_peak=p.chapman_n_peak,
                                    h_peak_km=p.chapman_h_peak_km,
                                    scale_km=p.chapman_scale_km,
                                    cos_chi=cos_chi)
        self.m_prior = chapman.log_parametrize(ne0)
        pr = self.config.prior
        self.cov = GPCovariance.create(self.grid, sigma=pr.sigma,
                                       length_scale=pr.length_scale_km,
                                       kind=pr.kind)
        self.mesh = (shard_mod.ray_mesh()
                     if len(jax.devices()) > 1 else None)

    # --- ray building -------------------------------------------------------

    def rays_for_time(self, t: int, m_field=None):
        """RayBundle for timestep t; bent rays trace through ``m_field``
        (defaults to the prior model) when config.rays.bent."""
        origins, dvecs = rays_mod.make_ray_batch(self.antennas,
                                                 self.directions[t])
        rc, p = self.config.rays, self.config.physics
        if rc.bent:
            field = self.m_prior if m_field is None else m_field
            bundle, _ = fermat.trace_rays(
                field, self.grid, origins, dvecs,
                self.datapack.frequency_hz, p.max_length_km,
                n_steps=rc.n_steps, keep_path=True, method=rc.method)
            return bundle
        return rays_mod.sample_straight_rays(
            origins, dvecs, max_length_km=p.max_length_km,
            n_samples=rc.n_samples)

    def _shard(self, bundle: rays_mod.RayBundle):
        """Place the ray axis across the mesh when it divides evenly.

        The solvers rely on the exact row-major (antenna × direction) ray
        layout, so padding is not an option here; when Na·Nd doesn't divide
        the device count the bundle stays unsharded (XLA still partitions
        internal ops where profitable)."""
        if self.mesh is None or bundle.num_rays % self.mesh.devices.size:
            return bundle
        sh = shard_mod.ray_sharding(self.mesh)
        return rays_mod.RayBundle(points=jax.device_put(bundle.points, sh),
                                  ds=jax.device_put(bundle.ds, sh))

    # --- solving -------------------------------------------------------------

    def solve_snapshot(self, t: int, m0=None):
        """Invert one timestep; returns (m, diagnostics dict)."""
        sc = self.config.solver
        nd = self.directions.shape[1]
        rb = self._shard(self.rays_for_time(t))
        d_t = jnp.asarray(self.d_obs[:, t, :])
        noise = jnp.asarray(self.noise_std[:, t, :])
        m_start = self.m_prior if m0 is None else m0
        t0 = time.perf_counter()
        if sc.solver == "lsqr_smoothness":
            res = solvers.lsqr_smoothness(
                self.grid, rb, d_t, noise, m_start, num_directions=nd,
                i0=self.i0, damp=self.config.prior.damp,
                smooth=self.config.prior.smooth, max_iters=sc.lsqr_iters)
        elif sc.solver == "steepest":
            res = solvers.steepest_descent_map(
                self.grid, rb, d_t, noise, m_start, self.cov,
                num_directions=nd, i0=self.i0, n_iters=sc.gn_iters * 8)
        else:
            res = solvers.map_gauss_newton(
                self.grid, rb, d_t, noise, m_start, self.cov,
                num_directions=nd, i0=self.i0, gn_iters=sc.gn_iters,
                cg_iters=sc.cg_iters, cg_tol=sc.cg_tol)
        jax.block_until_ready(res.m)
        dt = time.perf_counter() - t0
        diag = dict(timestep=t, seconds=dt,
                    residual=float(res.residual_norm),
                    solver=sc.solver,
                    rays=int(rb.num_rays),
                    rays_per_sec=rb.num_rays / dt,
                    iters_per_sec=(sc.gn_iters / dt
                                   if sc.solver == "map_gauss_newton"
                                   else None))
        return res.m, diag

    def run(self, resume: bool = True) -> Solution:
        """Full run: all timesteps, checkpointed, metrics-logged."""
        rt = self.config.runtime
        nt = self.d_obs.shape[1]
        start_t, state = 0, None
        if resume:
            step, state, _ = ckpt_mod.resume(rt.checkpoint_dir)
            start_t = step
        m_list = list(state["m_seq"][:start_t]) if state is not None else []

        if self.config.solver.solver == "kalman":
            return self._run_kalman()

        # warm start from the last checkpointed state, exactly as the
        # uninterrupted run would have chained timesteps
        m_prev = (jnp.asarray(m_list[-1]) if m_list else None)
        for t in range(start_t, nt):
            m_t, diag = self.solve_snapshot(t, m0=m_prev)
            m_list.append(np.asarray(m_t))
            m_prev = m_t
            self.metrics.write(diag)
            if (t + 1) % rt.checkpoint_every == 0 or t == nt - 1:
                ckpt_mod.save_checkpoint(
                    rt.checkpoint_dir, t + 1,
                    {"m_seq": np.stack(m_list)}, self.config.to_json())
        return Solution(self.grid, np.stack(m_list),
                        config_json=self.config.to_json())

    def _run_kalman(self) -> Solution:
        nd = self.directions.shape[1]
        nt = self.d_obs.shape[1]
        bundles = [self.rays_for_time(t) for t in range(nt)]
        rays_seq = rays_mod.RayBundle(
            points=jnp.stack([b.points for b in bundles]),
            ds=jnp.stack([b.ds for b in bundles]))
        d_seq = jnp.moveaxis(jnp.asarray(self.d_obs), 1, 0)  # (Nt, Na, Nd)
        # per-timestep noise (time-varying flags inflate per step)
        noise = jnp.moveaxis(jnp.asarray(self.noise_std), 1, 0)
        dt_s = (float(np.diff(self.datapack.times).mean() * 86400.0)
                if nt > 1 else 0.0)
        # bulk wind: taken from datapack metadata when present (synthetic
        # worlds), otherwise estimated from quick single-snapshot solves of
        # the first two timesteps via the differentiable frozen-flow match
        wind = getattr(self.datapack, "wind_kmps", None)
        if wind is None:
            if nt >= 2 and dt_s > 0:
                m0_est, _ = self.solve_snapshot(0)
                m1_est, _ = self.solve_snapshot(1)
                from ..models.frozen_flow import estimate_wind
                v, _ = estimate_wind(m0_est - self.m_prior,
                                     m1_est - self.m_prior,
                                     self.grid, dt_s, n_iters=200)
                wind = np.asarray(v)
                self.metrics.write(dict(event="wind_estimated",
                                        wind_kmps=list(map(float, wind))))
            else:
                wind = (0.0, 0.0, 0.0)
        t0 = time.perf_counter()
        res = kalman_filter(self.grid, rays_seq, d_seq, noise,
                            self.m_prior, self.cov, wind, dt_s,
                            num_directions=nd, i0=self.i0,
                            cg_iters=self.config.solver.cg_iters,
                            fade=self.config.solver.kalman_fade)
        jax.block_until_ready(res.m_seq)
        dt = time.perf_counter() - t0
        self.metrics.write(dict(solver="kalman", seconds=dt, timesteps=nt,
                                steps_per_sec=nt / dt))
        return Solution(self.grid, np.asarray(res.m_seq),
                        diagnostics=dict(
                            pre_residuals=np.asarray(res.residuals),
                            post_residuals=np.asarray(res.post_residuals)),
                        config_json=self.config.to_json())
