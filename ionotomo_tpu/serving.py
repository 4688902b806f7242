"""Streaming epoch service — the deployable serving surface.

A live calibration system produces observation epochs continuously; this
service watches a directory for DataPack files, pushes each epoch through
the online frozen-flow filter (inversion.online), and writes a Solution
(+ JSONL diagnostics) per epoch with a restartable state file — the
production wrapper the reference's notebook-driven workflow never had.

    svc = EpochService(watch_dir, out_dir, config)
    svc.run(poll_s=2.0)            # or svc.process_available() per tick

Contract:
- Epoch files are DataPack HDF5 (one or more timesteps each), processed
  in sorted filename order, exactly once (processed names persist in the
  state file). Files appearing later but sorting earlier are still
  processed (ingest order is arrival order within a poll, sorted).
  Unreadable (partially-written) files pause ingestion until the next
  poll so epochs are never assimilated out of time order.
- The frozen-flow advection step is the actual time since the last
  assimilated epoch (tracked across files and restarts); out-of-order
  epochs assimilate without advection.
- Geometry may vary per epoch (rays are rebuilt per timestep); the model
  grid and prior are fixed at service start from the **first** file's
  geometry plus the configured padding — size generously (grid.pad_km)
  if later epochs point elsewhere, since the tricubic edge clamp
  extrapolates outside the grid.
- Restart: a new EpochService over the same ``out_dir`` resumes from
  ``state.npz`` and produces bit-identical output to an uninterrupted
  service (OnlineKalman is deterministic; the EnKF is keyed by the
  global epoch index).
- **Ionosonde soundings** (streaming profile constraints): files named
  ``*.sounding.npz`` in the watch directory (the ``invert --ionosonde``
  npz schema — ``points_enu`` (P,3) ENU km, ``ne_m3`` (P,),
  ``noise_frac``) are assimilated as point log-density rows when they
  arrive (``OnlineKalman.assimilate_probes`` /
  ``anchors.probe_sqrt_update`` for the EnKF — deterministic, so restart
  identity is preserved). Real sounders report on a 5–15 min cadence
  alongside the 30 s dTEC epochs; this is the live channel for the
  profile shape that no TEC-derived data can constrain (the measured
  result behind data/ionosonde.py). By default the learned correction is
  also folded into the climatology pull target (``probe_update_clim``),
  so it persists under fade instead of decaying back to the uncorrected
  background between soundings. Soundings arriving before the first
  epoch are held until the filter exists (grid + state are fixed by the
  first epoch's geometry); invalid soundings (out-of-grid points, bad
  schema) are recorded in the JSONL and skipped permanently.

CLI: ``python -m ionotomo_tpu serve IN_DIR OUT_DIR [--solver enkf] …``.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from .config import EngineConfig
from .data.datapack import DataPack
from .geometry import rays as rays_mod
from .inversion.online import OnlineEnsembleKalman, OnlineKalman
from .inversion.priors import GPCovariance
from .inversion.solution import Solution
from .models import chapman
from .utils import checkpoint as ckpt_mod


class EpochService:
    """Watch ``watch_dir`` for DataPack epochs, filter, emit Solutions."""

    def __init__(self, watch_dir, out_dir, config: EngineConfig = None,
                 wind_kmps=(0.0, 0.0, 0.0), anchors=None, anchor_cov=None,
                 vtec_anchors_npz=None, key=None, probe_cov=None,
                 probe_update_clim: bool = True):
        """``vtec_anchors_npz``: path to an npz of external VTEC
        constraints (``points_xy`` (A,2) ENU km, ``values_tecu`` (A,),
        ``noise_tecu`` scalar — the invert CLI's format); the anchors are
        built at bootstrap, once the grid exists. Alternatively pass a
        ready ``TecAnchors`` via ``anchors`` (+ optional ``anchor_cov``;
        defaults to a long-horizontal background covariance).

        ``probe_cov``: background covariance for ionosonde sounding
        assimilation (None = the measured probe default, ~80 km vertical
        — anchors.assimilate_probes). ``probe_update_clim``: fold each
        sounding's correction into the climatology pull target so it
        persists under fade (module docstring)."""
        import jax

        self.watch_dir = str(watch_dir)
        self.out_dir = str(out_dir)
        os.makedirs(self.out_dir, exist_ok=True)
        self.config = config or EngineConfig()
        self.state_path = os.path.join(self.out_dir, "state.npz")
        self.metrics_path = os.path.join(self.out_dir, "epochs.jsonl")
        self.processed: list[str] = []
        self.filter = None
        self.last_mjd = None           # cadence tracking (advection dt)
        self._wind = np.asarray(wind_kmps, np.float64)
        if self.config.solver.wind_shear and self._wind.ndim == 1:
            # (2,3) rigid+vertical-shear advection state, zero shear
            # start — learned online when wind_adapt_iters > 0
            # (frozen_flow.advect_periodic; DESIGN.md §12)
            self._wind = np.stack([self._wind, np.zeros(3)])
        self._anchors = anchors
        self._anchor_cov = anchor_cov
        self._anchors_npz = vtec_anchors_npz
        self._probe_cov = probe_cov
        self._probe_update_clim = bool(probe_update_clim)
        self._clim_delta = None    # accumulated sounding corrections
        self._sounding_fail = {}   # name -> size at last schema failure
        self._key = key if key is not None else jax.random.key(0)
        if os.path.exists(self.state_path):
            self._load_state()

    # --- state ---------------------------------------------------------

    def _save_state(self):
        state = dict(self.filter.state_dict())
        state["processed"] = np.asarray(self.processed, dtype="U")
        state["grid_origin"] = np.asarray(self.grid.origin)
        state["grid_spacing"] = np.asarray(self.grid.spacing)
        state["grid_shape"] = np.asarray(self.grid.shape)
        state["last_mjd"] = np.float64(
            self.last_mjd if self.last_mjd is not None else np.nan)
        # anchors are part of the run's identity (like the config): a
        # restart with different/missing anchors must refuse, not
        # silently change the stream's absolute level
        if self._anchors is not None:
            state["anchor_points"] = np.asarray(self._anchors.rays.points)
            state["anchor_values"] = np.asarray(self._anchors.values)
            state["anchor_noise"] = np.asarray(self._anchors.noise_std)
        if self._clim_delta is not None:
            # assimilated-sounding corrections: the accumulated delta
            # (added to per-epoch time-varying climatologies) and the
            # shifted pull target itself, restored verbatim so restarts
            # reproduce the uninterrupted float sequence bit-exactly
            state["probe_clim_delta"] = np.asarray(self._clim_delta)
            state["probe_m_clim"] = np.asarray(self.filter.m_clim)
        # probe settings are part of the run's identity too: a restart
        # with a different probe covariance or probe_update_clim would
        # silently change the stream's response to future soundings
        # (ADVICE r3) — fingerprint and refuse on mismatch in _load_state
        state["probe_fingerprint"] = np.asarray(self._probe_fingerprint(),
                                                dtype="U")
        ckpt_mod.save_checkpoint(self.out_dir, self.filter.t, state,
                                 self.config.to_json(),
                                 name=os.path.basename(self.state_path))

    def _load_state(self):
        with np.load(self.state_path, allow_pickle=False) as z:
            state = {k: z[k] for k in z.files}
        self.processed = [str(s) for s in state.pop("processed")]
        from .core.grids import Grid3D
        self.grid = Grid3D.create(state.pop("grid_origin"),
                                  state.pop("grid_spacing"),
                                  tuple(int(s)
                                        for s in state.pop("grid_shape")))
        lm = float(state.pop("last_mjd", np.nan))
        self.last_mjd = None if np.isnan(lm) else lm
        cfg_json = bytes(state.pop("__config__", np.zeros(0, np.uint8))
                         ).rstrip(b"\x00").decode()
        if cfg_json and not self._config_compatible(cfg_json):
            raise ValueError(
                "state.npz in the output directory was produced under a "
                "different engine configuration — resuming would silently "
                "mix two runs; point the service at a fresh out_dir or "
                "restore the original configuration")
        saved_probe_fp = str(state.pop("probe_fingerprint", ""))
        if saved_probe_fp and saved_probe_fp != self._probe_fingerprint():
            raise ValueError(
                "state.npz was produced with different ionosonde-probe "
                "settings (probe_cov / probe_update_clim) than this "
                "service is configured with — resuming would silently "
                "change the stream's response to future soundings; use a "
                "fresh out_dir or restore the original probe settings")
        self._build_filter()
        if "probe_clim_delta" in state:
            self._clim_delta = jnp.asarray(state.pop("probe_clim_delta"))
            self.filter.m_clim = jnp.asarray(state.pop("probe_m_clim"))
        saved_anchor = {k: state.pop(k) for k in
                        ("anchor_points", "anchor_values", "anchor_noise")
                        if k in state}
        mine = self._anchors
        if bool(saved_anchor) != (mine is not None) or (
                saved_anchor and not (
                    np.allclose(saved_anchor["anchor_points"],
                                np.asarray(mine.rays.points))
                    and np.allclose(saved_anchor["anchor_values"],
                                    np.asarray(mine.values))
                    and np.allclose(saved_anchor["anchor_noise"],
                                    np.asarray(mine.noise_std)))):
            raise ValueError(
                "state.npz was produced with different absolute-TEC "
                "anchors than this service is configured with — resuming "
                "would silently change the stream's absolute level; use "
                "a fresh out_dir or restore the original anchors")
        self.filter.load_state(state)
        # drop diagnostics for epochs that will be re-emitted (a crash
        # mid-file re-processes that file; Solutions overwrite
        # deterministically, the JSONL must not duplicate)
        if os.path.exists(self.metrics_path):
            kept = []
            with open(self.metrics_path) as f:
                for line in f:
                    try:
                        rec = json.loads(line)
                    except ValueError:
                        continue
                    # event records (sounding / bad_sounding / unreadable)
                    # carry no "epoch" key — they are the audit trail for
                    # skipped files and must survive restarts (ADVICE r3:
                    # the old epoch-only keep silently deleted them)
                    if "epoch" not in rec or rec["epoch"] < self.filter.t:
                        kept.append(line)
            with open(self.metrics_path, "w") as f:
                f.writelines(kept)

    def _probe_fingerprint(self) -> str:
        """Canonical JSON of the sounding-assimilation settings — the
        restart-identity record for ``probe_cov``/``probe_update_clim``.
        A custom covariance is fingerprinted by its defining parameters
        (GPCovariance carries them); an object without them is recorded
        by type name only — such covariances are compared by identity of
        configuration, not numerics (document custom operators in the
        run's own config management)."""
        cov = self._probe_cov
        if cov is None:
            cov_fp = None
        else:
            try:
                ls = cov.length_scale
                ls = (list(np.asarray(ls, np.float64).ravel())
                      if np.ndim(ls) else float(ls))
                cov_fp = dict(sigma=float(cov.sigma), length_scale=ls,
                              kind=str(cov.kind))
            except AttributeError:
                cov_fp = dict(type=type(cov).__name__)
        return json.dumps(dict(update_clim=self._probe_update_clim,
                               cov=cov_fp), sort_keys=True)

    def _config_compatible(self, cfg_json: str) -> bool:
        """Same contract as InversionPipeline._config_compatible: every
        non-runtime field must match (defaults fill fields added since)."""
        try:
            theirs = json.loads(EngineConfig.from_json(cfg_json).to_json())
            mine = json.loads(self.config.to_json())
        except (ValueError, KeyError, TypeError):
            return False
        theirs.pop("runtime", None)
        mine.pop("runtime", None)
        return theirs == mine

    # --- setup ---------------------------------------------------------

    def _bootstrap(self, dp: DataPack):
        """Fix grid/prior/filter from the first epoch's geometry."""
        c = self.config
        self.grid = chapman.grid_enclosing_rays(
            dp.antennas_enu(), dp.directions_enu().reshape(-1, 3),
            max_length_km=c.physics.max_length_km, shape=c.grid.shape,
            pad_km=c.grid.pad_km, h_min_km=c.grid.h_min_km)
        self._build_filter()

    def _build_filter(self):
        from .inversion import anchors as anchors_mod

        c = self.config
        if self._anchors_npz and self._anchors is None:
            self._anchors = anchors_mod.anchors_from_npz(
                self.grid, self._anchors_npz)
        if self._anchors is not None and self._anchor_cov is None:
            self._anchor_cov = anchors_mod.background_covariance(self.grid)
        ne0 = chapman.chapman_field(self.grid,
                                    n_peak=c.physics.chapman_n_peak,
                                    h_peak_km=c.physics.chapman_h_peak_km,
                                    scale_km=c.physics.chapman_scale_km,
                                    curved=c.physics.curved_earth)
        m_prior = chapman.log_parametrize(ne0)
        cov = GPCovariance.create(self.grid, sigma=c.prior.sigma,
                                  length_scale=c.prior.length_scale_km,
                                  kind=c.prior.kind)
        kw = dict(cg_iters=c.solver.cg_iters, cg_tol=c.solver.cg_tol,
                  fade=c.solver.kalman_fade, anchors=self._anchors,
                  anchor_cov=self._anchor_cov,
                  quadrature=c.rays.quadrature,
                  interp=c.rays.interp,
                  interp_inner=c.rays.interp_inner or None,
                  inner_samples=c.rays.inner_samples,
                  adapt_r=c.solver.adapt_r)
        if c.solver.solver == "enkf":
            self.filter = OnlineEnsembleKalman(
                self.grid, cov, m_prior, self._wind, dt_s=30.0,
                num_directions=1, key=self._key,
                n_members=c.solver.enkf_members,
                process_sigma=c.solver.enkf_process_sigma,
                inflation=c.solver.enkf_inflation,
                spectrum_blend=c.solver.enkf_spectrum_blend,
                anchor_update=c.solver.enkf_anchor_update,
                wind_adapt_iters=c.solver.wind_adapt_iters, **kw)
        else:
            self.filter = OnlineKalman(
                self.grid, cov, m_prior, self._wind, dt_s=30.0,
                num_directions=1,
                wind_adapt_iters=c.solver.wind_adapt_iters, **kw)

    def _epoch_clim(self, dp: DataPack, t: int):
        """Climatological log-density field at epoch t's solar zenith —
        the per-epoch fade-pull target for ``physics.time_varying_clim``
        (scalar cos χ over the flat serving grid; the pipeline's
        per-column terminator applies to wide curved-Earth grids)."""
        from .geometry import frames
        c = self.config.physics
        cc = float(frames.solar_cos_zenith(float(dp.times[t]),
                                           dp.array.enu_frame))
        ne = chapman.chapman_field(self.grid, n_peak=c.chapman_n_peak,
                                   h_peak_km=c.chapman_h_peak_km,
                                   scale_km=c.chapman_scale_km,
                                   cos_chi=cc, curved=c.curved_earth)
        return chapman.log_parametrize(ne)

    def _beam_inflation(self, dp: DataPack, dev, t: int):
        """Per-epoch strong-turbulence noise inflation (rays.beam_noise
        > 0): the chaotic dTEC spread of a stochastic Fresnel beam traced
        through the filter's current field estimate
        (geometry.fermat.beam_noise_for_epoch). The key derives from the
        persisted global epoch index, and the field estimate is restored
        exactly on restart, so resumed streams inflate bit-identically.
        Returns an (Na, Nd) array in working units; logs the spread."""
        import jax

        from .geometry import fermat

        rc, p = self.config.rays, self.config.physics
        f = self.filter
        if hasattr(f, "m"):
            m_field = f.m                       # point filter state
        elif f.ens is not None:
            m_field = f.ens.mean(0)             # EnKF mean
        else:
            m_field = f.m_clim                  # first epoch: bootstrap
        key = jax.random.fold_in(jax.random.key(0xBEA11), f.t)
        infl = fermat.beam_noise_for_epoch(
            m_field, self.grid, dev["antennas_enu"],
            dev["directions_enu"][t], dp.frequency_hz, key,
            n_paths=rc.beam_noise, i0=f.i0,
            jitter_rad=(rc.beam_jitter_rad or None),
            max_length_km=p.max_length_km, n_steps=rc.n_steps,
            method=rc.method, interp=rc.interp)
        # keyed "epoch" (not "t") so the restart prune drops records of
        # epochs that will be re-emitted, like the per-epoch diagnostics
        with open(self.metrics_path, "a") as fh:
            fh.write(json.dumps(dict(
                event="beam_noise", epoch=f.t, n_paths=rc.beam_noise,
                mean=round(float(jnp.mean(infl)), 4),
                max=round(float(jnp.max(infl)), 4))) + "\n")
        return infl

    # --- ingest --------------------------------------------------------

    def _pending(self):
        names = sorted(f for f in os.listdir(self.watch_dir)
                       if f.endswith((".h5", ".hdf5", ".sounding.npz"))
                       and f not in self.processed)
        return names

    def _ingest_sounding(self, name: str, path: str):
        """Assimilate one ``*.sounding.npz`` ionosonde file (module
        docstring). Held (left pending) until the filter state exists;
        permanently invalid files are recorded and marked processed.

        Producers should write-then-rename atomically; as a safety net a
        file failing schema validation is retried until its size is
        stable across two polls before being marked permanently bad — a
        truncated npz member from a non-atomic writer raises the same
        ValueError a genuinely malformed file does (ADVICE r3).

        Returns True when an ingest was attempted (the filter existed),
        False when the file was held — process_available uses this to
        revisit held soundings once the first epoch lands without
        re-attempting same-poll failures."""
        import zipfile

        from .data.ionosonde import probes_from_arrays

        if self.filter is None or self.filter.t == 0:
            return False                 # retry once an epoch has landed

        def _unreadable(e):
            with open(self.metrics_path, "a") as f:
                f.write(json.dumps(dict(event="unreadable", file=name,
                                        error=str(e)[:200])) + "\n")

        def _bad(e):
            self._sounding_fail.pop(name, None)
            with open(self.metrics_path, "a") as f:
                f.write(json.dumps(dict(event="bad_sounding", file=name,
                                        error=str(e)[:200])) + "\n")
            self.processed.append(name)
            self._save_state()

        # stage 1 — read the raw arrays. Errors here are I/O-shaped: a
        # non-atomic writer's truncated file raises OSError/BadZipFile
        # (no zip directory yet) or ValueError/KeyError (directory
        # present, member truncated/missing) — retry until the file size
        # is stable across two polls before declaring the schema bad.
        try:
            with np.load(path, allow_pickle=False) as z:
                raw = dict(points_enu=np.array(z["points_enu"]),
                           ne_m3=np.array(z["ne_m3"]),
                           noise_frac=np.array(z["noise_frac"]))
        except (OSError, zipfile.BadZipFile) as e:
            # partially-written: retry next poll. Soundings do not gate
            # the epoch files' time order, so no need to stop ingestion.
            _unreadable(e)
            return True
        except (ValueError, KeyError) as e:
            try:
                size = os.path.getsize(path)
            except OSError:
                return True              # vanished mid-read: retry
            if self._sounding_fail.get(name) != size:
                self._sounding_fail[name] = size
                _unreadable(e)
                return True              # retry once the size is stable
            _bad(e)
            return True
        # stage 2 — semantic validation (out-of-grid points, bad shapes):
        # the file read cleanly, so this is permanently invalid
        try:
            probes = probes_from_arrays(self.grid, raw["points_enu"],
                                        raw["ne_m3"], raw["noise_frac"])
        except (ValueError, KeyError) as e:
            _bad(e)
            return True
        self._sounding_fail.pop(name, None)
        t0 = time.perf_counter()
        delta = self.filter.assimilate_probes(probes, cov=self._probe_cov)
        if self._probe_update_clim:
            self.filter.m_clim = self.filter.m_clim + delta
            self._clim_delta = (delta if self._clim_delta is None
                                else self._clim_delta + delta)
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(dict(
                event="sounding", file=name,
                n_probes=int(probes.values.shape[0]),
                seconds=round(time.perf_counter() - t0, 3),
                mean_abs_dlogne=round(float(jnp.mean(jnp.abs(delta))), 6),
            )) + "\n")
        self.processed.append(name)
        self._save_state()
        return True

    def process_available(self) -> int:
        """Ingest every unprocessed epoch file currently present; returns
        the number of epochs (timesteps) assimilated."""
        n_epochs = 0
        tried_soundings = set()
        for name in self._pending():
            path = os.path.join(self.watch_dir, name)
            if name.endswith(".sounding.npz"):
                if self._ingest_sounding(name, path):
                    tried_soundings.add(name)
                continue
            try:
                dp = DataPack.load(path)
            except (OSError, KeyError) as e:
                # partially-written / unreadable file: leave unprocessed
                # (the producer may still be writing it), note it, retry
                # on the next poll. Stop here rather than skipping ahead —
                # later files must not be assimilated out of time order.
                with open(self.metrics_path, "a") as f:
                    f.write(json.dumps(dict(event="unreadable", file=name,
                                            error=str(e)[:200])) + "\n")
                break
            if self.filter is None:
                self._bootstrap(dp)
            na, nt, nd = dp.shape
            dev = dp.to_device_arrays()
            noise = np.where(dev["flags"], 1e6, dev["noise_std"])
            self.filter.nd = nd
            for t in range(nt):
                # time-varying climatology: the fade-pull target follows
                # the epoch's solar zenith (day/night terminator) instead
                # of the bootstrap background. Depends only on the epoch
                # file + config, so restarts stay bit-identical.
                m_clim_t = (self._epoch_clim(dp, t)
                            if self.config.physics.time_varying_clim
                            else None)
                if m_clim_t is not None and self._clim_delta is not None:
                    # carry the sounding-learned profile correction on
                    # top of the terminator-tracking background (the
                    # static-clim path is shifted in _ingest_sounding)
                    m_clim_t = m_clim_t + self._clim_delta
                # advection step = actual time since the last assimilated
                # epoch (across files too; persisted for restarts)
                if self.last_mjd is not None:
                    dt = (float(dp.times[t]) - self.last_mjd) * 86400.0
                    # out-of-order epoch (a later-arriving file that sorts
                    # earlier): dt_s = 0 makes the frozen-flow advection
                    # the identity — "assimilate without advection" per
                    # the module contract. Setting it unconditionally
                    # (not only when dt > 0) also keeps dt_s equal to the
                    # real elapsed time rather than a stale previous
                    # cadence (ADVICE r2); dt_s persists in the state
                    # file so restarts reproduce the edge case exactly.
                    self.filter.dt_s = max(dt, 0.0)
                self.last_mjd = float(dp.times[t])
                origins, dvecs = rays_mod.make_ray_batch(
                    dev["antennas_enu"], dev["directions_enu"][t])
                rb = rays_mod.sample_straight_rays(
                    origins, dvecs,
                    max_length_km=self.config.physics.max_length_km,
                    n_samples=self.config.rays.n_samples)
                noise_t = jnp.asarray(noise[:, t, :])
                if self.config.rays.beam_noise > 0:
                    # strong-turbulence error bar: inflate C_d with the
                    # chaotic beam spread traced through the current
                    # state (keyed by the persisted epoch index —
                    # restarts inflate bit-identically)
                    infl = self._beam_inflation(dp, dev, t)
                    noise_t = jnp.sqrt(noise_t * noise_t + infl * infl)
                t0 = time.perf_counter()
                out = self.filter.step(rb,
                                       jnp.asarray(dev["dtec"][:, t, :]),
                                       noise_t,
                                       m_clim=m_clim_t)
                secs = time.perf_counter() - t0
                epoch = self.filter.t - 1
                if len(out) == 3:          # ensemble: (mean, std, diag)
                    m_t, std_t, diag = out
                    sol = Solution(self.grid, np.asarray(m_t)[None],
                                   diagnostics=dict(
                                       std=np.asarray(std_t)[None]),
                                   config_json=self.config.to_json())
                else:
                    m_t, diag = out
                    sol = Solution(self.grid, np.asarray(m_t)[None],
                                   config_json=self.config.to_json())
                sol.save(os.path.join(self.out_dir,
                                      f"epoch_{epoch:06d}.h5"))
                with open(self.metrics_path, "a") as f:
                    f.write(json.dumps(dict(epoch=epoch, file=name,
                                            seconds=round(secs, 3),
                                            **diag)) + "\n")
                every = self.config.solver.diag_spectrum_every
                if every > 0 and epoch % every == 0:
                    # deployment-facing update-operator conditioning
                    # diagnostic (VERDICT r4 #5): randomized top-rank
                    # spectrum of I + C^½JᵀC_d⁻¹JC^½ at the freshly
                    # assimilated state, keyed by "epoch" so the
                    # restart prune treats it like any epoch record
                    from .inversion.kalman import update_operator_eigs
                    rank = min(self.config.solver.diag_spectrum_rank,
                               self.grid.num_voxels)
                    _, lam = update_operator_eigs(
                        self.grid, rb, noise_t,
                        jnp.asarray(m_t), self.filter.cov,
                        dev["dtec"].shape[-1], jax.random.key(epoch),
                        rank=rank, i0=self.filter.i0,
                        quadrature=self.config.rays.quadrature,
                        interp=self.config.rays.interp)
                    lam = [float(v) for v in np.asarray(lam)]
                    with open(self.metrics_path, "a") as f:
                        f.write(json.dumps(dict(
                            event="update_spectrum", epoch=epoch,
                            rank=rank, lam=lam,
                            kappa_bound=lam[0])) + "\n")
                n_epochs += 1
            self.processed.append(name)
            self._save_state()
        # soundings held while the filter didn't exist sort BEFORE the
        # first epoch file and were skipped above; revisit them now that
        # epochs have landed, so run(max_epochs=N) can never exit with an
        # assimilable sounding left permanently pending (ADVICE r3)
        if self.filter is not None and self.filter.t > 0:
            for name in self._pending():
                if (name.endswith(".sounding.npz")
                        and name not in tried_soundings):
                    self._ingest_sounding(
                        name, os.path.join(self.watch_dir, name))
        return n_epochs

    def run(self, poll_s: float = 2.0, max_epochs: int = None):
        """Poll until at least ``max_epochs`` have been assimilated
        (forever when None). The bound is checked between polls at file
        granularity — a file's epochs are never split across restarts —
        so a poll that ingests a multi-epoch file may finish past the
        bound; the return value is the exact count."""
        done = 0
        while max_epochs is None or done < max_epochs:
            n = self.process_available()
            done += n
            if n == 0:
                time.sleep(poll_s)
        return done
