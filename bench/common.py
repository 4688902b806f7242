"""Shared helpers for the five judged-config bench harnesses
(BASELINE.json .configs). Each configN.py prints one JSON line."""
from __future__ import annotations

import json
import time

import numpy as np


def make_rays(n_ants, n_dirs, seed=0, spread_km=150.0, zen_max=0.6):
    """Antenna ENU positions + near-zenith unit directions (flat product)."""
    rng = np.random.default_rng(seed)
    ants = np.concatenate([rng.uniform(-spread_km, spread_km, (n_ants, 2)),
                           np.zeros((n_ants, 1))], -1).astype(np.float32)
    zen = rng.uniform(0.05, zen_max, n_dirs)
    az = rng.uniform(0, 2 * np.pi, n_dirs)
    dirs = np.stack([np.sin(zen) * np.sin(az), np.sin(zen) * np.cos(az),
                     np.cos(zen)], -1).astype(np.float32)
    return ants, dirs


def timed(fn, *args, reps=3):
    """Compile + steady-state timing; returns (result, seconds/rep)."""
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return out, (time.perf_counter() - t0) / reps


def emit(config: str, metric: str, value: float, unit: str, **extra):
    rec = dict(config=config, metric=metric, value=round(float(value), 4),
               unit=unit)
    rec.update(extra)
    print(json.dumps(rec))
    return rec
