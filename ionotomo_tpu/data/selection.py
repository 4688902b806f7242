"""Antenna & facet (direction) selection (reference:
astro/antenna_facet_selection.py, SURVEY.md §2).

Host-side helpers that pick informative subsets of a DataPack: core vs
remote stations, greedy max-spread facets, flag-aware pruning.
"""
from __future__ import annotations

import numpy as np

from .datapack import DataPack


def core_antenna_indices(datapack: DataPack, radius_km=5.0):
    """Antennas within ``radius_km`` of the array centre (ENU)."""
    r = np.linalg.norm(datapack.array.enu[:, :2], axis=1)
    return np.nonzero(r <= radius_km)[0]


def remote_antenna_indices(datapack: DataPack, radius_km=5.0):
    r = np.linalg.norm(datapack.array.enu[:, :2], axis=1)
    return np.nonzero(r > radius_km)[0]


def select_antennas_by_distance(datapack: DataPack, n: int,
                                include_ref=True):
    """n antennas spread over baseline lengths (log-spaced), always keeping
    the reference antenna when ``include_ref``."""
    r = np.linalg.norm(datapack.array.enu[:, :2], axis=1)
    order = np.argsort(r)
    picks = order[np.unique(np.linspace(0, len(order) - 1, n).astype(int))]
    if include_ref and datapack.ref_antenna not in picks:
        picks = np.concatenate([[datapack.ref_antenna], picks[:-1]])
    return datapack.select(antennas=np.sort(picks))


def select_facets_max_spread(datapack: DataPack, n: int):
    """Greedy farthest-point selection of n directions on the sky — the
    facet-spread heuristic: start from the direction closest to the field
    centre, then repeatedly add the direction farthest from the chosen set."""
    radec = datapack.directions
    # gnomonic-ish local coords for small fields
    ra0, dec0 = radec[:, 0].mean(), radec[:, 1].mean()
    x = (radec[:, 0] - ra0) * np.cos(dec0)
    y = radec[:, 1] - dec0
    pts = np.stack([x, y], -1)
    first = int(np.argmin(np.linalg.norm(pts, axis=1)))
    chosen = [first]
    while len(chosen) < min(n, len(pts)):
        d = np.min(np.linalg.norm(pts[:, None, :] - pts[None, chosen, :],
                                  axis=-1), axis=1)
        d[chosen] = -1.0
        chosen.append(int(np.argmax(d)))
    return datapack.select(directions=np.sort(chosen))


def drop_flagged(datapack: DataPack, max_flag_fraction=0.5):
    """Remove antennas whose flagged fraction exceeds the threshold (the
    reference antenna is never dropped)."""
    frac = datapack.flags.mean(axis=(1, 2))
    keep = np.nonzero(frac <= max_flag_fraction)[0]
    if datapack.ref_antenna not in keep:
        keep = np.sort(np.concatenate([[datapack.ref_antenna], keep]))
    return datapack.select(antennas=keep)
