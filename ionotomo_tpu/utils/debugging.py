"""NaN/Inf checking mode (SURVEY.md §5.2 "race detection / sanitizers").

The engine is pure-functional so there are no races to detect; the failure
mode that matters is numerical (overflowing exp(m), degenerate geometry).
``checked`` wraps any jittable function with jax.experimental.checkify so
NaN/Inf production raises with a payload instead of propagating silently.
Enabled per-call or via RuntimeConfig.nan_checks in the pipeline.
"""
from __future__ import annotations

import functools

import jax
from jax.experimental import checkify


def checked(fn, enabled: bool = True):
    """Wrap ``fn`` so float-error checks (NaN/Inf/div/OOB) raise on call."""
    if not enabled:
        return fn

    errs = checkify.float_checks | checkify.index_checks

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = checkify.checkify(fn, errors=errs)(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def assert_all_finite(tree, name="value"):
    """Host-side guard for pipeline boundaries (checkpoints, outputs)."""
    import numpy as np
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}")
