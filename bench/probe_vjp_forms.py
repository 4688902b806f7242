"""Reconciliation probe for the row-gather adjoint (round 5, DESIGN.md
§18): why does the shipped 24-scalar hand scatter (probe_scatter form A,
measured 3.5x SLOWER than the dense-row form B *in isolation*) make the
full inner-Jacobian VJP 3.5x FASTER (0.110 s → 0.031 s,
.sweeps/c5_breakdown.log)?

Hypothesis under test: XLA's *derived transpose of the whole forward
chain* is not probe-form B alone — reverse-mode materialises the
gathered (N, K, nz) `rows` residual and the (N, nz) band cotangent and
pays their HBM round-trips, while the primitive's transpose recomputes
nothing and touches only (N, K, L) scalars + one scatter. So the win is
residual/cotangent *traffic*, not the scatter formulation itself.

Measured here, at config-5 inner-Jacobian scale (N = 490k points,
128³ grid, zp shape K=8/L=3):

  fwd                 — the row-gather forward (gather + 2 einsums)
  vjp_derived         — pullback of the plain-jnp impl (XLA transpose:
                        what shipped before round 4 / what the vmapped
                        EnKF fallback still pays)
  vjp_primitive       — pullback through rows_value_p (hand scatter)
  B-member vmapped twins of all three (the EnKF member axis; B=8)

Run: python -m bench.probe_vjp_forms    (JSON lines)
Env: VJP_N (default 490000), VJP_GRID (128), VJP_MEMBERS (8).
"""
import json
import os
import time

import numpy as np


def t(fn, *args, reps=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from ionotomo_tpu.core.tricubic import rows_value, _rows_value_impl

    n = int(os.environ.get("VJP_N", "490000"))
    g = int(os.environ.get("VJP_GRID", "128"))
    b = int(os.environ.get("VJP_MEMBERS", "8"))
    n_rows, nz = g * g, g
    k, l = 8, 3
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(n_rows, nz)), jnp.float32)
    tables = jnp.asarray(rng.normal(size=(b, n_rows, nz)), jnp.float32)
    bx = rng.integers(1, g - 1, n)
    by = rng.integers(1, g - 1, n)
    ri = jnp.asarray(
        np.clip(bx[:, None] + rng.integers(-1, 2, (n, k)), 0, g - 1) * g
        + np.clip(by[:, None] + rng.integers(-1, 2, (n, k)), 0, g - 1),
        jnp.int32)
    zi = jnp.asarray(rng.integers(1, g - 1, n)[:, None]
                     + np.arange(-1, 2), jnp.int32)
    wxy = jnp.asarray(rng.normal(size=(n, k)), jnp.float32)
    wz = jnp.asarray(rng.normal(size=(n, l)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    cts = jnp.asarray(rng.normal(size=(b, n)), jnp.float32)

    def f_prim(tb):
        return rows_value(tb, ri, wxy, zi, wz, xy_first=True)

    def f_plain(tb):
        return _rows_value_impl(tb, ri, wxy, zi, wz, xy_first=True)

    # parity first: same linear map, same transpose result
    y1, y2 = f_prim(table), f_plain(table)
    g1 = jax.vjp(f_prim, table)[1](ct)[0]
    g2 = jax.vjp(f_plain, table)[1](ct)[0]
    print(json.dumps({
        "probe": "vjp_forms", "check": "parity",
        "fwd_rel": float(jnp.abs(y1 - y2).max()
                         / jnp.abs(y2).max()),
        "vjp_rel": float(jnp.abs(g1 - g2).max()
                         / jnp.maximum(jnp.abs(g2).max(), 1e-30))}),
        flush=True)

    def pullback(f):
        def run(tb, c):
            return jax.vjp(f, tb)[1](c)[0]
        return jax.jit(run)

    rows = dict(
        fwd=jax.jit(f_plain),
        vjp_derived=pullback(f_plain),
        vjp_primitive=pullback(f_prim),
    )
    for name, fn in rows.items():
        args = (table,) if name == "fwd" else (table, ct)
        print(json.dumps({"probe": "vjp_forms", "variant": name,
                          "seconds": round(t(fn, *args), 5)}), flush=True)

    # --- the EnKF member axis: vmap over the field/table -------------
    for name, f in (("derived", f_plain), ("primitive", f_prim)):
        vfwd = jax.jit(jax.vmap(f))
        print(json.dumps({"probe": "vjp_forms",
                          "variant": f"vmap{b}_fwd_{name}",
                          "seconds": round(t(vfwd, tables), 5)}),
              flush=True)

        def vrun(tbs, cs, f=f):
            def one(tb, c):
                return jax.vjp(f, tb)[1](c)[0]
            return jax.vmap(one)(tbs, cs)
        vrun = jax.jit(vrun)
        print(json.dumps({"probe": "vjp_forms",
                          "variant": f"vmap{b}_vjp_{name}",
                          "seconds": round(t(vrun, tables, cts), 5)}),
              flush=True)
        gv1 = vrun(tables, cts)
        gv2 = jax.vmap(lambda tb, c: jax.vjp(f_plain, tb)[1](c)[0])(
            tables, cts)
        print(json.dumps({"probe": "vjp_forms",
                          "check": f"vmap_parity_{name}",
                          "rel": float(jnp.abs(gv1 - gv2).max()
                                       / jnp.abs(gv2).max())}), flush=True)


if __name__ == "__main__":
    main()
