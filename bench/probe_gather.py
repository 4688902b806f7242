"""Mosaic vector-gather re-probe (VERDICT r2 #7) — one JSON line.

The round-2 design sweep (DESIGN.md §1) found the Pallas fused
gather+contract kernel blocked: ``jnp.take`` / ``take_along_axis`` inside a
Pallas TPU kernel lowers to ``tpu.dynamic_gather``, which Mosaic rejects
with *"Not implemented: Multiple source vregs along gather dimension"* for
any table larger than one vreg (8 sublanes × 128 lanes) — so the 16384-row
z-pencil table cannot be vector-gathered in VMEM, and the XLA row-gather
formulation remains the measured optimum (~3.4 ns/row, issue-bound).

That is a point-in-time toolchain fact. **Run this probe after every
jax/Mosaic upgrade** (`python -m bench.probe_gather` on the TPU): if it
reports ``vector_gather_supported: true``, the ~3× pencil-traffic cut of
the fused VMEM kernel (DESIGN.md §1 "Known costs") is back on the table
and worth re-measuring against the row-gather baseline it also prints.
"""
import json
import time


def probe_mosaic_vector_gather(rows=16384, width=128):
    """Try to compile+run a Pallas kernel that vector-gathers rows of a
    (rows, width) VMEM-resident table via ``take_along_axis`` — the form
    that lowers to ``tpu.dynamic_gather``. Index array has the table's
    own shape (the sublane-gather pattern Mosaic supports for one-vreg
    tables). Returns (ok, detail)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    try:
        from jax.experimental import pallas as pl
    except Exception as e:                      # pallas unavailable
        return False, f"pallas import failed: {e}"

    def kernel(tab_ref, idx_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(tab_ref[...], idx_ref[...],
                                         axis=0)

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(rows, width)), jnp.float32)
    idx2d = jnp.asarray(rng.integers(0, rows, (rows, width)), jnp.int32)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, width), jnp.float32),
        )(table, idx2d)
        jax.block_until_ready(out)
        ref = jnp.take_along_axis(table, idx2d, axis=0)
        ok = bool(jnp.allclose(out, ref, rtol=1e-4))
        return ok, ("compiled+ran, values " + ("match" if ok else "WRONG"))
    except Exception as e:
        lines = [l for l in str(e).strip().split("\n") if l.strip()]
        return False, (lines[0][:300] if lines else type(e).__name__)


def rowgather_baseline(nx=128, n_pts=1 << 17, n_steps=64):
    """The DESIGN §1 baseline: chained value+grad point-evals through the
    XLA row-gather tricubic (the tracer's exact access pattern). Returns
    M point-evals/s — compare any future Pallas kernel against this."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ionotomo_tpu.core import tricubic
    from ionotomo_tpu.core.grids import Grid3D
    from ionotomo_tpu.models import chapman

    grid = Grid3D.from_bounds((-400.0, -400.0, 0.0),
                              (400.0, 400.0, 1100.0), (nx, nx, nx))
    m = chapman.log_parametrize(chapman.chapman_field(grid))
    f2d = m.reshape(nx * nx, nx)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(
        np.stack([rng.uniform(-300, 300, n_pts),
                  rng.uniform(-300, 300, n_pts),
                  rng.uniform(100, 900, n_pts)], -1), jnp.float32)

    @jax.jit
    def chained(p0):
        def step(p, _):
            v, g = tricubic.interp_rows_with_grad(f2d, grid, p)
            gn = g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-12)
            return p + 0.5 * gn + 1e-6 * v[:, None], None
        p_f, _ = jax.lax.scan(step, p0, None, length=n_steps)
        return p_f

    out = chained(pts)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = chained(pts)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return n_pts * n_steps / dt / 1e6


def main():
    import jax
    # control: a one-vreg table (8 sublanes × 128 lanes) — Mosaic DOES
    # support this; if the control fails the probe kernel itself is
    # wrong for the current pallas API and needs updating, not Mosaic
    ok_small, detail_small = probe_mosaic_vector_gather(rows=8)
    ok, detail = probe_mosaic_vector_gather()
    base = rowgather_baseline()
    print(json.dumps({
        "metric": "mosaic_vector_gather_probe",
        "vector_gather_supported": ok,
        "one_vreg_control_ok": ok_small,
        "control_detail": detail_small,
        "detail": detail,
        "rowgather_baseline_Mpt_evals_per_sec": round(base, 2),
        "jax_version": jax.__version__,
        "action": ("re-measure the Pallas fused gather+contract kernel "
                   "(DESIGN.md §1) — ~3x pencil-traffic headroom" if ok
                   else "still blocked; XLA row-gather remains optimal"),
    }))


if __name__ == "__main__":
    main()
