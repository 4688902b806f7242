"""Krylov solver tests: known-solution systems, masked convergence, batching."""
import numpy as np
import jax
import jax.numpy as jnp

from ionotomo_tpu.core import linalg


def spd_system(n=40, seed=0, cond=50.0):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    eig = np.logspace(0, np.log10(cond), n)
    a = (q * eig) @ q.T
    x_true = rng.normal(size=n)
    return (jnp.asarray(a, jnp.float32), jnp.asarray(x_true, jnp.float32))


def test_cg_solves_spd_system():
    a, x_true = spd_system()
    b = a @ x_true
    x, info = linalg.cg(lambda v: a @ v, b, max_iters=200, tol=1e-6)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                               rtol=0, atol=2e-3)
    assert bool(info.converged)
    assert int(info.iterations) < 200


def test_cg_masked_convergence_freezes_solution():
    """Extra iterations after convergence must not perturb the answer."""
    a, x_true = spd_system(n=16, cond=5.0)
    b = a @ x_true
    x1, _ = linalg.cg(lambda v: a @ v, b, max_iters=60, tol=1e-6)
    x2, _ = linalg.cg(lambda v: a @ v, b, max_iters=400, tol=1e-6)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-5)


def test_cg_preconditioner_speeds_convergence():
    a, x_true = spd_system(n=60, cond=1e4, seed=3)
    b = a @ x_true
    diag = jnp.diag(a)
    _, info_plain = linalg.cg(lambda v: a @ v, b, max_iters=300, tol=1e-5)
    _, info_pc = linalg.cg(lambda v: a @ v, b, max_iters=300, tol=1e-5,
                           preconditioner=lambda v: v / diag)
    assert int(info_pc.iterations) <= int(info_plain.iterations)


def test_cg_pytree_operands():
    a, x_true = spd_system(n=20, cond=10.0)

    def matvec(tree):
        return {"u": a @ tree["u"]}

    b = {"u": a @ x_true}
    x, info = linalg.cg(matvec, b, max_iters=100, tol=1e-6)
    np.testing.assert_allclose(np.asarray(x["u"]), np.asarray(x_true),
                               atol=2e-3)


def test_lsqr_overdetermined_least_squares():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(80, 30)), jnp.float32)
    x_true = jnp.asarray(rng.normal(size=30), jnp.float32)
    b = a @ x_true
    x, info = linalg.lsqr(lambda v: a @ v, lambda y: a.T @ y, b,
                          jnp.zeros(30), max_iters=100, tol=1e-7)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true), atol=2e-3)


def test_lsqr_damping_shrinks_solution():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(50, 20)), jnp.float32)
    b = jnp.asarray(rng.normal(size=50), jnp.float32)
    x0, _ = linalg.lsqr(lambda v: a @ v, lambda y: a.T @ y, b,
                        jnp.zeros(20), damp=0.0, max_iters=80)
    x1, _ = linalg.lsqr(lambda v: a @ v, lambda y: a.T @ y, b,
                        jnp.zeros(20), damp=5.0, max_iters=80)
    assert float(jnp.linalg.norm(x1)) < float(jnp.linalg.norm(x0))
    # damped solution matches the normal-equations answer
    want = np.linalg.solve(np.asarray(a.T @ a) + 25.0 * np.eye(20),
                           np.asarray(a.T @ b))
    np.testing.assert_allclose(np.asarray(x1), want, atol=2e-3)


def test_batched_cg_via_vmap():
    keys = [spd_system(n=24, seed=s) for s in range(4)]
    a_batch = jnp.stack([a for a, _ in keys])
    x_batch = jnp.stack([x for _, x in keys])
    b_batch = jnp.einsum("bij,bj->bi", a_batch, x_batch)

    def solve(a, b):
        x, info = linalg.cg(lambda v: a @ v, b, max_iters=150, tol=1e-6)
        return x

    xs = jax.vmap(solve)(a_batch, b_batch)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(x_batch),
                               atol=5e-3)


def outlier_spd_system(n=200, k=6, seed=3):
    """I + PSD with k large outlier eigenvalues over a unit bulk — the
    shape of the inversion engine's whitened update operator."""
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    eig = np.concatenate([np.logspace(4, 2, k), np.ones(n - k)])
    a = (q * eig) @ q.T
    return (jnp.asarray(a, jnp.float32), jnp.asarray(q[:, :k], jnp.float32),
            jnp.asarray(eig[:k], jnp.float32))


def test_subspace_eigs_recovers_outlier_spectrum():
    a, u_true, lam_true = outlier_spd_system()
    u, lam = linalg.subspace_eigs(lambda v: a @ v, 200, 6,
                                  jax.random.PRNGKey(0), iters=3)
    np.testing.assert_allclose(np.asarray(lam), np.asarray(lam_true),
                               rtol=1e-3)
    # eigenvectors match up to sign
    overlap = np.abs(np.asarray(jnp.sum(u * u_true, axis=0)))
    np.testing.assert_allclose(overlap, 1.0, atol=1e-3)
    # columns orthonormal
    np.testing.assert_allclose(np.asarray(u.T @ u), np.eye(6), atol=1e-3)


def test_spectral_preconditioner_collapses_outliers():
    """With the outliers deflated, PCG reaches the f32 floor in a handful
    of iterations where plain CG at the same depth is nowhere near —
    the run-to-convergence use these utilities are FOR. (Deflating a
    truncation-REGULARISED solve is measurably harmful and rejected:
    bench/probe_deflation.py, DESIGN.md §17.)"""
    a, u_true, lam_true = outlier_spd_system()
    u, lam = linalg.subspace_eigs(lambda v: a @ v, 200, 6,
                                  jax.random.PRNGKey(0), iters=3)
    rng = np.random.default_rng(5)
    x_true = jnp.asarray(rng.normal(size=200), jnp.float32)
    b = a @ x_true
    m = linalg.spectral_preconditioner(u, lam)
    xp, _ = linalg.cg(lambda v: a @ v, b, max_iters=4, tol=1e-12,
                      preconditioner=m)
    xc, _ = linalg.cg(lambda v: a @ v, b, max_iters=4, tol=1e-12)
    err_p = float(jnp.linalg.norm(xp - x_true) / jnp.linalg.norm(x_true))
    err_c = float(jnp.linalg.norm(xc - x_true) / jnp.linalg.norm(x_true))
    assert err_p < 0.02
    assert err_p < 0.1 * err_c
