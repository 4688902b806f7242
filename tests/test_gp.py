"""Dense GP toolkit tests: interpolation exactness, evidence maximisation,
kernel algebra (reference test: test_gaussian_process.py)."""
import numpy as np
import jax.numpy as jnp

from ionotomo_tpu.utils import gaussian_process as gp


def data(n=40, noise=0.05, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(-3, 3, n))[:, None]
    f = np.sin(2.0 * x[:, 0]) + 0.5 * x[:, 0]
    y = f + rng.normal(scale=noise, size=n)
    return (jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
            jnp.asarray(f, jnp.float32))


def test_gp_predict_interpolates_clean_data():
    x, y, f = data(noise=1e-4)
    k = gp.SquaredExponential(sigma=1.0, length_scale=0.8)
    mean, var = gp.gp_predict(k, x, y, 1e-3, x)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(y), atol=5e-2)
    assert np.all(np.asarray(var) >= 0)


def test_gp_predict_between_points_matches_truth():
    x, y, f = data(n=60, noise=0.02)
    k = gp.SquaredExponential(sigma=1.0, length_scale=0.7)
    xs = jnp.asarray(np.linspace(-2.5, 2.5, 30)[:, None], jnp.float32)
    mean, var = gp.gp_predict(k, x, y, 0.02, xs)
    truth = np.sin(2.0 * np.asarray(xs)[:, 0]) + 0.5 * np.asarray(xs)[:, 0]
    assert np.sqrt(np.mean((np.asarray(mean) - truth) ** 2)) < 0.1


def test_marginal_likelihood_prefers_true_lengthscale():
    x, y, _ = data(n=50, noise=0.05, seed=1)
    lmls = []
    for ell in (0.05, 0.7, 5.0):
        k = gp.SquaredExponential(sigma=1.0, length_scale=ell)
        lmls.append(float(gp.log_marginal_likelihood(k, x, y, 0.05)))
    assert lmls[1] > lmls[0] and lmls[1] > lmls[2]


def test_fit_hyperparameters_improves_evidence():
    x, y, _ = data(n=50, noise=0.05, seed=2)
    k0 = gp.SquaredExponential(sigma=0.3, length_scale=2.5)
    before = float(gp.log_marginal_likelihood(k0, x, y, 0.05))
    k1, neg_lml = gp.fit_hyperparameters(k0, x, y, 0.05, steps=150)
    after = float(gp.log_marginal_likelihood(k1, x, y, 0.05))
    assert after > before
    assert 0.2 < float(jnp.asarray(k1.length_scale)) < 2.0


def test_kernel_algebra_sum_product():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(10, 2)),
                    jnp.float32)
    a = gp.SquaredExponential(1.0, 1.0)
    b = gp.Matern(0.5, 2.0, nu=1.5)
    ks = (a + b)(x, x)
    kp = (a * b)(x, x)
    np.testing.assert_allclose(np.asarray(ks),
                               np.asarray(a(x, x) + b(x, x)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(kp),
                               np.asarray(a(x, x) * b(x, x)), atol=1e-6)
    # SPD of all kernel matrices
    for m in (ks, kp):
        w = np.linalg.eigvalsh(np.asarray(m, np.float64))
        assert w.min() > -1e-5


def test_matern_limits_match_exponential_and_rq():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(8, 1)),
                    jnp.float32)
    m12 = gp.Matern(1.0, 1.3, nu=0.5)(x, x)
    # ν=1/2 Matérn IS the exponential kernel
    r = np.sqrt(np.maximum(
        ((np.asarray(x)[:, None] - np.asarray(x)[None]) ** 2).sum(-1),
        0))
    np.testing.assert_allclose(np.asarray(m12), np.exp(-r / 1.3), atol=1e-5)
    # RQ α→∞ approaches SE (α kept moderate: f32 log(1+x) cancellation
    # dominates beyond α~1e3; tolerance covers the O(r⁴/α) expansion term)
    xs = 0.3 * x
    rq = gp.RationalQuadratic(1.0, 1.0, alpha=1e3)(xs, xs)
    se = gp.SquaredExponential(1.0, 1.0)(xs, xs)
    np.testing.assert_allclose(np.asarray(rq), np.asarray(se), atol=2e-3)
