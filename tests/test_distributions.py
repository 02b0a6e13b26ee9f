"""L0 pdf kernels vs scipy oracles (mirrors reference tests/distributions_test.py)."""

import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose
from scipy.special import expit
from scipy.stats import beta as scipy_beta
from scipy.stats import truncnorm as scipy_truncnorm
from scipy.stats import truncpareto

import gwinferno_tpu.distributions as dist

RTOL = 1e-5


def test_logistic_functions():
    x = jnp.linspace(-10, 10, 50)
    expectation = expit(np.asarray(x))
    assert_allclose(dist.logistic_function(x, L=1, k=1, x0=0), expectation, rtol=RTOL)
    assert_allclose(dist.logistic_unit(x, x0=0, sgn=-1, sc=1), expectation, rtol=RTOL)


def test_log_logistic_unit_matches_log_of_linear():
    x = jnp.linspace(-10, 10, 201)
    for sgn in (1, -1):
        got = dist.log_logistic_unit(x, x0=0.3, sgn=sgn, sc=4)
        want = jnp.log(dist.logistic_unit(x, x0=0.3, sgn=sgn, sc=4))
        assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_log_logistic_unit_stable_in_tail():
    # deep in the truncated tail the linear form underflows; log form is linear
    got = dist.log_logistic_unit(jnp.array([500.0]), x0=0.0, sgn=1, sc=4)
    assert np.isfinite(got).all()
    assert_allclose(got, -4 * 500.0, rtol=1e-6)


def test_powerlaw_pdf_vs_truncpareto():
    x = jnp.linspace(2, 55, 1000)
    alpha, xmin, xmax = -3.2, 3.0, 50.0
    b = -alpha - 1
    expectation = truncpareto.pdf(np.asarray(x), b, xmax / xmin, loc=0.0, scale=xmin)
    assert_allclose(dist.powerlaw_pdf(x, alpha, xmin, xmax), expectation, rtol=RTOL)


def test_powerlaw_pdf_alpha_minus_one():
    x = jnp.linspace(3, 50, 500)
    got = dist.powerlaw_pdf(x, -1.0, 3.0, 50.0)
    want = 1.0 / (np.asarray(x) * np.log(50.0 / 3.0))
    assert_allclose(got, want, rtol=RTOL)


def test_log_powerlaw_matches_linear():
    x = jnp.linspace(1, 60, 300)
    got = jnp.exp(dist.log_powerlaw_pdf(x, 2.3, 3.0, 50.0))
    want = dist.powerlaw_pdf(x, 2.3, 3.0, 50.0)
    assert_allclose(got, want, rtol=1e-10)


def test_powerlaw_gradient_finite_outside_support():
    import jax

    g = jax.grad(lambda a: jnp.sum(dist.powerlaw_pdf(jnp.array([1.0, 60.0, 10.0]), a, 3.0, 50.0)))(2.0)
    assert np.isfinite(g)


def test_powerlaw_float32_degenerate_support_grad_finite():
    """Regression: per-sample q-support ``[mmin/m1, 1]`` degenerates (or
    inverts, for samples with m1 < mmin) in float32, and the normalization's
    direct ``high^ap1 - low^ap1`` difference cancels to log(0) -> exp(+inf)
    -> NaN gradients on TPU.  The log-space/expm1 norm must keep value AND
    gradient finite through the out-of-bounds where-mask."""
    import jax

    m1 = jnp.asarray([2.0001, 5.0 + 1e-7, 5.0, 30.0, 80.0], jnp.float32)
    q = jnp.asarray([0.9, 0.999, 1.0, 0.5, 0.2], jnp.float32)

    def f(beta):
        p = dist.powerlaw_pdf(q, beta, (5.0 / m1).astype(jnp.float32), jnp.float32(1.0))
        return jnp.sum(jnp.where(jnp.isfinite(p), p, 0.0))

    for beta in [-1.0, 0.0, 1.3]:
        v, g = jax.value_and_grad(f)(jnp.float32(beta))
        assert np.isfinite(v), beta
        assert np.isfinite(g), beta


def test_powerlaw_narrow_support_norm_precision():
    # expm1 formulation keeps the norm accurate where the direct difference
    # loses most of its bits (narrow but non-degenerate support)
    low, high, alpha = 0.999999, 1.0, 1.3
    x = jnp.asarray([0.9999995])
    got = float(dist.powerlaw_pdf(x, alpha, low, high)[0])
    ap1 = alpha + 1.0
    want = ap1 * float(x[0]) ** alpha / (high**ap1 - low**ap1)
    assert_allclose(got, want, rtol=1e-6)


def test_truncnorm_pdf():
    x = jnp.linspace(-1, 1.2, 50)
    mu, sigma, lo, hi = 0.3, 1.4, -0.8, 1.0
    a, b = (lo - mu) / sigma, (hi - mu) / sigma
    expectation = scipy_truncnorm.pdf(np.asarray(x), a, b, loc=mu, scale=sigma)
    assert_allclose(dist.truncnorm_pdf(x, mu, sigma, lo, hi, log=False), expectation, rtol=RTOL)


def test_truncnorm_pdf_log_is_lognormal():
    x = jnp.linspace(0.1, 10.2, 50)
    mu, sigma = 0.8, 1.4
    log_a, log_b = -1.0, 2.0
    a, b = (log_a - mu) / sigma, (log_b - mu) / sigma
    expectation = scipy_truncnorm.pdf(np.log(np.asarray(x)), a, b, loc=mu, scale=sigma) / np.asarray(x)
    got = dist.truncnorm_pdf(x, mu, sigma, np.exp(log_a), np.exp(log_b), log=True)
    assert_allclose(got, expectation, rtol=RTOL)


def test_betadist():
    x = jnp.linspace(0, 1, 50)
    expectation = scipy_beta.pdf(np.asarray(x), 2, 3)
    assert_allclose(dist.betadist(x, 2, 3), expectation, rtol=RTOL)


def test_betadist_scaled_normalizes():
    x = jnp.linspace(0, 0.8, 4001)
    p = dist.betadist(x, 2.2, 3.3, scale=0.8)
    assert_allclose(np.trapezoid(np.asarray(p), np.asarray(x)), 1.0, atol=1e-4)


def test_smooth_window_semantics():
    dx, xmin = 3.0, 5.0
    x = jnp.array([4.0, 5.0 + 1e-9, 6.5, 7.999999, 8.0, 20.0])
    s = dist.smooth(dx, x, xmin)
    assert s[0] == 0.0  # below xmin
    assert 0.0 <= s[1] < 1e-6  # just above xmin -> ~0
    assert 0.0 < s[2] < 1.0  # mid-window
    assert s[3] > 1.0 - 1e-5  # just below xmin+dx -> ~1
    assert s[4] == 1.0 and s[5] == 1.0  # at/above xmin+dx
    # monotone increasing across the window
    xs = jnp.linspace(5.0001, 7.9999, 100)
    ss = dist.smooth(dx, xs, xmin)
    assert np.all(np.diff(np.asarray(ss)) >= 0)


def test_smooth_gradient_finite():
    import jax

    g = jax.grad(lambda d: jnp.sum(dist.smooth(d, jnp.array([4.0, 6.0, 9.0]), 5.0)))(3.0)
    assert np.isfinite(g)
