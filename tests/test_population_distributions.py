"""Population distributions: normalization, support, cdf/icdf round-trips
(mirrors reference tests/numpyro_distributions_test.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from gwinferno_tpu.interpolation import LogYBSpline
from gwinferno_tpu.population_distributions import BSplineDistribution
from gwinferno_tpu.population_distributions import Cosine
from gwinferno_tpu.population_distributions import Powerlaw
from gwinferno_tpu.population_distributions import PowerlawRedshift
from gwinferno_tpu.population_distributions import PowerlawSmoothedPowerlaw
from gwinferno_tpu.population_distributions import PSplineCoeficientPrior
from gwinferno_tpu.population_distributions import Sine
from gwinferno_tpu.population_distributions import cumtrapz

KEY = jax.random.PRNGKey(0)


def test_cumtrapz_vs_scipy():
    from scipy.integrate import cumulative_trapezoid

    x = jnp.linspace(0, 3, 57)
    y = jnp.sin(x) + 1.2
    got = np.asarray(cumtrapz(y, x))
    want = cumulative_trapezoid(np.asarray(y), np.asarray(x), initial=0)
    assert_allclose(got, want, rtol=1e-12)


@pytest.mark.parametrize(
    "d,lo,hi",
    [
        (Sine(), 0.0, np.pi),
        (Cosine(), -np.pi / 2, np.pi / 2),
        (Powerlaw(-2.3, minimum=3.0, maximum=50.0, low=3.0, high=50.0), 3.0, 50.0),
        (Powerlaw(-1.0, minimum=2.0, maximum=80.0, low=2.0, high=80.0), 2.0, 80.0),
    ],
)
def test_normalized_and_supported(d, lo, hi):
    grid = jnp.linspace(lo + 1e-9, hi - 1e-9, 30001)
    p = np.exp(np.asarray(d.log_prob(grid)))
    assert abs(np.trapezoid(p, np.asarray(grid)) - 1.0) < 1e-3
    x = np.asarray(d.sample(KEY, (5000,)))
    assert x.min() >= lo - 1e-9 and x.max() <= hi + 1e-9
    # cdf/icdf round trip
    qs = jnp.linspace(0.01, 0.99, 21)
    assert_allclose(np.asarray(d.cdf(d.icdf(qs))).ravel(), np.asarray(qs), atol=2e-3)


def test_powerlaw_redshift_norm_is_vt():
    from gwinferno_tpu.cosmology import PLANCK_2015_LVK_Cosmology as c

    zgrid = jnp.linspace(1e-9, 2.3, 1000)
    d = PowerlawRedshift(lamb=2.0, maximum=2.3, zgrid=zgrid, dVcdz=c.dVcdz(zgrid))
    # norm equals trapezoid of dVc/dz (1+z)^(lamb-1)
    want = np.trapezoid(np.asarray(c.dVcdz(zgrid)) * (1 + np.asarray(zgrid)) ** 1.0, np.asarray(zgrid))
    assert_allclose(float(d.norm), want, rtol=1e-10)
    # log_prob normalizes
    p = np.exp(np.asarray(d.log_prob(zgrid)))
    assert abs(np.trapezoid(p, np.asarray(zgrid)) - 1.0) < 1e-3
    x = np.asarray(d.sample(KEY, (3000,)))
    assert x.min() >= 0 and x.max() <= 2.3


def test_powerlaw_smoothed_powerlaw_f32_no_overflow():
    """The linear-space continuity constants overflow float32 at production
    prior scales (maximum**(alpha + alpha_max) ~ 95**22): every log-density
    became NaN and the config CLI flagged 25-56% of NUTS draws divergent.
    The log-space internals must stay finite (and match f64) in f32."""
    kw = dict(alpha=-2.35, minimum=8.0, maximum=95.0, alpha_max=25.0, alpha_min=6.0, low=2.0, high=100.0)
    x64 = jnp.linspace(2.5, 99.5, 101)
    want = np.asarray(PowerlawSmoothedPowerlaw(**kw).log_prob(x64))
    got = np.asarray(
        PowerlawSmoothedPowerlaw(**{k: jnp.float32(v) for k, v in kw.items()}).log_prob(x64.astype(jnp.float32))
    )
    assert np.isfinite(got).all()
    assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # gradient w.r.t. the sampled break/slope parameters finite in f32
    def lp(mx, amax):
        d32 = PowerlawSmoothedPowerlaw(alpha=jnp.float32(-2.35), minimum=jnp.float32(8.0),
                                       maximum=mx, alpha_max=amax, alpha_min=jnp.float32(6.0),
                                       low=jnp.float32(2.0), high=jnp.float32(100.0))
        return jnp.sum(d32.log_prob(x64.astype(jnp.float32)))
    g = jax.grad(lp, argnums=(0, 1))(jnp.float32(95.0), jnp.float32(25.0))
    assert np.isfinite(np.asarray(g)).all()


def test_powerlaw_smoothed_powerlaw_continuous():
    d = PowerlawSmoothedPowerlaw(alpha=-2.0, minimum=5.0, maximum=40.0, alpha_max=6.0, alpha_min=2.0, low=2.0, high=100.0)
    # continuity at the break points
    for brk in (5.0, 40.0):
        lo = float(d.log_prob(jnp.array(brk - 1e-6)))
        hi = float(d.log_prob(jnp.array(brk + 1e-6)))
        assert abs(lo - hi) < 1e-3
    grid = jnp.linspace(2.0 + 1e-6, 100.0 - 1e-6, 40001)
    p = np.exp(np.asarray(d.log_prob(grid)))
    assert abs(np.trapezoid(p, np.asarray(grid)) - 1.0) < 2e-3


def test_bspline_distribution():
    spl = LogYBSpline(8, xrange=(0.0, 1.0), normalize=False)
    grid = jnp.linspace(0.0, 1.0, 500)
    dmat = spl.bases(grid)
    cs = 0.4 * jax.random.normal(KEY, (8,))
    d = BSplineDistribution(0.0, 1.0, cs, grid, dmat)
    p = np.exp(np.asarray(d.log_prob(grid)))
    assert abs(np.trapezoid(p, np.asarray(grid)) - 1.0) < 2e-3
    x = np.asarray(d.sample(KEY, (2000,)))
    assert x.min() >= 0 and x.max() <= 1


def test_pspline_coefficient_prior():
    d = PSplineCoeficientPrior(5, 2.0, diff_order=1)
    cs = jnp.array([1.0, 2.0, 4.0, 7.0, 11.0])
    # -0.5 * 2 * (1+4+9+16)
    assert float(d.log_prob(cs)) == pytest.approx(-30.0)
    assert d.sample(KEY, (3,)).shape == (3, 5)
