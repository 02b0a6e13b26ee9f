"""Population distributions for config-driven models.

Distribution-protocol adapters (sample/log_prob/cdf/icdf over this
framework's PPL base class) for the source-parameter population models the
YAML pipeline instantiates by dotted path.

Parity: gwinferno/numpyro_distributions.py (class-for-class; the reference's
module name referenced its NumPyro dependency -- configs using either dotted
path resolve here via the parser's module aliasing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.integrate import trapezoid

from .models.bsplines.smoothing import apply_difference_prior
from .ppl import constraints
from .ppl.distributions import Distribution

__all__ = [
    "cumtrapz",
    "Sine",
    "Cosine",
    "Powerlaw",
    "PowerlawRedshift",
    "PowerlawSmoothedPowerlaw",
    "BSplineDistribution",
    "PSplineCoeficientPrior",
]


def cumtrapz(y, x):
    """Cumulative trapezoid with a leading 0 (vectorized; parity:
    numpyro_distributions.py:20-24)."""
    heights = 0.5 * (y[1:] + y[:-1]) * jnp.diff(x)
    return jnp.concatenate([jnp.zeros_like(y[:1]), jnp.cumsum(heights)])


class Sine(Distribution):
    """p(x) proportional to sin(x) on [minimum, maximum] (parity: :27-61)."""

    def __init__(self, minimum=0.0, maximum=jnp.pi):
        self.minimum, self.maximum = minimum, maximum
        super().__init__(jnp.broadcast_shapes(jnp.shape(minimum), jnp.shape(maximum)))
        self.support = constraints.interval(minimum, maximum)

    def sample(self, key, sample_shape=()):
        return self.icdf(jax.random.uniform(key, tuple(sample_shape) + self.batch_shape))

    def log_prob(self, value):
        lp = jnp.log(jnp.sin(value) / 2.0)
        return jnp.where(jnp.isnan(lp), -jnp.inf, lp)

    def cdf(self, value):
        cdf = jnp.atleast_1d((jnp.cos(value) - jnp.cos(self.minimum)) / (jnp.cos(self.maximum) - jnp.cos(self.minimum)))
        cdf = jnp.where(jnp.less(value, self.minimum), 0.0, cdf)
        return jnp.where(jnp.greater(value, self.maximum), 1.0, cdf)

    def icdf(self, q):
        norm = jnp.cos(self.minimum) - jnp.cos(self.maximum)
        return jnp.arccos(jnp.cos(self.minimum) - q * norm)


class Cosine(Distribution):
    """p(x) proportional to cos(x) on [minimum, maximum] (parity: :64-98)."""

    def __init__(self, minimum=-jnp.pi / 2.0, maximum=jnp.pi / 2.0):
        self.minimum, self.maximum = minimum, maximum
        super().__init__(jnp.broadcast_shapes(jnp.shape(minimum), jnp.shape(maximum)))
        self.support = constraints.interval(minimum, maximum)

    def sample(self, key, sample_shape=()):
        return self.icdf(jax.random.uniform(key, tuple(sample_shape) + self.batch_shape))

    def log_prob(self, value):
        lp = jnp.log(jnp.cos(value) / 2.0)
        return jnp.where(jnp.isnan(lp), -jnp.inf, lp)

    def cdf(self, value):
        cdf = jnp.atleast_1d((jnp.sin(value) - jnp.sin(self.minimum)) / (jnp.sin(self.maximum) - jnp.sin(self.minimum)))
        cdf = jnp.where(jnp.less(value, self.minimum), 0.0, cdf)
        return jnp.where(jnp.greater(value, self.maximum), 1.0, cdf)

    def icdf(self, q):
        norm = jnp.sin(self.minimum) - jnp.sin(self.maximum)
        return jnp.arcsin(jnp.sin(self.minimum) - q * norm)


class Powerlaw(Distribution):
    """Truncated powerlaw with the alpha == -1 logarithmic branch
    (parity: :101-153)."""

    def __init__(self, alpha, minimum=0.0, maximum=1.0, low=0.0, high=1.0):
        # as jnp values so the alpha == -1 branch stays an array select
        # (python-float arithmetic would raise ZeroDivisionError)
        self.alpha = jnp.asarray(alpha)
        self.minimum, self.maximum = jnp.asarray(minimum), jnp.asarray(maximum)
        super().__init__(jnp.broadcast_shapes(jnp.shape(minimum), jnp.shape(maximum), jnp.shape(alpha)))
        self.support = constraints.interval(low, high)

    def sample(self, key, sample_shape=()):
        return self.icdf(jax.random.uniform(key, tuple(sample_shape) + self.batch_shape))

    def log_prob(self, value):
        logp = self.alpha * jnp.log(value)
        logp = logp + jnp.log((1.0 + self.alpha) / (self.maximum ** (1.0 + self.alpha) - self.minimum ** (1.0 + self.alpha)))
        # alpha == -1: p(x) = 1 / (x ln(max/min)).  NB the reference adapter
        # drops the outer log here (numpyro_distributions.py:131), which is
        # inconsistent with its own cdf (:142) and with distributions.py:112;
        # we implement the intended normalization.
        logp_neg1 = -jnp.log(value) - jnp.log(jnp.log(self.maximum / self.minimum))
        return jnp.where(
            jnp.less(value, self.minimum) | jnp.greater(value, self.maximum),
            jnp.nan_to_num(-jnp.inf),
            jnp.where(jnp.equal(self.alpha, -1.0), logp_neg1, logp),
        )

    def cdf(self, value):
        cdf = jnp.atleast_1d(value ** (self.alpha + 1.0) - self.minimum ** (self.alpha + 1.0)) / (
            self.maximum ** (self.alpha + 1.0) - self.minimum ** (self.alpha + 1.0)
        )
        cdf_neg1 = jnp.log(value / self.minimum) / jnp.log(self.maximum / self.minimum)
        cdf = jnp.where(jnp.equal(self.alpha, -1.0), cdf_neg1, cdf)
        return jnp.clip(cdf, 0.0, 1.0)

    def icdf(self, q):
        icdf = (self.minimum ** (1.0 + self.alpha) + q * (self.maximum ** (1.0 + self.alpha) - self.minimum ** (1.0 + self.alpha))) ** (
            1.0 / (1.0 + self.alpha)
        )
        icdf_neg1 = self.minimum * jnp.exp(q * jnp.log(self.maximum / self.minimum))
        return jnp.where(jnp.equal(self.alpha, -1.0), icdf_neg1, icdf)


class PowerlawRedshift(Distribution):
    """Grid-based p(z) proportional to dVc/dz (1+z)^(lamb-1); ``.norm`` is the
    surveyed hypervolume consumed by rate reconstruction (parity: :156-201,
    analysis.py:410)."""

    def __init__(self, lamb, maximum, grid=None, zgrid=None, dVcdz=None, low=0.0, high=1000.0):
        from .cosmology import PLANCK_2015_LVK_Cosmology as Planck15

        self.lamb, self.maximum = lamb, maximum
        super().__init__(jnp.broadcast_shapes(jnp.shape(maximum), jnp.shape(lamb)))
        self.support = constraints.interval(low, high)
        if zgrid is None:
            zgrid = grid if grid is not None else jnp.linspace(1e-9, maximum, 1000)
        if dVcdz is None:
            dVcdz = Planck15.dVcdz(zgrid)
        self.zs = zgrid
        self.dVdc_ = dVcdz
        self.pdfs = self.dVdc_ * (1 + self.zs) ** (lamb - 1)
        self.norm = trapezoid(self.pdfs, self.zs)
        self.pdfs = self.pdfs / self.norm
        self.cdfgrid = cumtrapz(self.pdfs, self.zs).at[-1].set(1)

    def sample(self, key, sample_shape=()):
        return self.icdf(jax.random.uniform(key, tuple(sample_shape) + self.batch_shape))

    def log_prob(self, value, dVdc=None):
        if dVdc is None:
            dVdc = jnp.interp(value, self.zs, self.dVdc_)
        return jnp.where(
            jnp.less_equal(value, self.maximum),
            jnp.log(dVdc) + (self.lamb - 1.0) * jnp.log(1.0 + value) - jnp.log(self.norm),
            jnp.nan_to_num(-jnp.inf),
        )

    def cdf(self, value):
        return jnp.interp(value, self.zs, self.cdfgrid)

    def icdf(self, q):
        return jnp.interp(q, self.cdfgrid, self.zs)


class PowerlawSmoothedPowerlaw(Distribution):
    """Three-segment broken powerlaw with continuity constants k1/k2/k3
    (parity: :204-255, incl. the ones-returning ``sample`` stub)."""

    def __init__(self, alpha, minimum, maximum, alpha_max, alpha_min, low, high):
        self.minimum, self.maximum, self.alpha = minimum, maximum, alpha
        self.alpha_max, self.alpha_min = -alpha_max, alpha_min
        self.low, self.high = low, high
        super().__init__(
            jnp.broadcast_shapes(
                jnp.shape(maximum), jnp.shape(minimum), jnp.shape(alpha), jnp.shape(alpha_max), jnp.shape(alpha_min)
            )
        )
        self.support = constraints.interval(low, high)
        # continuity constants k1/k2/k3 with exact normalization:
        #   I = k1 [ I_low + r_mid I_mid + r_mid r_high I_high ] = 1
        # NB the reference's constants (numpyro_distributions.py:221-235)
        # carry a sign error and integrate to != 1 for rising low slopes;
        # the corrected closed form is used here (its cdf-free structure,
        # segment continuity, and log_prob branch layout are preserved).
        r_mid = self.minimum ** (self.alpha_min - self.alpha)
        r_high = self.maximum ** (self.alpha - self.alpha_max)
        seg_low = (self.minimum ** (self.alpha_min + 1) - self.low ** (self.alpha_min + 1)) / (self.alpha_min + 1)
        seg_mid = (self.maximum ** (self.alpha + 1) - self.minimum ** (self.alpha + 1)) / (self.alpha + 1)
        seg_high = (self.high ** (self.alpha_max + 1) - self.maximum ** (self.alpha_max + 1)) / (self.alpha_max + 1)
        self.k1 = 1.0 / (seg_low + r_mid * seg_mid + r_mid * r_high * seg_high)
        self.k2 = self.k1 * r_mid
        self.k3 = self.k2 * r_high

    def sample(self, key, sample_shape=()):
        return jnp.ones(tuple(sample_shape) + self.batch_shape)

    def log_prob(self, value):
        low_pl = jnp.where(jnp.less(value, self.minimum), jnp.log(self.k1) + jnp.log(value) * self.alpha_min, 0.0)
        high_pl = jnp.where(jnp.greater(value, self.maximum), jnp.log(self.k3) + jnp.log(value) * self.alpha_max, 0.0)
        mid_pl = jnp.where(
            jnp.greater_equal(value, self.minimum),
            jnp.where(jnp.less_equal(value, self.maximum), jnp.log(self.k2) + jnp.log(value) * self.alpha, 0.0),
            0.0,
        )
        return low_pl + mid_pl + high_pl


class BSplineDistribution(Distribution):
    """Generic 1-D pdf from a spline design matrix on a grid: lpdf table +
    trapezoid norm + cumtrapz cdf built at construction (parity: :258-299)."""

    def __init__(self, minimum, maximum, cs, grid, grid_dmat):
        self.minimum, self.maximum, self.cs = minimum, maximum, cs
        super().__init__(jnp.broadcast_shapes(jnp.shape(maximum), jnp.shape(minimum)))
        self.support = constraints.interval(minimum, maximum)
        self.grid = grid
        # grid_dmat may contain non-finite rows where the grid leaves the support
        self.lpdfs = jnp.nan_to_num(jnp.einsum("i,i...->...", self.cs, grid_dmat), nan=-jnp.inf)
        self.pdfs = jnp.exp(self.lpdfs)
        self.norm = trapezoid(self.pdfs, self.grid)
        self.pdfs = self.pdfs / self.norm
        self.cdfgrid = cumtrapz(self.pdfs, self.grid).at[-1].set(1)

    def sample(self, key, sample_shape=()):
        return self.icdf(jax.random.uniform(key, tuple(sample_shape) + self.batch_shape))

    def _log_prob_nonorm(self, value):
        return jnp.interp(value, self.grid, self.lpdfs)

    def log_prob(self, value):
        return self._log_prob_nonorm(value) - jnp.log(self.norm)

    def cdf(self, value):
        return jnp.interp(value, self.grid, self.cdfgrid)

    def icdf(self, q):
        return jnp.interp(q, self.cdfgrid, self.grid)


class PSplineCoeficientPrior(Distribution):
    """Event-shape (N,) coefficient prior whose log_prob is the P-spline
    difference penalty (parity: :302-325, incl. the ones ``sample`` stub)."""

    support = constraints.real_vector
    event_ndim = 1

    def __init__(self, N, inv_var, diff_order=2):
        self.inv_var = inv_var
        self.diff_order = diff_order
        self.N = N
        super().__init__(jnp.shape(inv_var), (N,))

    def sample(self, key, sample_shape=()):
        return jnp.ones(tuple(sample_shape) + self.batch_shape + (self.N,))

    def log_prob(self, value):
        return apply_difference_prior(value, self.inv_var, self.diff_order)
