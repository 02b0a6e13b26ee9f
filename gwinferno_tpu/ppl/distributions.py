"""Probability distributions for the PPL layer.

Minimal-but-correct set covering every hyperprior the reference's models and
configs use (Normal, Uniform, HalfNormal, Gamma, Beta, Dirichlet, Categorical,
TruncatedNormal, LogNormal, Exponential) plus the machinery NUTS needs:
``support`` constraints with registered bijectors, broadcasting
``batch_shape``/``event_shape``, and reparameterized sampling.

All ``log_prob`` implementations are elementwise-safe under jit/grad: invalid
values produce ``-inf`` through ``where`` guards rather than ``nan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import betaln
from jax.scipy.special import erf
from jax.scipy.special import gammaln
from jax.scipy.special import xlogy

from . import constraints

__all__ = [
    "Distribution",
    "Normal",
    "HalfNormal",
    "LogNormal",
    "Uniform",
    "Gamma",
    "Exponential",
    "Beta",
    "Dirichlet",
    "Categorical",
    "MixtureGeneral",
    "TruncatedNormal",
    "Delta",
    "ImproperUniform",
    "Unit",
]

_LOG_SQRT_2PI = 0.5 * jnp.log(2.0 * jnp.pi)


def _ndtr(z):
    return 0.5 * (1.0 + erf(z / jnp.sqrt(2.0)))


def _concrete(x):
    """numpy view of x when it is a concrete value; None under tracing."""
    if isinstance(x, jax.core.Tracer):
        return None
    try:
        return np.asarray(x)
    except (TypeError, ValueError):  # pragma: no cover - exotic inputs
        return None


class Distribution:
    """Base distribution.

    ``batch_shape`` broadcasts over parameters; ``event_shape`` is the trailing
    shape of a single draw.  ``support`` is a :mod:`constraints` descriptor
    whose bijector maps unconstrained space onto the support.

    ``arg_constraints`` maps parameter name -> (predicate, description); the
    numpyro-parity eager check (reference
    gwinferno/numpyro_distributions.py:27-61 via numpyro's arg_constraints):
    malformed CONCRETE arguments (a Uniform(high<low), a negative scale from
    a bad config) raise immediately instead of silently sampling garbage.
    Traced arguments (hyperparameters mid-inference) skip the check -- their
    invalid regions are handled by the where-guarded log_probs.
    """

    support = constraints.real
    event_ndim = 0
    arg_constraints = {}

    def __init__(self, batch_shape=(), event_shape=()):
        self.batch_shape = tuple(batch_shape)
        self.event_shape = tuple(event_shape)
        self._validate_args()

    def _validate_args(self):
        for name, (pred, desc) in self.arg_constraints.items():
            val = _concrete(getattr(self, name, None))
            if val is None:
                continue
            if not np.all(pred(val)):
                raise ValueError(
                    f"{type(self).__name__}: argument '{name}' must be {desc}, got {val!r}"
                )

    @property
    def shape(self):
        return self.batch_shape + self.event_shape

    def sample(self, key, sample_shape=()):
        raise NotImplementedError

    def log_prob(self, value):
        raise NotImplementedError

    def expand_shapes(self, sample_shape=()):
        return tuple(sample_shape) + self.shape


class Normal(Distribution):
    support = constraints.real
    arg_constraints = {"scale": (lambda v: v > 0, "positive")}

    def __init__(self, loc=0.0, scale=1.0):
        self.loc, self.scale = loc, scale
        super().__init__(jnp.broadcast_shapes(jnp.shape(loc), jnp.shape(scale)))

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return self.loc + self.scale * jax.random.normal(key, shape)

    def log_prob(self, value):
        z = (value - self.loc) / self.scale
        return -0.5 * z * z - jnp.log(self.scale) - _LOG_SQRT_2PI

    def cdf(self, value):
        return _ndtr((value - self.loc) / self.scale)

    def icdf(self, q):
        return self.loc + self.scale * jnp.sqrt(2.0) * jax.scipy.special.erfinv(2.0 * q - 1.0)


class HalfNormal(Distribution):
    support = constraints.positive
    arg_constraints = {"scale": (lambda v: v > 0, "positive")}

    def __init__(self, scale=1.0):
        self.scale = scale
        super().__init__(jnp.shape(scale))

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jnp.abs(jax.random.normal(key, shape)) * self.scale

    def log_prob(self, value):
        z = value / self.scale
        lp = jnp.log(2.0) - 0.5 * z * z - jnp.log(self.scale) - _LOG_SQRT_2PI
        return jnp.where(value >= 0, lp, -jnp.inf)


class LogNormal(Distribution):
    support = constraints.positive
    arg_constraints = {"scale": (lambda v: v > 0, "positive")}

    def __init__(self, loc=0.0, scale=1.0):
        self.loc, self.scale = loc, scale
        super().__init__(jnp.broadcast_shapes(jnp.shape(loc), jnp.shape(scale)))

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jnp.exp(self.loc + self.scale * jax.random.normal(key, shape))

    def log_prob(self, value):
        safe = jnp.where(value > 0, value, 1.0)
        z = (jnp.log(safe) - self.loc) / self.scale
        lp = -0.5 * z * z - jnp.log(safe) - jnp.log(self.scale) - _LOG_SQRT_2PI
        return jnp.where(value > 0, lp, -jnp.inf)


class Uniform(Distribution):
    arg_constraints = {"_width": (lambda v: v > 0, "high > low")}

    def __init__(self, low=0.0, high=1.0):
        self.low, self.high = low, high
        self._width = None if (_concrete(low) is None or _concrete(high) is None) else _concrete(high) - _concrete(low)
        super().__init__(jnp.broadcast_shapes(jnp.shape(low), jnp.shape(high)))
        self.support = constraints.interval(low, high)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return self.low + (self.high - self.low) * jax.random.uniform(key, shape)

    def log_prob(self, value):
        inb = (value >= self.low) & (value <= self.high)
        return jnp.where(inb, -jnp.log(self.high - self.low) * jnp.ones_like(jnp.asarray(value, dtype=jnp.result_type(float))), -jnp.inf)

    def cdf(self, value):
        return jnp.clip((value - self.low) / (self.high - self.low), 0.0, 1.0)

    def icdf(self, q):
        return self.low + q * (self.high - self.low)


class Gamma(Distribution):
    support = constraints.positive
    arg_constraints = {"concentration": (lambda v: v > 0, "positive"), "rate": (lambda v: v > 0, "positive")}

    def __init__(self, concentration, rate=1.0):
        self.concentration, self.rate = concentration, rate
        super().__init__(jnp.broadcast_shapes(jnp.shape(concentration), jnp.shape(rate)))

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.gamma(key, self.concentration, shape) / self.rate

    def log_prob(self, value):
        a, b = self.concentration, self.rate
        safe = jnp.where(value > 0, value, 1.0)
        lp = xlogy(a - 1.0, safe) - b * safe + a * jnp.log(b) - gammaln(a)
        return jnp.where(value > 0, lp, -jnp.inf)


class Exponential(Distribution):
    support = constraints.positive
    arg_constraints = {"rate": (lambda v: v > 0, "positive")}

    def __init__(self, rate=1.0):
        self.rate = rate
        super().__init__(jnp.shape(rate))

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.exponential(key, shape) / self.rate

    def log_prob(self, value):
        lp = jnp.log(self.rate) - self.rate * value
        return jnp.where(value >= 0, lp, -jnp.inf)


class Beta(Distribution):
    support = constraints.unit_interval
    arg_constraints = {"concentration1": (lambda v: v > 0, "positive"), "concentration0": (lambda v: v > 0, "positive")}

    def __init__(self, concentration1, concentration0):
        self.concentration1, self.concentration0 = concentration1, concentration0
        super().__init__(jnp.broadcast_shapes(jnp.shape(concentration1), jnp.shape(concentration0)))

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.beta(key, self.concentration1, self.concentration0, shape)

    def log_prob(self, value):
        a, b = self.concentration1, self.concentration0
        safe = jnp.clip(value, 1e-38, 1.0 - 1e-7)
        lp = xlogy(a - 1.0, safe) + xlogy(b - 1.0, 1.0 - safe) - betaln(a, b)
        return jnp.where((value >= 0) & (value <= 1), lp, -jnp.inf)


class Dirichlet(Distribution):
    support = constraints.simplex
    event_ndim = 1
    arg_constraints = {"concentration": (lambda v: v > 0, "positive")}

    def __init__(self, concentration):
        self.concentration = jnp.asarray(concentration)
        super().__init__(self.concentration.shape[:-1], self.concentration.shape[-1:])

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.dirichlet(key, self.concentration, shape)

    def log_prob(self, value):
        a = self.concentration
        safe = jnp.clip(value, 1e-38)
        norm = jnp.sum(gammaln(a), -1) - gammaln(jnp.sum(a, -1))
        return jnp.sum(xlogy(a - 1.0, safe), -1) - norm


class Categorical(Distribution):
    support = constraints.integer

    def __init__(self, probs=None, logits=None):
        if (probs is None) == (logits is None):
            raise ValueError("provide exactly one of probs / logits")
        if probs is not None:
            probs = jnp.asarray(probs)
            logits = jnp.log(jnp.clip(probs, 1e-38))
        else:
            logits = jnp.asarray(logits)
        self.logits = logits - jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
        super().__init__(self.logits.shape[:-1])

    @property
    def probs(self):
        return jnp.exp(self.logits)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.categorical(key, self.logits, shape=shape)

    def log_prob(self, value):
        value = jnp.asarray(value, dtype=jnp.int32)
        batch = jnp.broadcast_shapes(jnp.shape(value), self.batch_shape)
        logits = jnp.broadcast_to(self.logits, batch + self.logits.shape[-1:])
        value = jnp.broadcast_to(value, batch)
        return jnp.take_along_axis(logits, value[..., None], axis=-1)[..., 0]


class MixtureGeneral(Distribution):
    """Finite mixture with an explicit ``Categorical`` mixing distribution
    and a list of component distributions (the numpyro surface the
    reference's mixture config blocks instantiate:
    ``spec.model(mixing_dist, components)`` in
    gwinferno/pipeline/analysis.py:382-399 / our pipeline/analysis.py
    ``_plan_population_builders``).

    ``log_prob`` is the logsumexp-weighted component density; ``sample``
    draws a component index per draw and gathers.  ``support`` is the first
    component's (components of one config block share a parameter's
    domain).
    """

    def __init__(self, mixing_distribution, component_distributions):
        if not isinstance(mixing_distribution, Categorical):
            raise ValueError("mixing_distribution must be a Categorical")
        if len(component_distributions) != mixing_distribution.logits.shape[-1]:
            raise ValueError(
                f"{len(component_distributions)} components vs "
                f"{mixing_distribution.logits.shape[-1]} mixing weights"
            )
        self.mixing_distribution = mixing_distribution
        self.component_distributions = list(component_distributions)
        batch = jnp.broadcast_shapes(*(tuple(c.batch_shape) for c in self.component_distributions))
        super().__init__(batch)
        self.support = self.component_distributions[0].support

    def log_prob(self, value):
        comp_lp = jnp.stack(
            [c.log_prob(value) for c in self.component_distributions], axis=-1
        )
        logmix = self.mixing_distribution.logits
        return jax.scipy.special.logsumexp(comp_lp + logmix, axis=-1)

    def sample(self, key, sample_shape=()):
        k_idx, k_comp = jax.random.split(key)
        idx = self.mixing_distribution.sample(k_idx, sample_shape)
        draws = jnp.stack(
            [
                c.sample(k, sample_shape + self.batch_shape)
                for c, k in zip(
                    self.component_distributions,
                    jax.random.split(k_comp, len(self.component_distributions)),
                )
            ],
            axis=-1,
        )
        idx = jnp.broadcast_to(idx, draws.shape[:-1])
        return jnp.take_along_axis(draws, idx[..., None], axis=-1)[..., 0]


class TruncatedNormal(Distribution):
    arg_constraints = {
        "scale": (lambda v: v > 0, "positive"),
        "_width": (lambda v: v > 0, "high > low"),
    }

    def __init__(self, loc=0.0, scale=1.0, low=-jnp.inf, high=jnp.inf):
        self.loc, self.scale, self.low, self.high = loc, scale, low, high
        self._width = None if (_concrete(low) is None or _concrete(high) is None) else _concrete(high) - _concrete(low)
        super().__init__(jnp.broadcast_shapes(jnp.shape(loc), jnp.shape(scale), jnp.shape(low), jnp.shape(high)))
        self.support = constraints.interval(low, high)
        self._lcdf = _ndtr((low - loc) / scale)
        self._ucdf = _ndtr((high - loc) / scale)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        u = jax.random.uniform(key, shape)
        q = self._lcdf + u * (self._ucdf - self._lcdf)
        q = jnp.clip(q, 1e-15, 1 - 1e-15)
        return self.loc + self.scale * jnp.sqrt(2.0) * jax.scipy.special.erfinv(2.0 * q - 1.0)

    def log_prob(self, value):
        z = (value - self.loc) / self.scale
        lp = -0.5 * z * z - jnp.log(self.scale) - _LOG_SQRT_2PI - jnp.log(self._ucdf - self._lcdf)
        return jnp.where((value >= self.low) & (value <= self.high), lp, -jnp.inf)


class Delta(Distribution):
    """Point mass (used by AutoDelta guides / MAP)."""

    support = constraints.real

    def __init__(self, value=0.0, event_ndim=0):
        self.value = jnp.asarray(value)
        self.event_ndim = event_ndim
        shape = self.value.shape
        split = len(shape) - event_ndim if event_ndim else len(shape)
        super().__init__(shape[:split], shape[split:])

    def sample(self, key, sample_shape=()):
        return jnp.broadcast_to(self.value, tuple(sample_shape) + self.shape)

    def log_prob(self, value):
        lp = jnp.where(value == self.value, 0.0, -jnp.inf)
        if self.event_ndim:
            lp = jnp.sum(lp, axis=tuple(range(-self.event_ndim, 0)))
        return lp


class ImproperUniform(Distribution):
    """Flat (improper) prior over a given support; log_prob = 0 on support."""

    def __init__(self, support=constraints.real, batch_shape=(), event_shape=()):
        self.support = support
        super().__init__(batch_shape, event_shape)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.shape
        return jax.random.normal(key, shape)  # arbitrary init draw

    def log_prob(self, value):
        lp = jnp.zeros(jnp.shape(value))
        ndim = self.support.event_dims
        if ndim:
            lp = jnp.sum(lp, axis=tuple(range(-ndim, 0)))
        return lp


class Unit(Distribution):
    """Trivial distribution carrying a log_factor (used by ``factor``)."""

    def __init__(self, log_factor):
        self.log_factor = log_factor
        super().__init__()

    def sample(self, key, sample_shape=()):
        return jnp.zeros(tuple(sample_shape))

    def log_prob(self, value):
        return self.log_factor
