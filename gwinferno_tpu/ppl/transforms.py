"""Bijective transforms between constrained supports and unconstrained space.

Each transform maps unconstrained -> constrained via ``__call__`` and exposes
``inv`` and ``log_abs_det_jacobian(x_unconstrained, y_constrained)`` (the log
Jacobian of the forward map, summed over event dimensions).  These are the
building blocks of the reparameterized (unconstrained) posterior geometry the
samplers operate in.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.nn import log_sigmoid
from jax.nn import sigmoid
from jax.nn import softplus

__all__ = [
    "Transform",
    "IdentityTransform",
    "ExpTransform",
    "SigmoidTransform",
    "AffineTransform",
    "IntervalTransform",
    "OrderedTransform",
    "StickBreakingTransform",
    "ComposeTransform",
]


class Transform:
    """Base transform; `event_dims_delta` is how many trailing dims the
    forward map consumes (e.g. stick-breaking maps (n-1,) -> (n,))."""

    event_dims = 0  # event ndim of the *constrained* output

    def __call__(self, x):
        raise NotImplementedError

    def inv(self, y):
        raise NotImplementedError

    def log_abs_det_jacobian(self, x, y):
        raise NotImplementedError

    def unconstrained_shape(self, constrained_shape):
        return constrained_shape


class IdentityTransform(Transform):
    def __call__(self, x):
        return x

    def inv(self, y):
        return y

    def log_abs_det_jacobian(self, x, y):
        return jnp.zeros(jnp.shape(x))


class ExpTransform(Transform):
    """unconstrained R -> (0, inf) via exp."""

    def __call__(self, x):
        return jnp.exp(x)

    def inv(self, y):
        return jnp.log(y)

    def log_abs_det_jacobian(self, x, y):
        return x


class SigmoidTransform(Transform):
    """R -> (0, 1) via the logistic function."""

    def __call__(self, x):
        return sigmoid(x)

    def inv(self, y):
        return jnp.log(y) - jnp.log1p(-y)

    def log_abs_det_jacobian(self, x, y):
        return log_sigmoid(x) + log_sigmoid(-x)


class AffineTransform(Transform):
    def __init__(self, loc, scale):
        self.loc, self.scale = loc, scale

    def __call__(self, x):
        return self.loc + self.scale * x

    def inv(self, y):
        return (y - self.loc) / self.scale

    def log_abs_det_jacobian(self, x, y):
        return jnp.broadcast_to(jnp.log(jnp.abs(self.scale)), jnp.shape(x))


class IntervalTransform(Transform):
    """R -> (low, high) via a scaled sigmoid."""

    def __init__(self, low, high):
        self.low, self.high = low, high

    def __call__(self, x):
        return self.low + (self.high - self.low) * sigmoid(x)

    def inv(self, y):
        u = (y - self.low) / (self.high - self.low)
        u = jnp.clip(u, 1e-15, 1.0 - 1e-15)
        return jnp.log(u) - jnp.log1p(-u)

    def log_abs_det_jacobian(self, x, y):
        return jnp.broadcast_to(jnp.log(self.high - self.low), jnp.shape(x)) + log_sigmoid(x) + log_sigmoid(-x)


class OrderedTransform(Transform):
    """R^n -> ordered vectors: first element free, increments via exp."""

    event_dims = 1

    def __call__(self, x):
        first = x[..., :1]
        rest = jnp.exp(x[..., 1:])
        return jnp.cumsum(jnp.concatenate([first, rest], axis=-1), axis=-1)

    def inv(self, y):
        first = y[..., :1]
        rest = jnp.log(jnp.diff(y, axis=-1))
        return jnp.concatenate([first, rest], axis=-1)

    def log_abs_det_jacobian(self, x, y):
        return jnp.sum(x[..., 1:], axis=-1)


class StickBreakingTransform(Transform):
    """R^(n-1) -> open simplex in R^n (numpyro-style stick breaking)."""

    event_dims = 1

    def __call__(self, x):
        n = x.shape[-1] + 1
        offsets = jnp.log(jnp.arange(n - 1, 0, -1, dtype=x.dtype))
        z = sigmoid(x - offsets)
        remainder = jnp.cumprod(1.0 - z, axis=-1)
        pad = jnp.ones(x.shape[:-1] + (1,), dtype=x.dtype)
        probs = jnp.concatenate([z, pad], axis=-1) * jnp.concatenate([pad, remainder], axis=-1)
        return probs

    def inv(self, y):
        n = y.shape[-1]
        rev_cum = jnp.flip(jnp.cumsum(jnp.flip(y, -1), -1), -1)
        z = jnp.clip(y[..., :-1] / jnp.clip(rev_cum[..., :-1], 1e-30), 1e-15, 1 - 1e-15)
        offsets = jnp.log(jnp.arange(n - 1, 0, -1, dtype=y.dtype))
        return jnp.log(z) - jnp.log1p(-z) + offsets

    def log_abs_det_jacobian(self, x, y):
        # y_i = z_i * r_i with r_i the remaining stick and z_i = sigmoid(t_i):
        # the Jacobian is triangular, so |det| = prod_i r_i z_i (1 - z_i)
        #                                      = prod_i y_i (1 - z_i).
        n = x.shape[-1] + 1
        offsets = jnp.log(jnp.arange(n - 1, 0, -1, dtype=x.dtype))
        t = x - offsets
        return jnp.sum(jnp.log(jnp.clip(y[..., :-1], 1e-300)) + log_sigmoid(-t), axis=-1)

    def unconstrained_shape(self, constrained_shape):
        return constrained_shape[:-1] + (constrained_shape[-1] - 1,)


class SoftplusTransform(Transform):
    """R -> (0, inf) via softplus (gentler tails than exp)."""

    def __call__(self, x):
        return softplus(x)

    def inv(self, y):
        return y + jnp.log(-jnp.expm1(-y))

    def log_abs_det_jacobian(self, x, y):
        return log_sigmoid(x)


class ComposeTransform(Transform):
    def __init__(self, parts):
        self.parts = list(parts)
        self.event_dims = max((p.event_dims for p in self.parts), default=0)

    def __call__(self, x):
        for p in self.parts:
            x = p(x)
        return x

    def inv(self, y):
        for p in reversed(self.parts):
            y = p.inv(y)
        return y

    def log_abs_det_jacobian(self, x, y):
        result = 0.0
        for p in self.parts:
            y_mid = p(x)
            lad = p.log_abs_det_jacobian(x, y_mid)
            # reduce any extra event dims to the composite's event ndim
            result = result + lad
            x = y_mid
        return result

    def unconstrained_shape(self, constrained_shape):
        for p in reversed(self.parts):
            constrained_shape = p.unconstrained_shape(constrained_shape)
        return constrained_shape
