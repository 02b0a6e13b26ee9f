"""Elementary population-model pdf kernels, written for XLA/TPU.

Log-space forms are the primary implementations (numerically robust in
float32 on TPU); linear-space wrappers exponentiate them.  All functions are
pure ``jnp`` and safe under ``jit``/``grad``/``vmap``: every piecewise branch
is expressed with ``jnp.where`` over finite-valued operands so gradients stay
finite at the truncation boundaries.

API parity with the reference library ``gwinferno/distributions.py``
(reference lines noted per function).  Known reference defects are *not*
replicated: ``smooth`` implements the intended piecewise window semantics
(the reference's second ``where`` condition at distributions.py:20 is
tautological).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.nn import sigmoid
from jax.scipy.special import betaln
from jax.scipy.special import erf

from .utils.host import xp_for

__all__ = [
    "safe_log",
    "safe_logaddexp",
    "smooth",
    "logistic_function",
    "logistic_unit",
    "log_logistic_unit",
    "powerlaw_logit_pdf",
    "powerlaw_pdf",
    "log_powerlaw_pdf",
    "truncnorm_pdf",
    "log_truncnorm_pdf",
    "betadist",
    "log_betadist",
]


def safe_log(p):
    """``log(p)`` with ``-inf`` at ``p <= 0`` and a ZERO (not NaN) gradient
    there.

    Plain ``jnp.log`` at 0 returns ``-inf`` with derivative ``1/0 = inf``;
    multiplied by the (zero) derivative of an out-of-support density that
    produces ``inf * 0 = NaN`` and poisons the whole gradient.  Standard
    double-``where`` rematerialization; use whenever taking logs of linear
    densities that can be exactly zero (B-spline projections outside their
    knot range, truncated pdfs).
    """
    pos = p > 0
    return jnp.where(pos, jnp.log(jnp.where(pos, p, 1.0)), -jnp.inf)


def safe_logaddexp(a, b):
    """``logaddexp(a, b)`` whose gradient is zero (not NaN) where BOTH inputs
    are ``-inf`` -- mixture components whose supports exclude a sample point.

    Plain ``logaddexp``'s backward pass evaluates ``exp(-inf - (-inf))`` and
    poisons the whole gradient with NaN even though the forward value is
    correctly masked downstream (the f32-on-TPU failure mode that froze every
    chain in round 1's bench).  Standard double-``where`` rematerialization.
    """
    both = (a == -jnp.inf) & (b == -jnp.inf)
    a_safe = jnp.where(both, 0.0, a)
    b_safe = jnp.where(both, 0.0, b)
    return jnp.where(both, -jnp.inf, jnp.logaddexp(a_safe, b_safe))


def smooth(dx, x, xmin):
    """Planck-taper-style low-mass smoothing window.

    0 below ``xmin``; rises smoothly over ``[xmin, xmin + dx)``; 1 above.
    In the window the value is ``sigmoid(-(dx/(x-xmin) + dx/(x-xmin-dx)))``.

    Parity: gwinferno/distributions.py:16-21 (intended semantics; the
    reference's second ``where`` condition is tautological -- SURVEY.md
    S7.3 item 6 -- so we implement the standard gwpopulation window).
    """
    x = jnp.asarray(x)
    below = jnp.less(x, xmin)
    above = jnp.greater_equal(x, xmin + dx)
    in_window = ~below & ~above
    # Evaluate the exponent only at "safe" x to keep grads finite at bounds.
    safe_x = jnp.where(in_window, x, xmin + 0.5 * dx)
    z = dx / (safe_x - xmin) + dx / (safe_x - xmin - dx)
    window = sigmoid(-z)  # == 1 / (exp(z) + 1)
    return jnp.where(below, 0.0, jnp.where(above, 1.0, window))


def logistic_function(x, L, k, x0):
    """Logistic curve ``L / (1 + exp(-k (x - x0)))``.

    Parity: gwinferno/distributions.py:24-37.
    """
    return L * sigmoid(k * (x - x0))


def logistic_unit(x, x0, sgn=1, sc=4):
    """Soft truncation window: logistic of unit height centered at ``x0``.

    ``sgn=1`` truncates on the right, ``sgn=-1`` on the left; ``sc`` sets the
    sharpness.  Parity: gwinferno/distributions.py:40-53.
    """
    return logistic_function(x, 1.0, -1 * sgn * sc, x0)


def log_logistic_unit(x, x0, sgn=1, sc=4):
    """Log of :func:`logistic_unit`, stable deep in the truncated tail.

    Uses ``log sigmoid(t) = t + log sigmoid(-t)`` for ``t < 0`` so the result
    is finite (linear) far past the truncation point instead of ``log(0)``.
    Parity: gwinferno/distributions.py:56-72.
    """
    t = -sgn * sc * (x - x0)
    # log sigmoid(t), computed on the stable side of the identity.
    return jnp.where(
        jnp.less(t, 0),
        t - jnp.log1p(jnp.exp(jnp.where(jnp.less(t, 0), t, -t))),
        -jnp.log1p(jnp.exp(jnp.where(jnp.less(t, 0), 0.0, -t))),
    )


def powerlaw_logit_pdf(xx, alpha, low=None, high=None, low_fall_off=4.0, high_fall_off=4.0):
    """Unnormalized powerlaw ``x**alpha`` with soft (logistic) truncation.

    Parity: gwinferno/distributions.py:75-97.
    """
    prob = jnp.power(xx, alpha)
    if low is not None:
        prob = prob * logistic_unit(xx, low, sgn=-1.0, sc=low_fall_off)
    if high is not None:
        prob = prob * logistic_unit(xx, high, sgn=1.0, sc=high_fall_off)
    return prob


def _powerlaw_log_norm(alpha, low, high):
    """log of the truncated-powerlaw normalization constant.

    Handles the ``alpha == -1`` measure-zero branch with a ``where`` select
    (both branches evaluated on safe operands).

    The span ``|high^(1+a) - low^(1+a)|`` is evaluated in log space via
    ``expm1``: per-sample bounds like ``low = mmin/m1`` approach (or, for
    samples below mmin, cross) ``high``, and the direct difference cancels
    catastrophically in float32 -- ``log(0) = -inf`` here turns into
    ``exp(+inf)`` in the pdf and NaN gradients on TPU.  A dtype-eps clamp
    keeps the norm finite for exactly-degenerate supports (such samples are
    out-of-bounds and masked by the pdf's ``where``, but their *gradient*
    path must stay finite)."""
    alpha = jnp.asarray(alpha, dtype=jnp.result_type(float))
    is_m1 = jnp.equal(alpha, -1.0)
    safe_alpha = jnp.where(is_m1, 0.0, alpha)
    ap1 = 1.0 + safe_alpha
    xp = xp_for(low, high)  # host-side for data-derived bounds (utils.host)
    log_low = xp.log(low)
    log_high = xp.log(high)
    a = ap1 * log_high
    b = ap1 * log_low
    diff = jnp.abs(a - b)
    eps = jnp.finfo(jnp.result_type(diff.dtype, jnp.float32)).eps
    # |e^a - e^b| = e^max(a,b) * (1 - e^-|a-b|)
    log_span = jnp.maximum(a, b) + jnp.log(-jnp.expm1(-jnp.maximum(diff, eps)))
    generic = jnp.log(jnp.abs(ap1)) - log_span
    # alpha == -1: 1/|log(high/low)|, clamped away from the degenerate zero
    special = -jnp.log(jnp.maximum(jnp.abs(log_high - log_low), eps))
    return jnp.where(is_m1, special, generic)


def log_powerlaw_pdf(xx, alpha, low, high, floor=-jnp.inf):
    """Log-pdf of the sharply truncated powerlaw on ``[low, high]``.

    ``alpha == -1`` uses the logarithmic normalization.  Out-of-bounds values
    get ``floor`` (default ``-inf``).  The in-bounds log is evaluated at a
    clipped abscissa so gradients stay finite outside the support.

    Data-only subexpressions (bounds checks, ``log x``) dispatch through
    ``xp_for``: with host-numpy sample banks they are computed ONCE on the
    host at trace time and embed as ready constants, instead of running as
    eager device ops per trace and re-running inside every compiled gradient
    (utils.host; the round-2 cold-compile post-mortem).
    """
    xp = xp_for(xx, low, high)
    oob = xp.less(xx, low) | xp.greater(xx, high)
    log_safe_x = xp.log(xp.clip(xx, low, high))
    logp = alpha * log_safe_x + _powerlaw_log_norm(alpha, low, high)
    return jnp.where(oob, floor, logp)


def powerlaw_pdf(xx, alpha, low, high, floor=0.0):
    """pdf of the sharply truncated powerlaw (normalized on ``[low, high]``).

    Parity: gwinferno/distributions.py:100-119 (incl. the ``alpha == -1``
    special case at :112-116).
    """
    xp = xp_for(xx, low, high)
    oob = xp.less(xx, low) | xp.greater(xx, high)
    log_safe_x = xp.log(xp.where(oob, low, xx))
    prob = jnp.exp(alpha * log_safe_x + _powerlaw_log_norm(alpha, low, high))
    return jnp.where(oob, floor, prob)


def _norm_cdf(z):
    return 0.5 * (1.0 + erf(z / jnp.sqrt(2.0)))


def log_truncnorm_pdf(xx, mu, sig, low, high, log=False):
    """Log-pdf of a truncated (log-)normal on ``[low, high]``.

    ``log=True`` evaluates a truncated *lognormal* (the Gaussian lives in
    ``log x``; the extra ``1/x`` Jacobian is included).  ``-inf`` outside.
    """
    xp = xp_for(xx, low, high)  # data-only terms host-side (utils.host)
    if log:
        u = xp.log(xp.clip(xx, low, high))
        xpb = xp_for(low, high)
        lo, hi = xpb.log(low), xpb.log(high)
        jac = -u  # d(log x)/dx = 1/x
    else:
        u = xp.clip(xx, low, high)
        lo, hi = low, high
        jac = 0.0
    denom = _norm_cdf((hi - mu) / sig) - _norm_cdf((lo - mu) / sig)
    logp = (
        -0.5 * ((u - mu) / sig) ** 2
        - jnp.log(sig)
        - 0.5 * jnp.log(2.0 * jnp.pi)
        - jnp.log(denom)
        + jac
    )
    oob = xp.greater(xx, high) | xp.less(xx, low)
    return jnp.where(oob, -jnp.inf, logp)


def truncnorm_pdf(xx, mu, sig, low, high, log=False):
    """pdf of a truncated normal (``log=True`` -> truncated lognormal).

    Parity: gwinferno/distributions.py:122-143.
    """
    xp = xp_for(xx, low, high)
    if log:
        safe_x = xp.where(xp.less_equal(xx, 0.0), low, xx)
    else:
        safe_x = xx
    oob = xp.greater(xx, high) | xp.less(xx, low)
    return jnp.where(oob, 0.0, jnp.exp(log_truncnorm_pdf(safe_x, mu, sig, low, high, log=log)))


def log_betadist(xx, alpha, beta, scale=1.0, floor=-jnp.inf):
    """Log-pdf of a Beta distribution stretched onto ``[0, scale]``."""
    xp = xp_for(xx, scale)  # data-only terms host-side (utils.host)
    inb = xp.less_equal(xx, scale) & xp.greater_equal(xx, 0.0)
    safe_x = xp.clip(xx, 0.0, scale)
    # the clipped-log endpoints are +-inf at exactly 0/scale; in-bounds
    # samples never sit exactly on them, and oob lanes are floored below
    ln = (
        (alpha - 1.0) * xp.log(safe_x)
        + (beta - 1.0) * xp.log(scale - safe_x)
        - (alpha + beta - 1.0) * xp.log(scale)
        - betaln(alpha, beta)
    )
    return jnp.where(inb, ln, floor)


def betadist(xx, alpha, beta, scale=1.0, floor=0.0):
    """pdf of a Beta distribution on ``[0, scale]``.

    Parity: gwinferno/distributions.py:146-162.
    """
    xp = xp_for(xx, scale)
    inb = xp.less_equal(xx, scale) & xp.greater_equal(xx, 0.0)
    return jnp.where(inb, jnp.exp(log_betadist(xx, alpha, beta, scale=scale)), floor)
