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

from contextlib import contextmanager as _contextmanager

import jax
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
    # |e^a - e^b| = e^max(a,b) * (1 - e^-|a-b|).  The (1 - e^-d) factor is
    # -expm1(-d), written as a where-guarded series for small d: expm1 is
    # not lowerable inside Pallas TPU kernels (ops/streamed.py runs this
    # chain in-kernel), and the 3-term series matches expm1 to < 1e-8
    # relative below the 1e-2 switch point, well under f32 roundoff.
    d = jnp.maximum(diff, eps)
    if _PALLAS_SAFE[0]:
        # Mosaic cannot lower expm1; a 3-term series below the 1e-2 switch
        # matches it to < 1e-8 relative (well under f32 roundoff)
        d_big = jnp.maximum(d, 1e-2)
        neg_expm1_neg = jnp.where(
            d < 1e-2, d * (1.0 - 0.5 * d * (1.0 - d / 3.0)), 1.0 - jnp.exp(-d_big)
        )
    else:
        neg_expm1_neg = -jnp.expm1(-d)
    log_span = jnp.maximum(a, b) + jnp.log(neg_expm1_neg)
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


# --- Cody rational erf (netlib CALERF) ------------------------------------
# Pallas TPU kernels cannot lower the erf primitive (ops/streamed.py runs
# the truncnorm chain in-kernel), so the error function is evaluated with
# W. J. Cody's rational Chebyshev approximations (exp/where/polynomials
# only; max relative error ~1e-16 in f64 -- the same scheme XLA's own erf
# lowering uses).  The derivative is exact via custom_jvp.
_ERF_A = (3.16112374387056560e00, 1.13864154151050156e02, 3.77485237685302021e02,
          3.20937758913846947e03, 1.85777706184603153e-1)
_ERF_B = (2.36012909523441209e01, 2.44024637934444173e02, 1.28261652607737228e03,
          2.84423683343917062e03)
_ERF_C = (5.64188496988670089e-1, 8.88314979438837594e00, 6.61191906371416295e01,
          2.98635138197400131e02, 8.81952221241769090e02, 1.71204761263407058e03,
          2.05107837782607147e03, 1.23033935479799725e03, 2.15311535474403846e-8)
_ERF_D = (1.57449261107098347e01, 1.17693950891312499e02, 5.37181101862009858e02,
          1.62138957456669019e03, 3.29079923573345963e03, 4.36261909014324716e03,
          3.43936767414372164e03, 1.23033935480374942e03)
_ERF_P = (3.05326634961232344e-1, 3.60344899949804439e-1, 1.25781726111229246e-1,
          1.60837851487422766e-2, 6.58749161529837803e-4, 1.63153871373020978e-2)
_ERF_Q = (2.56852019228982242e00, 1.87295284992346047e00, 5.27905102951428412e-1,
          6.05183413124413191e-2, 2.33520497626869185e-3)
_SQRPI = 5.6418958354775628695e-1  # 1/sqrt(pi)


def _erfc_scaled_tail(y, num, den):
    """exp(-y^2) * num/den with Cody's split-square trick (the square is
    evaluated as a 1/16-quantized part plus a small remainder so the
    exponential keeps full precision at large y)."""
    ysq = jnp.floor(y * 16.0) / 16.0
    del_ = (y - ysq) * (y + ysq)
    return jnp.exp(-ysq * ysq) * jnp.exp(-del_) * num / den


@jax.custom_jvp
def _erf_cody(x):
    x = jnp.asarray(x)
    y = jnp.abs(x)
    A, B, C, D, P, Q = _ERF_A, _ERF_B, _ERF_C, _ERF_D, _ERF_P, _ERF_Q

    # |x| <= 0.46875: erf(x) = x R(x^2)
    z1 = jnp.square(jnp.minimum(y, 0.46875))
    num1 = (((A[4] * z1 + A[0]) * z1 + A[1]) * z1 + A[2]) * z1 + A[3]
    den1 = (((z1 + B[0]) * z1 + B[1]) * z1 + B[2]) * z1 + B[3]
    r1 = x * num1 / den1

    # 0.46875 < |x| <= 4: erfc(y) = exp(-y^2) R(y)
    y2 = jnp.clip(y, 0.46875, 4.0)
    num2 = C[8] * y2
    den2 = y2
    for i in range(7):
        num2 = (num2 + C[i]) * y2
        den2 = (den2 + D[i]) * y2
    erfc2 = _erfc_scaled_tail(y2, num2 + C[7], den2 + D[7])

    # |x| > 4: erfc(y) = exp(-y^2)/y (1/sqrt(pi) - z R(z)), z = 1/y^2
    y3 = jnp.maximum(y, 4.0)
    z3 = 1.0 / (y3 * y3)
    num3 = P[5] * z3
    den3 = z3
    for i in range(4):
        num3 = (num3 + P[i]) * z3
        den3 = (den3 + Q[i]) * z3
    r3 = z3 * (num3 + P[4]) / (den3 + Q[4])
    erfc3 = _erfc_scaled_tail(y3, _SQRPI - r3, y3)

    erfc_abs = jnp.where(y <= 4.0, erfc2, erfc3)
    return jnp.where(y <= 0.46875, r1, jnp.sign(x) * (1.0 - erfc_abs))


@_erf_cody.defjvp
def _erf_cody_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    return _erf_cody(x), 2.0 * _SQRPI * jnp.exp(-jnp.square(x)) * dx


# XLA's native erf/lgamma primitives are faster than the rational forms
# below (the likelihood chain is VPU-compute-bound: always-on Cody erf cost
# a measured 23% of bench wall), but Mosaic cannot lower them inside Pallas
# kernels.  This trace-time flag -- set by ops/streamed.py around kernel-
# body tracing -- routes the special functions to the kernel-safe forms
# only where they are needed.
_PALLAS_SAFE = [False]


@_contextmanager
def pallas_safe_special_fns():
    """Within this context (kernel-body tracing), erf/betaln evaluate via
    the Mosaic-lowerable Cody/Lanczos rational forms."""
    _PALLAS_SAFE[0] = True
    try:
        yield
    finally:
        _PALLAS_SAFE[0] = False


def _erf(x):
    return _erf_cody(x) if _PALLAS_SAFE[0] else erf(x)


def _norm_cdf(z):
    return 0.5 * (1.0 + _erf(z / jnp.sqrt(2.0)))


# --- Lanczos log-gamma -----------------------------------------------------
# Same motivation as _erf_cody: the lgamma primitive (inside betaln) is not
# lowerable in Pallas TPU kernels.  Lanczos g=7/n=9 gives ~1e-13 relative
# accuracy for z > 0.5; smaller arguments use the recurrence
# lgamma(z) = lgamma(z + 1) - log(z) (beta shape parameters here are
# always > 0).
_LANCZOS_G = 7.0
_LANCZOS_C = (0.99999999999980993, 676.5203681218851, -1259.1392167224028,
              771.32342877765313, -176.61502916214059, 12.507343278686905,
              -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
_HALF_LOG_2PI = 0.9189385332046727417803297  # log(2 pi) / 2


def _lgamma_lanczos(z):
    z = jnp.asarray(z)
    small = z < 0.5
    zz = jnp.where(small, z + 1.0, z)  # recurrence shift for (0, 0.5)
    x = jnp.full_like(zz, _LANCZOS_C[0])
    for i, c in enumerate(_LANCZOS_C[1:], start=1):
        x = x + c / (zz - 1.0 + i)
    t = zz + _LANCZOS_G - 0.5
    lg = _HALF_LOG_2PI + (zz - 0.5) * jnp.log(t) - t + jnp.log(x)
    return jnp.where(small, lg - jnp.log(jnp.maximum(z, jnp.finfo(lg.dtype).tiny)), lg)


def _betaln(a, b):
    if not _PALLAS_SAFE[0]:
        return betaln(a, b)
    return _lgamma_lanczos(a) + _lgamma_lanczos(b) - _lgamma_lanczos(a + b)


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
        - _betaln(alpha, beta)
    )
    return jnp.where(inb, ln, floor)


def betadist(xx, alpha, beta, scale=1.0, floor=0.0):
    """pdf of a Beta distribution on ``[0, scale]``.

    Parity: gwinferno/distributions.py:146-162.
    """
    xp = xp_for(xx, scale)
    inb = xp.less_equal(xx, scale) & xp.greater_equal(xx, 0.0)
    return jnp.where(inb, jnp.exp(log_betadist(xx, alpha, beta, scale=scale)), floor)
