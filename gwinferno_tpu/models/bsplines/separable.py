"""Separable 2-D population models built from 1-D B-splines.

Products of independently-(or IID-)distributed 1-D spline models over pairs
of parameters, plus parametric-x-spline hybrids.  All design matrices are
cached at construction; the hot path is dense coefficient projection.

Parity: gwinferno/models/bsplines/separable.py (class-for-class, same
constructor and ``__call__`` signatures).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...distributions import powerlaw_pdf
from ..parametric.parametric import plpeak_primary_pdf
from .single import BSplineChiEffective
from .single import BSplineChiPrecess
from .single import BSplineMass
from .single import BSplineRatio
from .single import BSplineSpinMagnitude
from .single import BSplineSpinTilt

__all__ = [
    "BSplineIIDSpinMagnitudes",
    "BSplineIndependentSpinMagnitudes",
    "BSplineIIDSpinTilts",
    "BSplineIndependentSpinTilts",
    "BSplinePrimaryPowerlawRatio",
    "PLPeakPrimaryBSplineRatio",
    "BSplinePrimaryBSplineRatio",
    "BSplineIIDComponentMasses",
    "BSplineIndependentComponentMasses",
    "BSplineEffectiveSpinDims",
]


class _IIDPair:
    """IID product of one 1-D model class over a parameter pair (shared coefs)."""

    _model_cls = None
    _arg_names = ("xx", "xx_inj")

    def __init__(self, n_splines, x1, x2, x1_inj, x2_inj, **kwargs):
        self.primary_model = self._make(n_splines, x1, x1_inj, **kwargs)
        self.secondary_model = self._make(n_splines, x2, x2_inj, **kwargs)

    def _make(self, n, x, x_inj, **kwargs):
        return self._model_cls(n, x, x_inj, **kwargs)

    def __call__(self, coefs, pe_samples=True):
        return self.primary_model(coefs, pe_samples=pe_samples) * self.secondary_model(coefs, pe_samples=pe_samples)


class _IndependentPair:
    """Independent product: separate spline dofs/coefs per component."""

    _model_cls = None

    def __init__(self, n_splines1, n_splines2, x1, x2, x1_inj, x2_inj, kwargs1={}, kwargs2={}, **kwargs):
        self.primary_model = self._model_cls(n_splines1, x1, x1_inj, **kwargs1, **kwargs)
        self.secondary_model = self._model_cls(n_splines2, x2, x2_inj, **kwargs2, **kwargs)

    def __call__(self, pcoefs, scoefs, pe_samples=True):
        return self.primary_model(pcoefs, pe_samples=pe_samples) * self.secondary_model(scoefs, pe_samples=pe_samples)


class BSplineIIDSpinMagnitudes(_IIDPair):
    """p(a1, a2 | c) = p(a1 | c) p(a2 | c)  (separable.py:17-80)."""

    _model_cls = BSplineSpinMagnitude


class BSplineIndependentSpinMagnitudes(_IndependentPair):
    """p(a1, a2 | c1, c2) = p(a1 | c1) p(a2 | c2)  (separable.py:82-154)."""

    _model_cls = BSplineSpinMagnitude


class BSplineIIDSpinTilts(_IIDPair):
    """p(ct1, ct2 | c) = p(ct1 | c) p(ct2 | c)  (separable.py:156-219)."""

    _model_cls = BSplineSpinTilt


class BSplineIndependentSpinTilts(_IndependentPair):
    """p(ct1, ct2 | c1, c2) = p(ct1 | c1) p(ct2 | c2)  (separable.py:221-293)."""

    _model_cls = BSplineSpinTilt


class BSplinePrimaryPowerlawRatio:
    """B-spline primary mass x powerlaw mass ratio (separable.py:295-368)."""

    def __init__(self, n_splines, m1, m1_inj, mmin=2, mmax=100, **kwargs):
        self.primary_model = BSplineMass(n_splines, m1, m1_inj, mmin=mmin, mmax=mmax, **kwargs)

    def __call__(self, m1, q, beta, mmin, coefs, pe_samples=True):
        p_m1 = self.primary_model(coefs, pe_samples=pe_samples)
        p_q = powerlaw_pdf(q, beta, mmin / m1, 1.0)
        return p_m1 * p_q


class PLPeakPrimaryBSplineRatio:
    """Powerlaw+peak primary mass x B-spline mass ratio (separable.py:368-446)."""

    def __init__(self, n_splines, q, q_inj, **kwargs):
        self.ratio_model = BSplineRatio(n_splines, q, q_inj, **kwargs)

    def __call__(self, m1, alpha, mmin, mmax, peak_mean, peak_sd, peak_frac, coefs, pe_samples=True):
        p_q = self.ratio_model(coefs, pe_samples=pe_samples)
        p_m1 = plpeak_primary_pdf(m1, alpha, mmin, mmax, peak_mean, peak_sd, peak_frac)
        return p_m1 * p_q


class BSplinePrimaryBSplineRatio:
    """B-spline primary mass x B-spline mass ratio -- the pipeline's default
    mass model (separable.py:446-531; pipeline/utils.py:104-118)."""

    def __init__(
        self,
        n_splines_m,
        n_splines_q,
        m1,
        m1_inj,
        q,
        q_inj,
        mmax=100.0,
        m1min=3.0,
        m2min=3.0,
        kwargs_m={},
        kwargs_q={},
        **kwargs,
    ):
        self.primary_model = BSplineMass(n_splines_m, m1, m1_inj, mmin=m1min, mmax=mmax, **kwargs_m, **kwargs)
        self.ratio_model = BSplineRatio(n_splines_q, q, q_inj, qmin=m2min / mmax, **kwargs_q, **kwargs)

    def __call__(self, mcoefs, qcoefs, pe_samples=True):
        return self.ratio_model(qcoefs, pe_samples=pe_samples) * self.primary_model(mcoefs, pe_samples=pe_samples)


class BSplineIIDComponentMasses:
    """IID component-mass splines with optional powerlaw pairing
    ``(m2/m1)^beta`` (separable.py:533-614)."""

    def __init__(self, n_splines, m1, m2, m1_inj, m2_inj, mmin=2, mmax=100, **kwargs):
        self.primary_model = BSplineMass(n_splines, m1, m1_inj, mmin=mmin, mmax=mmax, **kwargs)
        self.secondary_model = BSplineMass(n_splines, m2, m2_inj, mmin=mmin, mmax=mmax, **kwargs)
        self.qs = [m2_inj / m1_inj, m2 / m1]

    def __call__(self, coefs, beta=0, pe_samples=True):
        p_m1 = self.primary_model(coefs, pe_samples=pe_samples)
        p_m2 = self.secondary_model(coefs, pe_samples=pe_samples)
        dim = 1 if pe_samples else 0
        return jnp.where(
            jnp.less(self.qs[dim], 0) | jnp.greater(self.qs[dim], 1),
            0.0,
            p_m1 * p_m2,
        ) * jnp.power(self.qs[dim], beta)


class BSplineIndependentComponentMasses:
    """Independent component-mass splines with optional powerlaw pairing
    (separable.py:616-704)."""

    def __init__(
        self,
        n_splines1,
        n_splines2,
        m1,
        m2,
        m1_inj,
        m2_inj,
        mmin1=2,
        mmax1=100,
        mmin2=2,
        mmax2=100,
        kwargs1={},
        kwargs2={},
        **kwargs,
    ):
        self.primary_model = BSplineMass(n_splines1, m1, m1_inj, mmin=mmin1, mmax=mmax1, **kwargs1, **kwargs)
        self.secondary_model = BSplineMass(n_splines2, m2, m2_inj, mmin=mmin2, mmax=mmax2, **kwargs2, **kwargs)
        self.qs = [m2_inj / m1_inj, m2 / m1]

    def __call__(self, pcoefs, scoefs, beta=0, pe_samples=True):
        p_m1 = self.primary_model(pcoefs, pe_samples=pe_samples)
        p_m2 = self.secondary_model(scoefs, pe_samples=pe_samples)
        dim = 1 if pe_samples else 0
        return p_m1 * p_m2 * self.qs[dim] ** beta


class BSplineEffectiveSpinDims:
    """chi_eff x chi_p B-spline product (separable.py:706-778)."""

    def __init__(self, n_splines_e, n_splines_p, chieff, chip, chieff_inj, chip_inj, kwargs_e={}, kwargs_p={}, **kwargs):
        self.chi_eff_model = BSplineChiEffective(n_splines_e, chieff, chieff_inj, **kwargs_e, **kwargs)
        self.chi_p_model = BSplineChiPrecess(n_splines_p, chip, chip_inj, **kwargs_p, **kwargs)

    def __call__(self, ecoefs, pcoefs, pe_samples=True):
        return self.chi_eff_model(ecoefs, pe_samples=pe_samples) * self.chi_p_model(pcoefs, pe_samples=pe_samples)
