"""Parametric-backbone x exp(B-spline-perturbation) population models.

A parametric base distribution multiplied by the exponential of a B-spline
perturbation, normalized on a fixed grid.  Design matrices (sample banks and
normalization grids) are cached at construction.

Parity: gwinferno/models/spline_perturbation.py (incl. the custom clamped
log-knot layouts at :47-56).  The reference's ``PowerlawBasisSplinePrimaryRatio``
has an undefined-attribute defect (``self.qknots``, :220 -- SURVEY.md S7.3
item 5); the intended semantics are implemented here.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.scipy.integrate import trapezoid

from ..distributions import powerlaw_pdf
from ..interpolation import BSpline
from ..interpolation import LogXBSpline
from .parametric.parametric import PowerlawRedshiftModel

__all__ = [
    "PowerlawBasisSplinePrimaryPowerlawRatio",
    "PowerlawBasisSplinePrimaryRatio",
    "PowerlawSplineRedshiftModel",
]


def _clamped_knot_layout(lo, hi, n_df, k):
    """Interior knots on [lo, hi] with (k-1) exterior knots stacked at uniform
    spacing on each side (parity: spline_perturbation.py:47-56)."""
    interior = np.linspace(lo, hi, n_df - k + 2)
    dx = interior[1] - interior[0]
    knots = np.concatenate([
        lo - dx * np.arange(1, k)[::-1],
        interior,
        hi + dx * np.arange(1, k),
    ])
    return knots, interior


class PowerlawBasisSplinePrimaryPowerlawRatio:
    """Powerlaw m1 x exp(spline perturbation), powerlaw q.

    Parity: spline_perturbation.py:15-150.  NOTE the reference's sign
    convention: the powerlaw is evaluated with ``alpha = -alpha``.
    """

    def __init__(self, n_splines_m, m1pe, m1inj, mmin=3.0, m2min=3.0, mmax=100.0, k=4, basis=BSpline, **kwargs):
        self.m2min = m2min
        self.n_splines_m = self.n_splines = n_splines_m
        self.mmin, self.mmax = mmin, mmax
        self.ms = np.linspace(mmin, mmax, 1000)
        knots, interior = _clamped_knot_layout(np.log(mmin), np.log(mmax), n_splines_m, k)
        self.knots = knots
        self.interpolator = basis(
            n_splines_m, knots=knots, interior_knots=interior, xrange=(np.log(mmin), np.log(mmax)), k=k, **kwargs
        )
        self.pe_design_matrix = self.interpolator.bases(jnp.log(m1pe))
        self.inj_design_matrix = self.interpolator.bases(jnp.log(m1inj))
        self.dmats = [self.inj_design_matrix, self.pe_design_matrix]
        self.norm_design_matrix = self.interpolator.bases(jnp.log(self.ms))

    def smoothing(self, ms, mmin, delta_m):
        """Low-mass Planck-taper window (spline_perturbation.py:63-85)."""
        sm = ms - mmin
        in_window = jnp.greater(sm, 0) & jnp.less(sm, delta_m)
        safe_sm = jnp.where(in_window, sm, 0.5 * delta_m)
        window = jnp.where(in_window, 1.0 / (jnp.exp(delta_m / safe_sm + delta_m / (safe_sm - delta_m)) + 1.0), 1.0)
        return jnp.where(jnp.less_equal(ms, mmin), 0.0, window)

    def norm_p_m1(self, alpha, mmin, mmax, cs):
        p_m = powerlaw_pdf(self.ms, alpha=-alpha, low=mmin, high=mmax)
        perturbation = jnp.exp(self.interpolator.project(self.norm_design_matrix, cs))
        return trapezoid(y=p_m * perturbation, x=self.ms)

    def p_m1(self, m1, alpha, mmin, mmax, cs):
        p_m = powerlaw_pdf(m1, alpha=-alpha, low=mmin, high=mmax)
        perturbation = jnp.exp(self.interpolator.project(self.dmats[m1.ndim - 1], cs))
        return p_m * perturbation / self.norm_p_m1(alpha=alpha, mmin=mmin, mmax=mmax, cs=cs)

    def p_q(self, q, m1, beta):
        return powerlaw_pdf(q, alpha=beta, low=self.m2min / m1, high=1)

    def __call__(self, m1, q, **kwargs):
        beta = kwargs.pop("beta")
        p_m1 = self.p_m1(m1, **kwargs)
        p_q = self.p_q(q, m1, beta=beta)
        return p_m1 * p_q


class PowerlawBasisSplinePrimaryRatio:
    """Powerlaw x spline perturbation in BOTH m1 and q, jointly normalized on
    a 2-D grid (parity: spline_perturbation.py:153-301, defect fixed)."""

    def __init__(self, n_splines_m, n_splines_q, m1pe, qpe, m1inj, qinj, mmin=2.0, mmax=100.0, k=4):
        self.n_splines_m, self.n_splines_q = n_splines_m, n_splines_q
        self.mmin, self.mmax = mmin, mmax
        self.ms = np.linspace(mmin, mmax, 1000)
        self.qs = np.linspace(mmin / mmax, 1, 500)
        self.mm, self.qq = np.meshgrid(self.ms, self.qs)

        knotsm, interior_m = _clamped_knot_layout(np.log(mmin), np.log(mmax), n_splines_m, k)
        self.knotsm = knotsm
        knotsq, interior_q = _clamped_knot_layout(0.0, 1.0, n_splines_q, k)
        self.knotsq = self.qknots = knotsq

        self.interpolator = BSpline(
            n_splines_m, knots=knotsm, interior_knots=interior_m, xrange=(np.log(mmin), np.log(mmax)), k=k
        )
        self.pe_design_matrix = self.interpolator.bases(jnp.log(m1pe))
        self.inj_design_matrix = self.interpolator.bases(jnp.log(m1inj))
        self.dmats = [self.inj_design_matrix, self.pe_design_matrix]
        self.qinterpolator = BSpline(n_splines_q, knots=knotsq, interior_knots=interior_q, xrange=(0, 1), k=k)
        self.qpe_design_matrix = self.qinterpolator.bases(qpe)
        self.qinj_design_matrix = self.qinterpolator.bases(qinj)
        self.qdmats = [self.qinj_design_matrix, self.qpe_design_matrix]
        self.norm_design_matrix = self.interpolator.bases(jnp.log(self.mm))
        self.qnorm_design_matrix = self.qinterpolator.bases(self.qq)

    def p_m1(self, m1, alpha, mmin, mmax, cs):
        p_m = powerlaw_pdf(m1, alpha=-alpha, low=mmin, high=mmax)
        perturbation = jnp.exp(self.interpolator.project(self.dmats[m1.ndim - 1], cs))
        return p_m * perturbation

    def p_q(self, q, m1, beta, mmin, vs):
        p_q = powerlaw_pdf(q, alpha=beta, low=mmin / m1, high=1)
        perturbation = jnp.exp(self.qinterpolator.project(self.qdmats[q.ndim - 1], vs))
        return p_q * perturbation

    def norm_pm1q(self, alpha, mmin, mmax, cs, beta, vs):
        p_m = powerlaw_pdf(self.mm, alpha=-alpha, low=mmin, high=mmax)
        perturbation = jnp.exp(self.interpolator.project(self.norm_design_matrix, cs))
        p_q = powerlaw_pdf(self.qq, alpha=beta, low=mmin / self.mm, high=1)
        qperturbation = jnp.exp(self.qinterpolator.project(self.qnorm_design_matrix, vs))
        p_mq = p_m * perturbation * p_q * qperturbation
        return trapezoid(trapezoid(p_mq, self.qs, axis=0), self.ms)

    def __call__(self, m1, q, **kwargs):
        beta = kwargs.pop("beta")
        mmin = kwargs.pop("mmin", self.mmin)
        vs = kwargs.pop("vs")
        p_m1 = self.p_m1(m1, mmin=mmin, **kwargs)
        p_q = self.p_q(q, m1, beta=beta, mmin=mmin, vs=vs)
        norm = self.norm_pm1q(beta=beta, mmin=mmin, vs=vs, **kwargs)
        return p_m1 * p_q / norm


class PowerlawSplineRedshiftModel(PowerlawRedshiftModel):
    """p(z) proportional to dVc/dz (1+z)^(lamb-1) exp(spline(z)).

    Parity: spline_perturbation.py:304-372; used as the b-spline example's
    redshift model (pipeline/utils.py:149-155).
    """

    def __init__(self, n_splines, z_pe, z_inj, basis=LogXBSpline):
        super().__init__(z_pe=z_pe, z_inj=z_inj)
        self.n_splines = n_splines
        self.interpolator = basis(n_splines, xrange=(float(self.zmin), float(self.zmax)), k=4, normalize=False)
        self.pe_design_matrix = self.interpolator.bases(z_pe)
        self.inj_design_matrix = self.interpolator.bases(z_inj)
        self.dmats = [self.inj_design_matrix, self.pe_design_matrix]
        self.norm_design_matrix = self.interpolator.bases(self.zs)

    def normalization(self, lamb, cs):
        pz = self.dVdz_ * jnp.power(1.0 + self.zs, lamb - 1.0)
        pz = pz * jnp.exp(self.interpolator.project(self.norm_design_matrix, cs))
        return trapezoid(pz, self.zs)

    def prob(self, z, dVdz, lamb, cs):
        return dVdz * jnp.power(1.0 + z, lamb - 1.0) * jnp.exp(self.interpolator.project(self.dmats[z.ndim - 1], cs))

    def log_prob(self, z, lamb, cs):
        dVdz = self.dVdzs[z.ndim - 1]
        return jnp.where(
            jnp.less_equal(z, self.zmax),
            jnp.log(dVdz)
            + (lamb - 1.0) * jnp.log1p(z)
            + self.interpolator.project(self.dmats[z.ndim - 1], cs)
            - jnp.log(self.normalization(lamb, cs)),
            jnp.nan_to_num(-jnp.inf),
        )

    def __call__(self, z, lamb, cs):
        dVdz = self.dVdzs[z.ndim - 1]
        return jnp.where(
            jnp.less_equal(z, self.zmax),
            self.prob(z, dVdz, lamb, cs) / self.normalization(lamb, cs),
            0.0,
        )
