"""1-D B-spline population models with cached design matrices.

Architectural invariant preserved from the reference (SURVEY.md S3.2): basis
evaluation happens ONCE at model construction over the PE and injection
sample banks; the sampled hot path is pure dense linear algebra
(``coefs @ design_matrix``).

TPU-first redesign vs the reference (gwinferno/models/bsplines/single.py):
the reference drops out-of-range samples via boolean gather and writes
results back with ``.at[mask].set`` scatter; here design matrices keep the
**full dense sample-bank shape** with out-of-range rows zeroed and the pdf
masked to 0 by a ``where`` -- no gather/scatter in the hot path, regular
shapes for the MXU, and finite gradients by construction (OOB contributions
are selected away, never materialized as -inf).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.integrate import trapezoid

from ...cosmology import PLANCK_2015_LVK_Cosmology as Planck15
from ...interpolation import BSpline
from ...interpolation import LogXBSpline
from ...interpolation import LogXLogYBSpline
from ...interpolation import LogYBSpline
from ...utils.host import xp_for

__all__ = [
    "Base1DBSplineModel",
    "BSplineSpinMagnitude",
    "BSplineSpinTilt",
    "BSplineChiEffective",
    "BSplineSymmetricChiEffective",
    "BSplineChiPrecess",
    "BSplineRatio",
    "BSplineMass",
    "BSplineRedshift",
]


def _finite_design(dm):
    """Zero out non-finite (OOB sentinel) design entries -> dense + grad-safe."""
    xp = xp_for(dm)
    return xp.where(xp.isfinite(dm), dm, 0.0)


class Base1DBSplineModel:
    """Shared machinery: cached full-shape design matrices + masked projection.

    Parity: gwinferno/models/bsplines/single.py:16-129 (same constructor
    signature and ``__call__(coefs, pe_samples=...)`` dispatch).
    """

    def __init__(self, n_splines, xx, xx_inj, xrange=(0.0, 1.0), degree=3, basis=BSpline, **kwargs):
        self.n_splines = n_splines
        self.xmin, self.xmax = xrange
        self.degree = degree
        self.interpolator = basis(n_splines, xrange=xrange, k=degree + 1, **kwargs)
        self._valid_xx = (xx >= self.xmin) & (xx <= self.xmax)
        self._valid_xx_inj = (xx_inj >= self.xmin) & (xx_inj <= self.xmax)
        self.pe_design_matrix = _finite_design(self.interpolator.bases(xx))
        self.inj_design_matrix = _finite_design(self.interpolator.bases(xx_inj))
        self.funcs = [self.inj_pdf, self.pe_pdf]

    def eval_spline(self, bases, coefs):
        """Project coefficients onto a design matrix (normalized)."""
        return self.interpolator.project(bases, coefs)

    def pe_pdf(self, coefs):
        """pdf at the PE sample bank; exactly 0 outside the spline domain."""
        return jnp.where(self._valid_xx, self.eval_spline(self.pe_design_matrix, coefs), 0.0)

    def inj_pdf(self, coefs):
        """pdf at the injection bank; exactly 0 outside the spline domain."""
        return jnp.where(self._valid_xx_inj, self.eval_spline(self.inj_design_matrix, coefs), 0.0)

    def __call__(self, coefs, pe_samples=True):
        return self.funcs[1](coefs) if pe_samples else self.funcs[0](coefs)


class BSplineSpinMagnitude(Base1DBSplineModel):
    """Spin-magnitude spline on [0, 1] (parity: single.py:131-163)."""

    def __init__(self, n_splines, a, a_inj, basis=LogYBSpline, **kwargs):
        xrange = kwargs.pop("xrange", (0.0, 1.0))
        super().__init__(n_splines, a, a_inj, basis=basis, xrange=xrange, **kwargs)


class BSplineSpinTilt(Base1DBSplineModel):
    """cos-tilt spline on [-1, 1] (parity: single.py:165-197)."""

    def __init__(self, n_splines, ct, ct_inj, basis=LogYBSpline, **kwargs):
        xrange = kwargs.pop("xrange", (-1.0, 1.0))
        super().__init__(n_splines, ct, ct_inj, basis=basis, xrange=xrange, **kwargs)


class BSplineChiEffective(Base1DBSplineModel):
    """chi_eff spline on [-1, 1] (parity: single.py:199-231)."""

    def __init__(self, n_splines, chieff, chieff_inj, basis=BSpline, **kwargs):
        xrange = kwargs.pop("xrange", (-1.0, 1.0))
        super().__init__(n_splines, chieff, chieff_inj, basis=basis, xrange=xrange, **kwargs)


class BSplineSymmetricChiEffective(Base1DBSplineModel):
    """Symmetric chi_eff spline: models |chi_eff| on [0,1], halves the density
    (parity: single.py:233-284)."""

    def __init__(self, n_splines, chieff, chieff_inj, basis=BSpline, **kwargs):
        xrange = kwargs.pop("xrange", (0.0, 1.0))
        super().__init__(
            n_splines, xp_for(chieff).abs(chieff), xp_for(chieff_inj).abs(chieff_inj),
            basis=basis, xrange=xrange, **kwargs
        )

    def __call__(self, coefs, pe_samples=True):
        return 0.5 * self.funcs[1](coefs) if pe_samples else 0.5 * self.funcs[0](coefs)


class BSplineChiPrecess(Base1DBSplineModel):
    """chi_p spline on [0, 1] (parity: single.py:287-319)."""

    def __init__(self, n_splines, chip, chip_inj, basis=BSpline, **kwargs):
        xrange = kwargs.pop("xrange", (0.0, 1.0))
        super().__init__(n_splines, chip, chip_inj, basis=basis, xrange=xrange, **kwargs)


class BSplineRatio(Base1DBSplineModel):
    """Mass-ratio spline on [qmin, 1] (parity: single.py:321-356)."""

    def __init__(self, n_splines, q, q_inj, qmin=0, basis=LogYBSpline, **kwargs):
        xrange = kwargs.pop("xrange", (qmin, 1))
        super().__init__(n_splines, q, q_inj, basis=basis, xrange=xrange, **kwargs)


class BSplineMass(Base1DBSplineModel):
    """Component-mass spline on [mmin, mmax], log-log basis by default
    (parity: single.py:358-396)."""

    def __init__(self, n_splines, m, m_inj, mmin=2, mmax=100, basis=LogXLogYBSpline, **kwargs):
        xrange = kwargs.pop("xrange", (mmin, mmax))
        super().__init__(n_splines, m, m_inj, basis=basis, xrange=xrange, **kwargs)


class BSplineRedshift(Base1DBSplineModel):
    r"""Redshift spline defining the volumetric rate density:
    ``R(z) = exp(spline) dVc/dz / (1+z) / normalization``.

    Parity: gwinferno/models/bsplines/single.py:398-492 (1000-pt grid
    trapezoid normalization over the data-driven [zmin, zmax]).
    """

    def __init__(self, n_splines, z, z_inj, dVdc, dVdc_inj, zmax=2.3, basis=LogXBSpline, **kwargs):
        xrange = kwargs.pop("xrange", (1e-4, zmax))
        super().__init__(n_splines, z, z_inj, xrange=xrange, basis=basis, **kwargs)
        xp = xp_for(z, z_inj)
        self.zmin = xp.maximum(xp.min(z), xp.min(z_inj))
        self.zmax = xp.minimum(xp.max(z), xp.max(z_inj))
        self.zgrid = xp.linspace(self.zmin, self.zmax, 1000)
        self.dVcdzgrid = Planck15.dVcdz(self.zgrid)
        self.grid_bases = _finite_design(self.interpolator.bases(self.zgrid))
        self.differential_comov_vols = [dVdc_inj, dVdc]
        self.zs = [z_inj, z]

    def normalization(self, cs):
        """Trapezoid of exp(spline) dVc/dz / (1+z) over the z grid."""
        return trapezoid(
            self.dVcdzgrid / (1.0 + self.zgrid) * jnp.exp(jnp.einsum("i...,i->...", self.grid_bases, cs)),
            self.zgrid,
        )

    def __call__(self, coefs, pe_samples=True):
        idx = 1 if pe_samples else 0
        return (
            jnp.exp(self.funcs[idx](coefs))
            * self.differential_comov_vols[idx]
            / (1.0 + self.zs[idx])
            / self.normalization(coefs)
        )
