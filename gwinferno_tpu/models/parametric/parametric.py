"""Parametric population models: masses, spins, redshift.

Log-space-first implementations composed from the L0 kernel library; linear
wrappers keep API parity with the reference
(gwinferno/models/parametric/parametric.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.scipy.integrate import trapezoid

from ...cosmology import PLANCK_2015_LVK_Cosmology as Planck15
from ...distributions import betadist
from ...distributions import log_betadist
from ...distributions import log_powerlaw_pdf
from ...distributions import log_truncnorm_pdf
from ...distributions import powerlaw_logit_pdf
from ...distributions import powerlaw_pdf
from ...distributions import safe_logaddexp
from ...distributions import smooth
from ...distributions import truncnorm_pdf
from ...utils.host import xp_for

__all__ = [
    "powerlaw_primary_ratio_pdf",
    "powerlaw_primary_ratio_falloff_pdf",
    "plpeak_primary_pdf",
    "plpeak_primary_ratio_pdf",
    "log_plpeak_primary_ratio_pdf",
    "beta_spin_magnitude",
    "iid_spin_magnitude",
    "independent_spin_magnitude_beta_dist",
    "log_independent_spin_magnitude_beta_dist",
    "mixture_isoalign_spin_tilt",
    "log_mixture_isoalign_spin_tilt",
    "iid_spin_tilt",
    "independent_spin_tilt",
    "log_independent_spin_tilt",
    "default_spin_tilt",
    "PowerlawRedshiftModel",
]

# ---------------------------------------------------------------------------
# mass models (parity: parametric.py:27-53)
# ---------------------------------------------------------------------------


def powerlaw_primary_ratio_pdf(m1, q, alpha, beta, mmin, mmax):
    """p(m1, q) = PL(m1; alpha, mmin, mmax) * PL(q; beta, mmin/m1, 1)."""
    p_q = powerlaw_pdf(q, beta, mmin / m1, 1.0)
    p_m1 = powerlaw_pdf(m1, alpha, mmin, mmax)
    return p_q * p_m1


def powerlaw_primary_ratio_falloff_pdf(m1, q, alpha, beta, mmin, mmax, fall_off):
    """Powerlaw primary with a soft (logistic) high-mass fall-off."""
    p_q = powerlaw_pdf(q, beta, mmin / m1, 1.0)
    p_m1 = powerlaw_logit_pdf(m1, alpha, mmin, mmax, fall_off)
    return p_q * p_m1


def plpeak_primary_pdf(m1, alpha, mmin, mmax, mpp, sigpp, lam, delta=None):
    """Powerlaw + Gaussian-peak primary-mass pdf, optional low-mass smoothing."""
    pl = powerlaw_pdf(m1, alpha, mmin, mmax)
    peak = truncnorm_pdf(m1, mpp, sigpp, mmin, mmax)
    if delta is None:
        return (1.0 - lam) * pl + lam * peak
    return (1.0 - lam) * pl * smooth(delta, m1, mmin) + lam * peak


def plpeak_primary_ratio_pdf(m1, q, alpha, beta, mmin, mmax, mpp, sigpp, lam, delta=None):
    """Joint (m1, q) powerlaw+peak pdf; smoothing also applied to m2 = q*m1."""
    p_q = powerlaw_pdf(q, beta, mmin / m1, 1.0)
    p_m1 = plpeak_primary_pdf(m1, alpha, mmin, mmax, mpp, sigpp, lam, delta=delta)
    if delta is None:
        return p_q * p_m1
    return p_q * smooth(delta, q * m1, mmin) * p_m1


def log_plpeak_primary_ratio_pdf(m1, q, alpha, beta, mmin, mmax, mpp, sigpp, lam):
    """Log-space powerlaw+peak joint (m1, q) pdf -- the f32-safe TPU hot path
    (linear products of truncated pdfs overflow/underflow float32; the
    mixture is composed with ``logaddexp`` instead)."""
    log_p_q = log_powerlaw_pdf(q, beta, mmin / m1, 1.0)
    log_pl = log_powerlaw_pdf(m1, alpha, mmin, mmax)
    log_peak = log_truncnorm_pdf(m1, mpp, sigpp, mmin, mmax)
    log_p_m1 = safe_logaddexp(jnp.log1p(-lam) + log_pl, jnp.log(lam) + log_peak)
    return log_p_q + log_p_m1


# ---------------------------------------------------------------------------
# spin models (parity: parametric.py:63-102)
# ---------------------------------------------------------------------------


def beta_spin_magnitude(a, alpha, beta, amax=1):
    return betadist(a, alpha, beta, scale=amax)


def iid_spin_magnitude(a1, a2, alpha_mag, beta_mag, amax=1):
    return betadist(a1, alpha_mag, beta_mag, scale=amax) * betadist(a2, alpha_mag, beta_mag, scale=amax)


def independent_spin_magnitude_beta_dist(a1, a2, alpha_mag1, beta_mag1, alpha_mag2, beta_mag2, amax1=1, amax2=1):
    return betadist(a1, alpha_mag1, beta_mag1, scale=amax1) * betadist(a2, alpha_mag2, beta_mag2, scale=amax2)


def mixture_isoalign_spin_tilt(ct, xi_tilt, sigma_tilt):
    """Mixture of isotropic (uniform on [-1,1]) + aligned (truncnorm at 1) tilts."""
    xp = xp_for(ct)  # support mask is data-only -> host for numpy banks
    in_support = xp.where(xp.greater(ct, 1) | xp.less(ct, -1), 0.0, 1.0)
    return in_support * (1.0 - xi_tilt) / 2.0 + xi_tilt * truncnorm_pdf(ct, 1.0, sigma_tilt, -1.0, 1.0)


def iid_spin_tilt(ct1, ct2, xi_tilt, sigma_tilt):
    return mixture_isoalign_spin_tilt(ct1, xi_tilt, sigma_tilt) * mixture_isoalign_spin_tilt(ct2, xi_tilt, sigma_tilt)


def independent_spin_tilt(ct1, ct2, xi_tilt_1, xi_tilt_2, sigma_tilt1, sigma_tilt2):
    return mixture_isoalign_spin_tilt(ct1, xi_tilt_1, sigma_tilt1) * mixture_isoalign_spin_tilt(ct2, xi_tilt_2, sigma_tilt2)


def log_independent_spin_magnitude_beta_dist(a1, a2, alpha_mag1, beta_mag1, alpha_mag2, beta_mag2, amax1=1, amax2=1):
    return log_betadist(a1, alpha_mag1, beta_mag1, scale=amax1) + log_betadist(a2, alpha_mag2, beta_mag2, scale=amax2)


def log_mixture_isoalign_spin_tilt(ct, xi_tilt, sigma_tilt):
    """Log of the isotropic+aligned tilt mixture, composed via logaddexp."""
    oob = xp_for(ct).greater(ct, 1) | xp_for(ct).less(ct, -1)  # data-only
    log_iso = jnp.where(oob, -jnp.inf, jnp.log1p(-xi_tilt) - jnp.log(2.0))
    log_ali = jnp.log(xi_tilt) + log_truncnorm_pdf(ct, 1.0, sigma_tilt, -1.0, 1.0)
    return safe_logaddexp(log_iso, log_ali)


def log_independent_spin_tilt(ct1, ct2, xi_tilt_1, xi_tilt_2, sigma_tilt1, sigma_tilt2):
    return log_mixture_isoalign_spin_tilt(ct1, xi_tilt_1, sigma_tilt1) + log_mixture_isoalign_spin_tilt(
        ct2, xi_tilt_2, sigma_tilt2
    )


def default_spin_tilt(ct1, ct2, xi_tilt, sigma_tilt):
    """LVK 'default' tilt model: mixture applied jointly to the pair."""
    iso1 = jnp.where(jnp.greater(ct1, 1) | jnp.less(ct1, -1), 0.0, 0.5)
    iso2 = jnp.where(jnp.greater(ct2, 1) | jnp.less(ct2, -1), 0.0, 0.5)
    ali1 = truncnorm_pdf(ct1, 1.0, sigma_tilt, -1.0, 1.0)
    ali2 = truncnorm_pdf(ct2, 1.0, sigma_tilt, -1.0, 1.0)
    return (1.0 - xi_tilt) * iso1 * iso2 + xi_tilt * ali1 * ali2


# ---------------------------------------------------------------------------
# redshift model (parity: parametric.py:112-145)
# ---------------------------------------------------------------------------


class PowerlawRedshiftModel:
    """p(z) proportional to dVc/dz (1+z)^(lambda-1) on [zmin, zmax].

    The dVc/dz values at the PE and injection sample banks are cached at
    construction (the TPU hot path touches only the cached arrays and a
    1000-point trapezoid normalization).  Dispatch between the two cached
    banks follows the reference convention: 1-D input = injections,
    2-D input = PE samples (parametric.py:130-131).

    The trapezoid ``normalization`` doubles as the surveyed-hypervolume VT
    consumed by rate reconstruction (SURVEY.md S2.2).
    """

    def __init__(self, z_pe, z_inj, cosmology=Planck15, grid_points=1000):
        # construction-time caches are HOST numpy for host inputs
        # (utils.host convention): jitted models close over them as
        # executable constants instead of slow-to-fetch device buffers
        xp = xp_for(z_pe, z_inj)
        self.zmin = xp.maximum(xp.min(z_pe), xp.min(z_inj))
        self.zmax = xp.minimum(xp.max(z_pe), xp.max(z_inj))
        self.zs = xp.linspace(self.zmin, self.zmax, grid_points)
        self.dVdz_ = cosmology.dVcdz(self.zs)
        self.dVdzs = [cosmology.dVcdz(z_inj), cosmology.dVcdz(z_pe)]

    def prob(self, z, dVdz, lamb):
        return dVdz * jnp.power(1.0 + z, lamb - 1.0)

    def normalization(self, lamb):
        return trapezoid(self.prob(self.zs, self.dVdz_, lamb), self.zs)

    def log_prob(self, z, lamb):
        dVdz = self.dVdzs[z.ndim - 1]
        xp = xp_for(z, dVdz)  # data-only terms host-side (utils.host)
        return jnp.where(
            xp.less_equal(z, self.zmax),
            xp.log(dVdz) + (lamb - 1.0) * xp.log1p(z) - jnp.log(self.normalization(lamb)),
            jnp.nan_to_num(-jnp.inf),
        )

    def __call__(self, z, lamb):
        dVdz = self.dVdzs[z.ndim - 1]
        return jnp.where(
            jnp.less_equal(z, self.zmax),
            self.prob(z, dVdz, lamb) / self.normalization(lamb),
            0.0,
        )
