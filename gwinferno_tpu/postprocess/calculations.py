"""Posterior-predictive-distribution (PPD) grid evaluators.

For each posterior draw, evaluate the population pdf on fixed grids and
normalize.  The reference jits a per-draw closure and python-loops over draws
(gwinferno/postprocess/calculations.py:55-57 etc.); here draws are batched
with ``vmap`` in chunks -- one XLA program, grid work on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.integrate import trapezoid

from ..distributions import betadist
from ..interpolation import LogYBSpline
from ..models.bsplines.separable import BSplineIIDSpinMagnitudes
from ..models.bsplines.separable import BSplineIIDSpinTilts
from ..models.bsplines.separable import BSplineIndependentSpinMagnitudes
from ..models.bsplines.separable import BSplineIndependentSpinTilts
from ..models.bsplines.separable import BSplinePrimaryBSplineRatio
from ..models.bsplines.single import BSplineRatio
from ..models.parametric.parametric import mixture_isoalign_spin_tilt
from ..models.parametric.parametric import plpeak_primary_ratio_pdf

__all__ = [
    "calculate_bspline_mass_ppds",
    "calculate_powerlaw_peak_mass_ppds",
    "calculate_peak_logm1_bspline_q_ppds",
    "calculate_beta_spin_mag",
    "calculate_mixture_iso_aligned_spin_tilt",
    "calculate_bspline_spin_ppds",
    "calculate_powerlaw_rate_of_z_ppds",
    "calculate_powerlaw_spline_rate_of_z_ppds",
]

GRID_N = 800


def _batched(fn, *draw_args, batch_size=128):
    """vmap ``fn`` over the leading draw axis in chunks (bounded memory)."""
    n = np.shape(draw_args[0])[0]
    f = jax.jit(jax.vmap(fn))
    outs = []
    for s in range(0, n, batch_size):
        outs.append(f(*[a[s : s + batch_size] for a in draw_args]))
    return jax.tree.map(lambda *xs: np.concatenate([np.asarray(x) for x in xs], axis=0), *outs)


def _marginal_mass_pdfs(p_MQ, M, Q, ms, qs, mmin, r, frac):
    p_mq = jnp.where(jnp.greater(Q, mmin / M), p_MQ, 0.0)
    p_m = trapezoid(p_mq, qs, axis=0)
    p_q = trapezoid(p_mq, ms, axis=1)
    P_m = r * frac * p_m / trapezoid(p_m, ms)
    P_q = r * frac * p_q / trapezoid(p_q, qs)
    return P_m, P_q


def calculate_bspline_mass_ppds(m_cs, q_cs, nspline_dict, mmin, mmax, rate=None, pop_frac=None):
    """B-spline mass PPDs (parity: calculations.py:20-60)."""
    ms = jnp.linspace(mmin, mmax, GRID_N)
    qs = jnp.linspace(mmin / mmax, 1, GRID_N)
    M, Q = jnp.meshgrid(ms, qs)
    n = m_cs.shape[0]
    rate = jnp.ones(n) if rate is None else jnp.asarray(rate)
    pop_frac = jnp.ones(n) if pop_frac is None else jnp.asarray(pop_frac)

    model = BSplinePrimaryBSplineRatio(
        nspline_dict["m1"], nspline_dict["q"], M, ms, Q, qs, m1min=mmin, m2min=mmin, mmax=mmax
    )

    def one(m_c, q_c, r, f):
        return _marginal_mass_pdfs(model(m_c, q_c, pe_samples=True), M, Q, ms, qs, mmin, r, f)

    mpdfs, qpdfs = _batched(one, jnp.asarray(m_cs), jnp.asarray(q_cs), rate, pop_frac)
    return mpdfs, np.asarray(ms), qpdfs, np.asarray(qs)


def calculate_powerlaw_peak_mass_ppds(alpha, beta, mu_peak, sig_peak, lamb, mmin, mmax, rate=None, pop_frac=None):
    """Powerlaw+peak mass PPDs (parity: calculations.py:63-91)."""
    ms = jnp.linspace(mmin, mmax, GRID_N)
    qs = jnp.linspace(mmin / mmax, 1, GRID_N)
    M, Q = jnp.meshgrid(ms, qs)
    n = np.shape(alpha)[0]
    rate = jnp.ones(n) if rate is None else jnp.asarray(rate)
    pop_frac = jnp.ones(n) if pop_frac is None else jnp.asarray(pop_frac)

    def one(a, b, mp, sp, lam, r, f):
        p_MQ = plpeak_primary_ratio_pdf(M, Q, a, b, mmin, mmax, mp, sp, lam)
        return _marginal_mass_pdfs(p_MQ, M, Q, ms, qs, mmin, r, f)

    mpdfs, qpdfs = _batched(
        one, jnp.asarray(alpha), jnp.asarray(beta), jnp.asarray(mu_peak), jnp.asarray(sig_peak),
        jnp.asarray(lamb), rate, pop_frac,
    )
    return mpdfs, np.asarray(ms), qpdfs, np.asarray(qs)


def calculate_peak_logm1_bspline_q_ppds(logmp, logsigp, q_cs, nspline_dict, mmin, mmax, rate=None, pop_frac=None):
    """Lognormal-peak primary mass x B-spline mass ratio PPDs
    (parity: calculations.py:94-130)."""
    from ..distributions import truncnorm_pdf

    ms = jnp.linspace(mmin, mmax, GRID_N)
    qs = jnp.linspace(mmin / mmax, 1, GRID_N)
    M, Q = jnp.meshgrid(ms, qs)
    n = np.shape(q_cs)[0]
    rate = jnp.ones(n) if rate is None else jnp.asarray(rate)
    pop_frac = jnp.ones(n) if pop_frac is None else jnp.asarray(pop_frac)

    q_model = BSplineRatio(nspline_dict["q"], Q, qs, mmin / mmax, basis=LogYBSpline)

    def one(lmp, lsp, q_c, r, f):
        p_mq = q_model(q_c, pe_samples=True) * truncnorm_pdf(M, lmp, lsp, mmin, mmax, log=True)
        p_mq = jnp.where(jnp.less(M, mmin) | jnp.less(M * Q, mmin), 0.0, p_mq)
        p_m = trapezoid(p_mq, qs, axis=0)
        p_q = trapezoid(p_mq, ms, axis=1)
        return r * f * p_m / trapezoid(p_m, ms), r * f * p_q / trapezoid(p_q, qs)

    mpdfs, qpdfs = _batched(one, jnp.asarray(logmp), jnp.asarray(logsigp), jnp.asarray(q_cs), rate, pop_frac)
    return mpdfs, np.asarray(ms), qpdfs, np.asarray(qs)


def calculate_beta_spin_mag(alpha_a, beta_a, amax=1, rate=None, pop_frac=None):
    """Beta spin-magnitude PPDs (parity: calculations.py:133-155)."""
    aa = jnp.linspace(0, amax, GRID_N)
    n = np.shape(alpha_a)[0]
    rate = jnp.ones(n) if rate is None else jnp.asarray(rate)
    pop_frac = jnp.ones(n) if pop_frac is None else jnp.asarray(pop_frac)

    def one(a, b, r, f):
        p = betadist(aa, a, b, scale=amax)
        return r * f * p / trapezoid(p, aa)

    pdfs = _batched(one, jnp.asarray(alpha_a), jnp.asarray(beta_a), rate, pop_frac)
    return pdfs, np.asarray(aa)


def calculate_mixture_iso_aligned_spin_tilt(sig_ct, lambda_ct, rate=None, pop_frac=None):
    """Iso+aligned tilt-mixture PPDs (parity: calculations.py:157-179)."""
    ct = jnp.linspace(-1, 1, GRID_N)
    n = np.shape(sig_ct)[0]
    rate = jnp.ones(n) if rate is None else jnp.asarray(rate)
    pop_frac = jnp.ones(n) if pop_frac is None else jnp.asarray(pop_frac)

    def one(s, lam, r, f):
        p = mixture_isoalign_spin_tilt(ct, lam, s)
        return r * f * p / trapezoid(p, ct)

    pdfs = _batched(one, jnp.asarray(sig_ct), jnp.asarray(lambda_ct), rate, pop_frac)
    return pdfs, np.asarray(ct)


def calculate_bspline_spin_ppds(a1_cs, tilt1_cs, nspline_dict, a2_cs=None, tilt2_cs=None, rate=None, pop_frac=None):
    """B-spline spin PPDs, IID or independent (parity: calculations.py:181-242)."""
    aa = jnp.linspace(0, 1, GRID_N)
    cc = jnp.linspace(-1, 1, GRID_N)
    n = np.shape(a1_cs)[0]
    rate = jnp.ones(n) if rate is None else jnp.asarray(rate)
    pop_frac = jnp.ones(n) if pop_frac is None else jnp.asarray(pop_frac)

    if a2_cs is None:
        mag_model = BSplineIIDSpinMagnitudes(nspline_dict["a"], aa, aa, aa, aa, basis=LogYBSpline, normalize=True)
        tilt_model = BSplineIIDSpinTilts(nspline_dict["tilt"], cc, cc, cc, cc, basis=LogYBSpline, normalize=True)

        def one(a_cs, ct_cs, r, f):
            p_a = mag_model.primary_model(a_cs)
            p_ct = tilt_model.primary_model(ct_cs)
            return r * f * p_a / trapezoid(p_a, aa), r * f * p_ct / trapezoid(p_ct, cc)

        apdfs, ctpdfs = _batched(one, jnp.asarray(a1_cs), jnp.asarray(tilt1_cs), rate, pop_frac)
        return apdfs, np.asarray(aa), ctpdfs, np.asarray(cc)

    mag_model = BSplineIndependentSpinMagnitudes(nspline_dict["a1"], nspline_dict["a2"], aa, aa, aa, aa, normalize=True)
    tilt_model = BSplineIndependentSpinTilts(nspline_dict["tilt1"], nspline_dict["tilt2"], cc, cc, cc, cc, normalize=True)

    def one(a1c, ct1c, a2c, ct2c, r, f):
        p_a1 = mag_model.primary_model(a1c)
        p_ct1 = tilt_model.primary_model(ct1c)
        p_a2 = mag_model.secondary_model(a2c)
        p_ct2 = tilt_model.secondary_model(ct2c)
        return (
            r * f * p_a1 / trapezoid(p_a1, aa),
            r * f * p_ct1 / trapezoid(p_ct1, cc),
            r * f * p_a2 / trapezoid(p_a2, aa),
            r * f * p_ct2 / trapezoid(p_ct2, cc),
        )

    a1p, ct1p, a2p, ct2p = _batched(
        one, jnp.asarray(a1_cs), jnp.asarray(tilt1_cs), jnp.asarray(a2_cs), jnp.asarray(tilt2_cs), rate, pop_frac
    )
    return a1p, a2p, np.asarray(aa), ct1p, ct2p, np.asarray(cc)


def calculate_powerlaw_rate_of_z_ppds(lamb, rate, z_model, pop_frac=None):
    """R(z) = rate (1+z)^lambda (parity: calculations.py:244-259)."""
    n = np.shape(lamb)[0]
    pop_frac = jnp.ones(n) if pop_frac is None else jnp.asarray(pop_frac)
    zs = z_model.zs

    def one(la, r, f):
        return r * f * jnp.power(1.0 + zs, la)

    rs = _batched(one, jnp.asarray(lamb), jnp.asarray(rate), pop_frac)
    return rs, np.asarray(zs)


def calculate_powerlaw_spline_rate_of_z_ppds(lamb, z_cs, rate, z_model, pop_frac=None):
    """R(z) with the spline perturbation; prepends the pinned-zero coefficient
    (parity: calculations.py:261-279)."""
    n = np.shape(z_cs)[0]
    pop_frac = jnp.ones(n) if pop_frac is None else jnp.asarray(pop_frac)
    zs = z_model.zs

    def one(cs, la, r, f):
        cs = jnp.concatenate([jnp.zeros(1), cs])
        return r * f * jnp.power(1.0 + zs, la) * jnp.exp(
            z_model.interpolator.project(z_model.norm_design_matrix, cs)
        )

    rs = _batched(one, jnp.asarray(z_cs), jnp.asarray(lamb), jnp.asarray(rate), pop_frac)
    return rs, np.asarray(zs)
