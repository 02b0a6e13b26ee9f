"""INDEPENDENT implementation of the bench posterior, for parity validation.

This module deliberately shares NO code with gwinferno_tpu: pure numpy/f64,
its own flat-LambdaCDM comoving-volume integration, its own truncated-pdf
formulas, and (in run_ensemble) its own sampler (Goodman & Weare affine-
invariant stretch moves -- nothing like NUTS).  Agreement of posterior
moments between this and the gwinferno_tpu NUTS engine is therefore evidence
about BOTH the model math and the sampler, replacing round 1's
self-consistency-only story (BASELINE.md's numpyro-on-CPU procedure is
impossible here: numpyro is not installed).

Model: the bench's spinless powerlaw+peak mass x powerlaw redshift
hierarchical likelihood over the self-consistent synthetic 69-event catalog
(known population truth) with the synthetic O3-schema injection set,
min_neff_cut=True, log weights (bench.py:make_model; reference semantics
gwinferno/pipeline/analysis.py).  ``unscaled_rate`` is excluded: its
posterior is analytically Gamma(Nobs) independent of the data, checked
separately.
"""

from __future__ import annotations

import numpy as np

# Planck 2015 LVK constants (reference gwinferno/cosmology.py:150)
H0 = 67.90  # km/s/Mpc
OM0 = 0.3065
C_KMS = 299792.458


def _dVc_dz_table(zmax=3.0, n=30001):
    """Comoving volume element dVc/dz [Gpc^3] on a dense grid, by Simpson
    integration of the inverse Hubble parameter (independent of the package's
    cumulative-trapezoid table)."""
    z = np.linspace(0.0, zmax, n)
    E = np.sqrt(OM0 * (1 + z) ** 3 + (1.0 - OM0))
    dH = C_KMS / H0  # Mpc
    inv_E = 1.0 / E
    # Simpson cumulative integral of 1/E dz -> Dc/dH
    from scipy.integrate import cumulative_simpson

    dc = np.concatenate([[0.0], cumulative_simpson(inv_E, x=z)]) * dH  # Mpc
    dvdz = 4.0 * np.pi * dc**2 * dH * inv_E  # Mpc^3
    return z, dvdz * 1e-9  # Gpc^3


_ZGRID, _DVDZ = _dVc_dz_table()


def dVc_dz(z):
    return np.interp(z, _ZGRID, _DVDZ)


def log_powerlaw(x, alpha, lo, hi):
    out = np.full(np.shape(x), -np.inf)
    inside = (x >= lo) & (x <= hi)
    ap1 = alpha + 1.0
    if abs(ap1) < 1e-8:
        norm = np.log(np.log(hi / lo))
    else:
        norm = np.log(np.abs((hi**ap1 - lo**ap1) / ap1))
    out = np.where(inside, alpha * np.log(np.maximum(x, 1e-300)) - norm, -np.inf)
    return out


def log_powerlaw_varlow(x, alpha, lo, hi):
    """Powerlaw with elementwise lower bound (the q | m1 conditional)."""
    inside = (x >= lo) & (x <= hi)
    ap1 = alpha + 1.0
    norm = np.log(np.abs((hi**ap1 - lo**ap1) / ap1))
    return np.where(inside, alpha * np.log(np.maximum(x, 1e-300)) - norm, -np.inf)


def log_truncnorm(x, mu, sig, lo, hi):
    from scipy.stats import truncnorm

    a, b = (lo - mu) / sig, (hi - mu) / sig
    return truncnorm.logpdf(x, a, b, loc=mu, scale=sig)


def logsumexp(a, axis=None):
    m = np.max(a, axis=axis, keepdims=True)
    m = np.where(np.isfinite(m), m, 0.0)
    out = np.log(np.sum(np.exp(a - m), axis=axis)) + np.squeeze(m, axis=axis)
    return out


class IndependentPosterior:
    """log posterior(theta) for theta = (alpha, beta, mu_peak, sig_peak,
    lambda_m, lamb) in constrained space."""

    MMIN, MMAX = 5.0, 100.0

    def __init__(self, pedict, injdict, constants):
        self.pe_m1 = np.asarray(pedict["mass_1"], dtype=np.float64)
        self.pe_q = np.asarray(pedict["mass_ratio"], dtype=np.float64)
        self.pe_z = np.asarray(pedict["redshift"], dtype=np.float64)
        self.pe_logprior = np.log(np.asarray(pedict["prior"], dtype=np.float64))
        self.inj_m1 = np.asarray(injdict["mass_1"], dtype=np.float64)
        self.inj_q = np.asarray(injdict["mass_ratio"], dtype=np.float64)
        self.inj_z = np.asarray(injdict["redshift"], dtype=np.float64)
        self.inj_logprior = np.log(np.asarray(injdict["prior"], dtype=np.float64))
        self.Ninj = float(constants["total_inj"])
        self.Nobs = int(constants["nObs"])
        self.Tobs = float(constants["obs_time"])
        # redshift model normalization grid: same convention as
        # PowerlawRedshiftModel (data-derived bounds, 1000-point trapezoid)
        self.zmin = max(self.pe_z.min(), self.inj_z.min())
        self.zmax = min(self.pe_z.max(), self.inj_z.max())
        self.zs = np.linspace(self.zmin, self.zmax, 1000)
        self.dvdz_grid = dVc_dz(self.zs) * 1e9  # Mpc^3 to match package units
        self.pe_dvdz = dVc_dz(self.pe_z) * 1e9
        self.inj_dvdz = dVc_dz(self.inj_z) * 1e9
        self.n_samp = self.pe_m1.shape[1]

    def _z_lognorm(self, lamb):
        integrand = self.dvdz_grid * (1 + self.zs) ** (lamb - 1.0)
        return np.log(np.trapezoid(integrand, self.zs))

    def _log_pz(self, z, dvdz, lamb):
        # PowerlawRedshiftModel truncates the population at the data-derived
        # zmax (zero weight above); replicate or the selection integral picks
        # up the injections beyond the catalog's reach
        val = np.log(dvdz) + (lamb - 1.0) * np.log1p(z) - self._z_lognorm(lamb)
        return np.where(z <= self.zmax, val, -np.inf)

    def _log_p_m1q(self, m1, q, alpha, beta, mu, sig, lam):
        log_pq = log_powerlaw_varlow(q, beta, self.MMIN / m1, 1.0)
        log_pl = log_powerlaw(m1, alpha, self.MMIN, self.MMAX)
        log_peak = log_truncnorm(m1, mu, sig, self.MMIN, self.MMAX)
        with np.errstate(divide="ignore"):
            both = np.logaddexp(np.log1p(-lam) + log_pl, np.log(lam) + log_peak)
        return log_pq + both

    def log_prior(self, theta):
        alpha, beta, mu, sig, lam, lamb = theta
        if not (self.MMIN < mu < self.MMAX and sig > 0 and 0 < lam < 1):
            return -np.inf
        lp = -0.5 * (alpha / 5.0) ** 2 - 0.5 * (beta / 5.0) ** 2 - 0.5 * (lamb / 5.0) ** 2
        lp += -0.5 * (sig / 10.0) ** 2  # HalfNormal(10)
        return lp

    def log_likelihood(self, theta):
        alpha, beta, mu, sig, lam, lamb = theta
        logw_pe = (
            self._log_p_m1q(self.pe_m1, self.pe_q, alpha, beta, mu, sig, lam)
            + self._log_pz(self.pe_z, self.pe_dvdz, lamb)
            - self.pe_logprior
        )
        logw_inj = (
            self._log_p_m1q(self.inj_m1, self.inj_q, alpha, beta, mu, sig, lam)
            + self._log_pz(self.inj_z, self.inj_dvdz, lamb)
            - self.inj_logprior
        )
        logw_pe = np.where(np.isnan(logw_pe), -np.inf, logw_pe)
        logw_inj = np.where(np.isnan(logw_inj), -np.inf, logw_inj)

        lse1 = logsumexp(logw_pe, axis=1)
        lse2 = logsumexp(2.0 * logw_pe, axis=1)
        logBFs = lse1 - np.log(self.n_samp)
        log_neffs = 2.0 * lse1 - lse2
        if not np.all(np.isfinite(logBFs)):
            return -np.inf

        lse1_i = logsumexp(logw_inj)
        lse2_i = logsumexp(2.0 * logw_inj)
        logmu = lse1_i - np.log(self.Ninj)
        # reference formula: n_eff_inj = mu^2 / var, var = s2/N^2 - mu^2/N
        s2_over_N2 = np.exp(lse2_i - 2.0 * np.log(self.Ninj))
        mu2_over_N = np.exp(2.0 * logmu - np.log(self.Ninj))
        var = s2_over_N2 - mu2_over_N
        if var <= 0 or not np.isfinite(logmu):
            return -np.inf
        n_eff_inj = np.exp(2.0 * logmu) / var

        # min_neff_cut walls, matching bench.py / the reference production
        # defaults (analysis.py:272-303); on the self-consistent synthetic
        # catalog the posterior bulk sits far from these (headroom ~6x/35x)
        if n_eff_inj < 4.0 * self.Nobs:
            return -np.inf
        if np.exp(log_neffs.min()) <= self.Nobs:
            return -np.inf
        return float(-self.Nobs * logmu + logBFs.sum())

    def __call__(self, theta):
        lp = self.log_prior(theta)
        if not np.isfinite(lp):
            return -np.inf
        ll = self.log_likelihood(theta)
        return lp + ll


def run_ensemble(log_post, x0, n_walkers=48, n_steps=4000, seed=7, a=2.0, progress_every=0):
    """Goodman & Weare affine-invariant stretch-move ensemble sampler
    (pure numpy, no JAX, no HMC machinery).  Returns (chain, acc_rate):
    chain shape (n_steps, n_walkers, dim)."""
    rng = np.random.default_rng(seed)
    dim = x0.shape[1]
    walkers = x0.copy()
    logp = np.array([log_post(w) for w in walkers])
    chain = np.empty((n_steps, n_walkers, dim))
    n_acc = 0
    for t in range(n_steps):
        for k in range(n_walkers):
            j = rng.integers(n_walkers - 1)
            if j >= k:
                j += 1
            zz = (1.0 + (a - 1.0) * rng.random()) ** 2 / a
            prop = walkers[j] + zz * (walkers[k] - walkers[j])
            lp_prop = log_post(prop)
            log_accept = (dim - 1) * np.log(zz) + lp_prop - logp[k]
            if np.log(rng.random()) < log_accept:
                walkers[k] = prop
                logp[k] = lp_prop
                n_acc += 1
        chain[t] = walkers
        if progress_every and (t + 1) % progress_every == 0:
            print(f"  ensemble step {t + 1}/{n_steps} (acc {n_acc / ((t + 1) * n_walkers):.2f})", flush=True)
    return chain, n_acc / (n_steps * n_walkers)
