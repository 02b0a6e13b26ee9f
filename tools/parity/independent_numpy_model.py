"""INDEPENDENT implementation of the bench posterior, for parity validation.

This module deliberately shares NO code with gwinferno_tpu: pure numpy/f64,
its own flat-LambdaCDM comoving-volume integration, its own truncated-pdf
formulas, and (in run_ensemble) its own sampler (Goodman & Weare affine-
invariant stretch moves -- nothing like NUTS).  Agreement of posterior
moments between this and the gwinferno_tpu NUTS engine is therefore evidence
about BOTH the model math and the sampler, replacing round 1's
self-consistency-only story (BASELINE.md's numpyro-on-CPU procedure is
impossible here: numpyro is not installed).

Model: the bench's FULL 14-hyperparameter PR1 powerlaw+peak configuration
(powerlaw+peak mass, independent beta spin magnitudes via the (mu, var)
moment map, independent isotropic+aligned tilt mixtures, powerlaw redshift)
over the self-consistent synthetic 69-event catalog (known population truth)
with the synthetic O3-schema injection set, min_neff_cut=True, log weights
(bench.py:make_model; reference semantics
gwinferno/examples/simple_powerlaw_peak_example.py:29-113 +
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
    """Truncated-normal logpdf, direct formula (scipy.special.ndtr for the
    normalization; scipy.stats.truncnorm dispatch is ~10x slower on the
    multi-hundred-k-element banks)."""
    from scipy.special import ndtr

    zmass = ndtr((hi - mu) / sig) - ndtr((lo - mu) / sig)
    out = -0.5 * ((x - mu) / sig) ** 2 - np.log(sig) - 0.5 * np.log(2 * np.pi) - np.log(zmass)
    return np.where((x >= lo) & (x <= hi), out, -np.inf)


def log_truncnorm_fast(dx2, mu, sig, lo, hi):
    """Truncated-normal logpdf from a PRECOMPUTED (x - center)^2 array
    (``dx2``), scalar (mu, sig): direct formula via the normal cdf --
    ~30x cheaper than scipy.stats.truncnorm on the 320k-element banks."""
    from scipy.special import ndtr

    zmass = ndtr((hi - mu) / sig) - ndtr((lo - mu) / sig)
    return -0.5 * dx2 / sig**2 - np.log(sig) - 0.5 * np.log(2 * np.pi) - np.log(zmass)


def log_beta_pdf(log_x, log_1mx, a, b):
    """Beta(a, b) logpdf on [0, 1] from precomputed log(x), log(1-x)."""
    from scipy.special import betaln

    return (a - 1.0) * log_x + (b - 1.0) * log_1mx - betaln(a, b)


def beta_ab_from_mu_var(mu, var):
    """Standard beta moment map (same semantics the bench model uses).
    Invalid (nu <= 0) regions are the caller's wall."""
    nu = mu * (1.0 - mu) / var - 1.0
    return mu * nu, (1.0 - mu) * nu


def log_tilt_mixture(dct2, log_in_support, xi, sig):
    """Isotropic + aligned-truncnorm(1, sig) tilt mixture logpdf from a
    precomputed (ct - 1)^2 array; in-support handling via the precomputed
    ``log_in_support`` (0 inside [-1, 1], -inf outside)."""
    log_iso = np.log1p(-xi) - np.log(2.0) + log_in_support
    log_ali = np.log(xi) + log_truncnorm_fast(dct2, 1.0, sig, -1.0, 1.0) + log_in_support
    return np.logaddexp(log_iso, log_ali)


def logsumexp(a, axis=None):
    m = np.max(a, axis=axis, keepdims=True)
    m = np.where(np.isfinite(m), m, 0.0)
    out = np.log(np.sum(np.exp(a - m), axis=axis)) + np.squeeze(m, axis=axis)
    return out


PARAM_ORDER = [
    "alpha", "beta", "mu_peak", "sig_peak", "lambda_m",
    "mu_a1", "var_a1", "mu_a2", "var_a2",
    "lambda_ct1", "lambda_ct2", "sig_ct1", "sig_ct2",
    "lamb",
]


class IndependentPosterior:
    """log posterior(theta) for the 14 constrained-space hyperparameters in
    ``PARAM_ORDER``."""

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
        # precomputed per-bank logs/masks so each posterior eval is pure
        # elementwise numpy (no scipy.stats dispatch, no redundant logs)
        for tag, (m1, q) in (("pe", (self.pe_m1, self.pe_q)), ("inj", (self.inj_m1, self.inj_q))):
            log_m1 = np.log(m1)
            setattr(self, f"{tag}_log_m1", log_m1)
            setattr(self, f"{tag}_log_q", np.log(np.maximum(q, 1e-300)))
            setattr(self, f"{tag}_log_loq", np.log(self.MMIN) - log_m1)  # log(MMIN/m1)
            setattr(
                self,
                f"{tag}_mask_m1q",
                (m1 >= self.MMIN) & (m1 <= self.MMAX) & (q >= self.MMIN / m1) & (q <= 1.0),
            )
        for tag, d in (("pe", pedict), ("inj", injdict)):
            for comp in ("1", "2"):
                a = np.asarray(d[f"a_{comp}"], dtype=np.float64)
                ct = np.asarray(d[f"cos_tilt_{comp}"], dtype=np.float64)
                setattr(self, f"{tag}_log_a{comp}", np.log(np.maximum(a, 1e-300)))
                setattr(self, f"{tag}_log_1ma{comp}", np.log(np.maximum(1.0 - a, 1e-300)))
                setattr(self, f"{tag}_dct2_{comp}", (ct - 1.0) ** 2)
                setattr(
                    self,
                    f"{tag}_ct_insupp_{comp}",
                    np.where((ct >= -1.0) & (ct <= 1.0), 0.0, -np.inf),
                )
        # redshift model normalization grid: same convention as
        # PowerlawRedshiftModel (data-derived bounds, 1000-point trapezoid)
        self.zmin = max(self.pe_z.min(), self.inj_z.min())
        self.zmax = min(self.pe_z.max(), self.inj_z.max())
        self.zs = np.linspace(self.zmin, self.zmax, 1000)
        self.dvdz_grid = dVc_dz(self.zs) * 1e9  # Mpc^3 to match package units
        self.pe_dvdz = dVc_dz(self.pe_z) * 1e9
        self.inj_dvdz = dVc_dz(self.inj_z) * 1e9
        self.pe_log_dvdz, self.inj_log_dvdz = np.log(self.pe_dvdz), np.log(self.inj_dvdz)
        self.pe_log1pz, self.inj_log1pz = np.log1p(self.pe_z), np.log1p(self.inj_z)
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

    def _log_pz_fast(self, tag, lamb):
        """Same as :meth:`_log_pz` against the precomputed per-bank logs."""
        val = (
            getattr(self, f"{tag}_log_dvdz")
            + (lamb - 1.0) * getattr(self, f"{tag}_log1pz")
            - self._z_lognorm(lamb)
        )
        z = self.pe_z if tag == "pe" else self.inj_z
        return np.where(z <= self.zmax, val, -np.inf)

    def _log_p_m1q(self, tag, m1, alpha, beta, mu, sig, lam):
        """Mass-pair log population density over one precomputed bank.
        Same math as the module-level log_powerlaw/log_powerlaw_varlow/
        log_truncnorm, inlined against the cached logs."""
        from scipy.special import ndtr

        log_m1 = getattr(self, f"{tag}_log_m1")
        log_q = getattr(self, f"{tag}_log_q")
        log_loq = getattr(self, f"{tag}_log_loq")
        mask = getattr(self, f"{tag}_mask_m1q")

        ap1 = alpha + 1.0
        if abs(ap1) < 1e-8:
            norm_m = np.log(np.log(self.MMAX / self.MMIN))
        else:
            norm_m = np.log(np.abs((self.MMAX**ap1 - self.MMIN**ap1) / ap1))
        log_pl = alpha * log_m1 - norm_m

        bp1 = beta + 1.0
        # q | m1 powerlaw normalized on [MMIN/m1, 1]: lo^bp1 = exp(bp1 log lo)
        norm_q = np.log(np.abs((1.0 - np.exp(bp1 * log_loq)) / bp1))
        log_pq = beta * log_q - norm_q

        zmass = ndtr((self.MMAX - mu) / sig) - ndtr((self.MMIN - mu) / sig)
        log_peak = (
            -0.5 * ((m1 - mu) / sig) ** 2 - np.log(sig) - 0.5 * np.log(2 * np.pi) - np.log(zmass)
        )
        with np.errstate(divide="ignore"):
            both = np.logaddexp(np.log1p(-lam) + log_pl, np.log(lam) + log_peak)
        return np.where(mask, log_pq + both, -np.inf)

    def log_prior(self, theta):
        (alpha, beta, mu, sig, lam,
         mu_a1, var_a1, mu_a2, var_a2,
         xi_ct1, xi_ct2, sig_ct1, sig_ct2, lamb) = theta
        if not (self.MMIN < mu < self.MMAX and sig > 0 and 0 < lam < 1):
            return -np.inf
        # uniform prior boxes of the bench model (reference PR1 example)
        for mu_a, var_a in ((mu_a1, var_a1), (mu_a2, var_a2)):
            if not (0 < mu_a < 1 and 0.005 < var_a < 0.25):
                return -np.inf
            # the (mu, var) -> (alpha, beta) moment map must land in a valid
            # beta distribution: same wall the bench model's NaN->-inf hits
            if var_a >= mu_a * (1.0 - mu_a):
                return -np.inf
        for xi, sct in ((xi_ct1, sig_ct1), (xi_ct2, sig_ct2)):
            if not (0 < xi < 1 and 0.1 < sct < 4.0):
                return -np.inf
        lp = -0.5 * (alpha / 5.0) ** 2 - 0.5 * (beta / 5.0) ** 2 - 0.5 * (lamb / 5.0) ** 2
        lp += -0.5 * (sig / 10.0) ** 2  # HalfNormal(10)
        return lp

    def _log_spin(self, tag, theta):
        """Spin-magnitude + tilt log population density over one bank."""
        (_, _, _, _, _,
         mu_a1, var_a1, mu_a2, var_a2,
         xi_ct1, xi_ct2, sig_ct1, sig_ct2, _) = theta
        a_1, b_1 = beta_ab_from_mu_var(mu_a1, var_a1)
        a_2, b_2 = beta_ab_from_mu_var(mu_a2, var_a2)
        out = log_beta_pdf(getattr(self, f"{tag}_log_a1"), getattr(self, f"{tag}_log_1ma1"), a_1, b_1)
        out += log_beta_pdf(getattr(self, f"{tag}_log_a2"), getattr(self, f"{tag}_log_1ma2"), a_2, b_2)
        out += log_tilt_mixture(getattr(self, f"{tag}_dct2_1"), getattr(self, f"{tag}_ct_insupp_1"), xi_ct1, sig_ct1)
        out += log_tilt_mixture(getattr(self, f"{tag}_dct2_2"), getattr(self, f"{tag}_ct_insupp_2"), xi_ct2, sig_ct2)
        return out

    def log_likelihood(self, theta):
        alpha, beta, mu, sig, lam = theta[:5]
        lamb = theta[13]
        logw_pe = (
            self._log_p_m1q("pe", self.pe_m1, alpha, beta, mu, sig, lam)
            + self._log_spin("pe", theta)
            + self._log_pz_fast("pe", lamb)
            - self.pe_logprior
        )
        logw_inj = (
            self._log_p_m1q("inj", self.inj_m1, alpha, beta, mu, sig, lam)
            + self._log_spin("inj", theta)
            + self._log_pz_fast("inj", lamb)
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


_POOL_POST = None


def _pool_eval(theta):
    return _POOL_POST(theta)


def run_ensemble_parallel(log_post, x0, n_steps=4000, seed=7, a=2.0, progress_every=0, n_procs=2):
    """Goodman & Weare stretch moves with the emcee-style red-black
    (half-ensemble) update: each half proposes against partners drawn from
    the other half, so the half's proposal evaluations are independent and
    can be farmed to a fork-based process pool.  Detailed balance holds per
    half-update (Foreman-Mackey et al. 2013, sec. 3); same stationary
    distribution as :func:`run_ensemble`, different update schedule.

    Returns (chain, acc_rate) with chain shape (n_steps, n_walkers, dim).
    """
    import multiprocessing as mp

    if "fork" not in mp.get_all_start_methods():
        raise RuntimeError(
            "run_ensemble_parallel needs a fork start method (workers inherit "
            "the posterior through the module global); on spawn-only platforms "
            "use run_ensemble or PARITY_PROCS=1"
        )
    global _POOL_POST
    _POOL_POST = log_post  # inherited by fork()ed workers
    ctx = mp.get_context("fork")
    pool = ctx.Pool(n_procs)
    try:
        rng = np.random.default_rng(seed)
        n_walkers, dim = x0.shape
        half = n_walkers // 2
        assert n_walkers % 2 == 0 and half >= 2, "need an even walker count >= 4"
        walkers = x0.copy()
        logp = np.array(pool.map(_pool_eval, list(walkers)))
        chain = np.empty((n_steps, n_walkers, dim))
        halves = (np.arange(0, half), np.arange(half, n_walkers))
        n_acc = 0
        for t in range(n_steps):
            for h in (0, 1):
                act, oth = halves[h], halves[1 - h]
                j = oth[rng.integers(len(oth), size=len(act))]
                zz = (1.0 + (a - 1.0) * rng.random(len(act))) ** 2 / a
                props = walkers[j] + zz[:, None] * (walkers[act] - walkers[j])
                lp_props = np.array(
                    pool.map(_pool_eval, list(props), chunksize=max(1, len(act) // n_procs))
                )
                log_accept = (dim - 1) * np.log(zz) + lp_props - logp[act]
                accept = np.log(rng.random(len(act))) < log_accept
                walkers[act[accept]] = props[accept]
                logp[act[accept]] = lp_props[accept]
                n_acc += int(accept.sum())
            chain[t] = walkers
            if progress_every and (t + 1) % progress_every == 0:
                print(
                    f"  ensemble step {t + 1}/{n_steps} (acc {n_acc / ((t + 1) * n_walkers):.2f})",
                    flush=True,
                )
        return chain, n_acc / (n_steps * n_walkers)
    finally:
        pool.close()
        pool.join()
        _POOL_POST = None


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
