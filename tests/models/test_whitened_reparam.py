"""Whitened (non-centered) coefficient-prior parameterization.

The whitened blocks must imply EXACTLY the centered prior: with
``Lambda = I/sig^2 + tau D^T D = L L^T`` and ``c = L^{-T} u``,

    log p_centered(c(u)) = -0.5 u^T u + const,

so the centered log-joint evaluated at ``c(u)`` minus the whitened log-joint
evaluated at ``u`` is a CONSTANT in ``u`` (for any likelihood, since both see
the same ``c``).  That constant-difference property is the sharp test: any
error in the Cholesky, the triangular solve, the pinned-first handling, or a
missing Jacobian shows up as ``u``-dependence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gwinferno_tpu import ppl
from gwinferno_tpu.models.bsplines.smoothing import prior_precision_cholesky
from gwinferno_tpu.pipeline.utils import bspline_mass_prior
from gwinferno_tpu.pipeline.utils import bspline_redshift_prior
from gwinferno_tpu.pipeline.utils import bspline_spin_prior
from gwinferno_tpu.ppl import log_density


def _fake_likelihood(mass_cs, q_cs, a_cs, tilt_cs, z_cs):
    """An arbitrary smooth pseudo-likelihood coupling all blocks (so the test
    also proves both parameterizations feed identical coefficients through)."""
    ppl.factor(
        "lik",
        jnp.sum(jnp.sin(mass_cs)) - 0.1 * jnp.sum(q_cs**2)
        + jnp.sum(jnp.cos(a_cs) * 0.3) + jnp.sum(tilt_cs * 0.05) + jnp.sum(z_cs**3) * 0.01,
    )


N_M, N_Q, N_A, N_CT, N_Z = 12, 9, 8, 8, 7


def model(reparam):
    mass_cs, q_cs = bspline_mass_prior(m_nsplines=N_M, q_nsplines=N_Q, m_tau=1, q_tau=1, reparam=reparam)
    a_cs, tilt_cs = bspline_spin_prior(a_nsplines=N_A, ct_nsplines=N_CT, a_tau=25, ct_tau=25, IID=True, reparam=reparam)
    z_cs = bspline_redshift_prior(z_nsplines=N_Z, z_tau=1, reparam=reparam)
    _fake_likelihood(mass_cs, q_cs, a_cs, tilt_cs, z_cs)


def _whiten_to_centered(us):
    """Map a whitened params dict to the centered params dict (same c)."""
    specs = {
        "mass_cs": (N_M, 15, 1, 1, False),
        "q_cs": (N_Q, 5, 1, 1, False),
        "a_cs": (N_A, 5, 25, 2, False),
        "tilt_cs": (N_CT, 5, 25, 2, False),
        "z_cs": (N_Z, 1, 1, 2, True),
    }
    out = {}
    for site, (n, sig, tau, deg, pin) in specs.items():
        L = prior_precision_cholesky(n, sig, tau, degree=deg, drop_first=pin)
        out[site] = jnp.linalg.solve(jnp.asarray(L).T, us[site + "_white"])
    return out


def test_centered_minus_whitened_logdensity_is_constant():
    keys = jax.random.split(jax.random.PRNGKey(0), 10)
    diffs = []
    for k in keys:
        us = {}
        for site, n in [("mass_cs", N_M), ("q_cs", N_Q), ("a_cs", N_A),
                        ("tilt_cs", N_CT), ("z_cs", N_Z - 1)]:
            k, sub = jax.random.split(k)
            us[site + "_white"] = 2.0 * jax.random.normal(sub, (n,))
        ld_w, _ = log_density(lambda: model("whitened"), (), {}, us)
        ld_c, _ = log_density(lambda: model("centered"), (), {}, _whiten_to_centered(us))
        diffs.append(float(ld_c - ld_w))
    diffs = np.asarray(diffs)
    assert np.ptp(diffs) < 1e-8, diffs


def test_whitened_deterministic_sites_expose_coefficients():
    us = {}
    for site, n in [("mass_cs", N_M), ("q_cs", N_Q), ("a_cs", N_A),
                    ("tilt_cs", N_CT), ("z_cs", N_Z - 1)]:
        us[site + "_white"] = jnp.linspace(-1.0, 1.0, n)
    with ppl.trace() as tr, ppl.substitute(data=us):
        model("whitened")
    t = tr.trace
    for site in ["mass_cs", "q_cs", "a_cs", "tilt_cs", "z_cs"]:
        assert t[site]["type"] == "deterministic"
    # z_cs deterministic holds the n-1 FREE coefficients (pinned zero is
    # prepended downstream), matching the centered sample-site convention
    assert t["z_cs"]["value"].shape == (N_Z - 1,)
    c = _whiten_to_centered(us)
    np.testing.assert_allclose(np.asarray(t["mass_cs"]["value"]), np.asarray(c["mass_cs"]), rtol=1e-10)


def test_whitened_prior_covariance_matches_centered_precision():
    """Sample the whitened prior analytically: cov(c) must equal Lambda^{-1}."""
    n, sig, tau, deg = 10, 5.0, 25.0, 2
    L = prior_precision_cholesky(n, sig, tau, degree=deg)
    lam = L @ L.T
    # pushforward covariance of c = L^{-T} u, u ~ N(0, I)
    Linv_t = np.linalg.inv(L).T
    cov = Linv_t @ Linv_t.T
    np.testing.assert_allclose(cov @ lam, np.eye(n), atol=1e-9)


def test_unknown_reparam_raises():
    with pytest.raises(ValueError, match="reparam"):
        with ppl.trace(), ppl.seed(rng_seed=0):
            bspline_mass_prior(m_nsplines=5, q_nsplines=None, reparam="bogus")


def test_whitened_sampling_recovers_centered_moments():
    """Short NUTS on a toy posterior in both parameterizations: the implied
    coefficient posteriors must agree in mean within MC error."""
    from gwinferno_tpu.infer import MCMC, NUTS

    def tiny(reparam):
        cs = bspline_mass_prior(m_nsplines=6, q_nsplines=None, m_tau=4, reparam=reparam)
        ppl.factor("lik", -0.5 * jnp.sum((cs - 2.0) ** 2))

    means = {}
    for rp in ["centered", "whitened"]:
        m = MCMC(NUTS(lambda rp=rp: tiny(rp)), num_warmup=300, num_samples=500, num_chains=2)
        m.run(jax.random.PRNGKey(3))
        if rp == "whitened":
            cs = m.get_deterministic(site_names={"mass_cs"})["mass_cs"]
        else:
            cs = m.get_samples()["mass_cs"]
        means[rp] = np.asarray(cs).mean(axis=0)
    np.testing.assert_allclose(means["centered"], means["whitened"], atol=0.15)
