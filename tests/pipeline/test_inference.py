"""Hierarchical-likelihood inference smoke tests on real catalog data.

Mirrors the reference's key test pattern (tests/inference_test.py:313-347):
evaluate the potential energy and its gradient at a known-good point and
assert finiteness -- plus a short real NUTS run (the reference skips these as
'slow'; ours are fast enough to keep on).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gwinferno_tpu import ppl
from gwinferno_tpu.infer import MCMC
from gwinferno_tpu.infer import NUTS
from gwinferno_tpu.models.parametric.parametric import PowerlawRedshiftModel
from gwinferno_tpu.models.parametric.parametric import powerlaw_primary_ratio_pdf
from gwinferno_tpu.pipeline.analysis import detection_efficiency
from gwinferno_tpu.pipeline.analysis import hierarchical_likelihood
from gwinferno_tpu.pipeline.analysis import per_event_log_bayes_factors
from gwinferno_tpu.pipeline.utils import load_pe_and_injections_as_dict
from gwinferno_tpu.ppl import distributions as dist

MMIN, MMAX = 5.0, 100.0


@pytest.fixture(scope="module")
def data(pe_inj_file):
    pedict, injdict, constants, param_names = load_pe_and_injections_as_dict(pe_inj_file)
    # subsample PE banks for speed (reference does the same, inference_test.py:74-82)
    rng = np.random.default_rng(0)
    idx = rng.choice(pedict["mass_1"].shape[1], size=100, replace=False)
    pedict = {k: v[:, idx] for k, v in pedict.items()}
    return pedict, injdict, constants


def make_model(pedict, injdict, constants, z_model, log=False, min_neff_cut=False):
    Nobs = constants["nObs"]
    total_inj = constants["total_inj"]
    Tobs = constants["obs_time"]

    def model():
        alpha = ppl.sample("alpha", dist.Normal(0.0, 2.0))
        beta = ppl.sample("beta", dist.Normal(0.0, 2.0))
        lamb = ppl.sample("lamb", dist.Normal(0.0, 2.0))

        def get_weights(m1, q, z, prior):
            p_m1q = powerlaw_primary_ratio_pdf(m1, q, alpha=alpha, beta=beta, mmin=MMIN, mmax=MMAX)
            p_z = z_model(z, lamb)
            wts = p_m1q * p_z / prior
            return jnp.where(jnp.isnan(wts) | jnp.isinf(wts), 0.0, wts)

        peweights = get_weights(pedict["mass_1"], pedict["mass_ratio"], pedict["redshift"], pedict["prior"])
        injweights = get_weights(injdict["mass_1"], injdict["mass_ratio"], injdict["redshift"], injdict["prior"])
        if log:
            peweights, injweights = jnp.log(peweights), jnp.log(injweights)
        hierarchical_likelihood(
            peweights,
            injweights,
            total_inj=total_inj,
            Nobs=Nobs,
            Tobs=Tobs,
            surveyed_hypervolume=z_model.normalization(lamb),
            marginalize_selection=False,
            min_neff_cut=min_neff_cut,
            posterior_predictive_check=True,
            pedata=pedict,
            injdata=injdict,
            param_names=["mass_1", "mass_ratio", "redshift"],
            m1min=MMIN,
            m2min=MMIN,
            mmax=MMAX,
            log=log,
        )

    return model


TEST_PARAMS = {"alpha": jnp.array(3.5), "beta": jnp.array(1.1), "lamb": jnp.array(2.9), "unscaled_rate": jnp.array(30.0)}


@pytest.mark.parametrize("log", [False, True])
def test_potential_energy_and_grad_finite(data, log):
    pedict, injdict, constants = data
    z_model = PowerlawRedshiftModel(pedict["redshift"], injdict["redshift"])
    model = make_model(pedict, injdict, constants, z_model, log=log)
    params_u = ppl.unconstrain_fn(model, (), {}, TEST_PARAMS)
    pe, grad = jax.value_and_grad(lambda p: ppl.potential_energy(model, (), {}, p))(params_u)
    gflat, _ = jax.flatten_util.ravel_pytree(grad)
    assert np.isfinite(float(pe)), "potential energy not finite at test point"
    if not log:
        # log mode differentiates through log(0) weights at truncated samples;
        # the reference documents the same caveat (analysis.py:64-65) and only
        # samples in linear mode -- we assert grad-finiteness there.
        assert np.all(np.isfinite(np.asarray(gflat))), "gradient not finite at test point"


def test_log_and_linear_agree(data):
    pedict, injdict, constants = data
    z_model = PowerlawRedshiftModel(pedict["redshift"], injdict["redshift"])
    m_lin = make_model(pedict, injdict, constants, z_model, log=False)
    m_log = make_model(pedict, injdict, constants, z_model, log=True)
    params_u = ppl.unconstrain_fn(m_lin, (), {}, TEST_PARAMS)
    pe_lin = float(ppl.potential_energy(m_lin, (), {}, params_u))
    pe_log = float(ppl.potential_energy(m_log, (), {}, params_u))
    assert abs(pe_lin - pe_log) < 1e-6 * abs(pe_lin)


def test_reductions_match_bruteforce():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.uniform(0.1, 2.0, size=(7, 53)))
    logBFs, logneff, var = per_event_log_bayes_factors(w, log=False)
    logBFs2, logneff2, var2 = per_event_log_bayes_factors(jnp.log(w), log=True)
    np.testing.assert_allclose(np.asarray(logBFs), np.asarray(logBFs2), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(logneff), np.asarray(logneff2), rtol=1e-10)
    want = np.log(np.asarray(w).sum(axis=1) / 53)
    np.testing.assert_allclose(np.asarray(logBFs), want, rtol=1e-12)

    iw = jnp.asarray(rng.uniform(0.01, 1.0, size=311))
    mu, neff, v = detection_efficiency(iw, 1000.0, log=False)
    mu2, neff2, v2 = detection_efficiency(jnp.log(iw), 1000.0, log=True)
    np.testing.assert_allclose(float(mu), float(mu2), rtol=1e-10)
    np.testing.assert_allclose(float(mu), np.log(np.asarray(iw).sum() / 1000.0), rtol=1e-12)


def test_min_neff_cut_wall(data):
    pedict, injdict, constants = data
    z_model = PowerlawRedshiftModel(pedict["redshift"], injdict["redshift"])
    model = make_model(pedict, injdict, constants, z_model, log=True, min_neff_cut=True)
    # absurd hyperparams -> tiny n_eff -> the wall must yield -inf log_l, not nan
    bad = {"alpha": jnp.array(-12.0), "beta": jnp.array(9.0), "lamb": jnp.array(8.0), "unscaled_rate": jnp.array(30.0)}
    params_u = ppl.unconstrain_fn(model, (), {}, bad)
    pe = float(ppl.potential_energy(model, (), {}, params_u))
    assert not np.isnan(pe)


def test_mutual_exclusion_rule(data):
    pedict, injdict, constants = data
    z_model = PowerlawRedshiftModel(pedict["redshift"], injdict["redshift"])
    with pytest.raises(ValueError):
        hierarchical_likelihood(
            jnp.zeros((2, 3)),
            jnp.zeros(4),
            total_inj=10.0,
            Nobs=2,
            Tobs=1.0,
            surveyed_hypervolume=1.0,
            max_variance_cut=True,
            min_neff_cut=True,
        )


def test_short_nuts_run(data):
    pedict, injdict, constants = data
    z_model = PowerlawRedshiftModel(pedict["redshift"], injdict["redshift"])
    model = make_model(pedict, injdict, constants, z_model, log=False)
    mcmc = MCMC(NUTS(model, max_tree_depth=6), num_warmup=100, num_samples=100, num_chains=1)
    mcmc.run(jax.random.PRNGKey(7))
    s = mcmc.get_samples()
    assert s["alpha"].shape == (100,)
    assert np.all(np.isfinite(np.asarray(s["alpha"])))
    # sane posterior: concentrated well inside the Normal(0,2) prior support
    # (exact location depends on the synthetic selection function)
    assert -8.0 < float(np.mean(s["alpha"])) < 2.0
    assert 0.0 < float(np.std(s["alpha"])) < 1.0
    extra = mcmc.get_extra_fields()
    assert float(np.asarray(extra["accept_prob"]).mean()) > 0.5
    # deterministic diagnostics ride along (reference parity)
    det = mcmc.get_deterministic(site_names={"rate", "log_nEff_inj", "detection_efficiency"})
    assert np.all(np.isfinite(np.asarray(det["rate"])))
    assert np.all(np.asarray(det["detection_efficiency"]) > 0)


def test_categorical_subpopulations_draw_per_event_assignments():
    """categorical=True mixes two weight banks through latent per-event
    assignments Qs (reference analysis.py:248-252). The Qs site must carry
    ONE assignment PER EVENT -- the plate contract; a scalar draw broadcast
    over events silently collapses the mixture."""
    E, S = 8, 40
    rng = np.random.default_rng(0)
    pe = [jnp.asarray(rng.uniform(0.5, 1.5, (E, S))), jnp.asarray(rng.uniform(0.5, 1.5, (E, S)))]
    inj = jnp.asarray(rng.uniform(0.5, 1.5, 300))

    def m():
        hierarchical_likelihood(
            pe, inj, total_inj=1000.0, Nobs=E, Tobs=1.0,
            surveyed_hypervolume=jnp.asarray(1e9), categorical=True,
            pop_frac=[0.5, 0.5], rngkey=jax.random.PRNGKey(4),
            reconstruct_rate=True, min_neff_cut=False,
            posterior_predictive_check=False, log=False,
        )

    with ppl.trace() as tr, ppl.seed(rng_seed=0):
        m()
    qs = np.asarray(tr.trace["Qs"]["value"])
    assert qs.shape == (E,)
    assert set(np.unique(qs)) <= {0, 1}
    assert len(np.unique(qs)) == 2  # both subpopulations actually drawn
    assert np.isfinite(float(tr.trace["log_l"]["value"]))
