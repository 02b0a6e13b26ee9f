"""Sampler validation against analytic posteriors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gwinferno_tpu import ppl
from gwinferno_tpu.infer import HMC
from gwinferno_tpu.infer import MCMC
from gwinferno_tpu.infer import NUTS
from gwinferno_tpu.infer import SMC
from gwinferno_tpu.infer import find_map
from gwinferno_tpu.infer.diagnostics import effective_sample_size, split_rhat
from gwinferno_tpu.ppl import distributions as dist


def std_normal_model():
    ppl.sample("x", dist.Normal(jnp.zeros(3), jnp.ones(3)))


def correlated_gaussian_model():
    x = ppl.sample("x", dist.Normal(0.0, 1.0))
    ppl.sample("y", dist.Normal(0.9 * x, jnp.sqrt(1 - 0.81)))


def conjugate_model(data):
    # mu ~ N(0, 10); data | mu ~ N(mu, 1)  => analytic Gaussian posterior
    mu = ppl.sample("mu", dist.Normal(0.0, 10.0))
    sigma = ppl.sample("sigma", dist.HalfNormal(5.0))
    ppl.sample("obs", dist.Normal(mu, sigma), obs=data)


def test_nuts_std_normal_moments():
    mcmc = MCMC(NUTS(std_normal_model), num_warmup=300, num_samples=800, num_chains=2)
    mcmc.run(jax.random.PRNGKey(0))
    x = np.asarray(mcmc.get_samples()["x"])
    assert x.shape == (1600, 3)
    assert np.all(np.abs(x.mean(0)) < 0.12)
    assert np.all(np.abs(x.std(0) - 1.0) < 0.12)
    extra = mcmc.get_extra_fields()
    assert int(np.asarray(extra["diverging"]).sum()) == 0
    assert float(np.asarray(extra["accept_prob"]).mean()) > 0.6


def test_nuts_correlated_gaussian_dense_mass():
    mcmc = MCMC(
        NUTS(correlated_gaussian_model, dense_mass=True),
        num_warmup=500,
        num_samples=1000,
        num_chains=2,
    )
    mcmc.run(jax.random.PRNGKey(1))
    s = mcmc.get_samples()
    x, y = np.asarray(s["x"]), np.asarray(s["y"])
    corr = np.corrcoef(x, y)[0, 1]
    assert abs(corr - 0.9) < 0.06
    assert abs(x.std() - 1.0) < 0.12


def test_nuts_conjugate_posterior():
    true_mu, true_sigma = 1.7, 0.8
    data = true_mu + true_sigma * jax.random.normal(jax.random.PRNGKey(42), (200,))
    mcmc = MCMC(NUTS(conjugate_model), num_warmup=400, num_samples=800, num_chains=2)
    mcmc.run(jax.random.PRNGKey(2), data)
    s = mcmc.get_samples()
    mu, sigma = np.asarray(s["mu"]), np.asarray(s["sigma"])
    assert np.all(sigma > 0)
    # posterior concentrates near truth at n=200
    assert abs(mu.mean() - float(data.mean())) < 0.05
    assert abs(sigma.mean() - float(data.std())) < 0.1
    # convergence diagnostics healthy
    mu_bychain = np.asarray(mcmc.get_samples(group_by_chain=True)["mu"])
    assert split_rhat(mu_bychain[:, :, ]) < 1.05
    assert effective_sample_size(mu_bychain) > 200


def test_hmc_std_normal():
    mcmc = MCMC(HMC(std_normal_model, trajectory_length=1.5), num_warmup=300, num_samples=600, num_chains=2)
    mcmc.run(jax.random.PRNGKey(3))
    x = np.asarray(mcmc.get_samples()["x"])
    assert np.all(np.abs(x.mean(0)) < 0.2)
    assert np.all(np.abs(x.std(0) - 1.0) < 0.2)


def test_collective_adaptation_matches():
    mcmc = MCMC(
        NUTS(std_normal_model),
        num_warmup=300,
        num_samples=500,
        num_chains=4,
        collective_adaptation=True,
    )
    mcmc.run(jax.random.PRNGKey(4))
    x = np.asarray(mcmc.get_samples()["x"])
    assert np.all(np.abs(x.mean(0)) < 0.15)
    ss = np.asarray(mcmc._adapt_info["step_size"])
    assert ss.shape == (4,)
    assert np.all(ss > 0)


def test_deterministic_recompute():
    def m():
        x = ppl.sample("x", dist.Normal())
        ppl.deterministic("x2", x * 2.0)

    mcmc = MCMC(NUTS(m), num_warmup=100, num_samples=100)
    mcmc.run(jax.random.PRNGKey(5))
    det = mcmc.get_deterministic()
    x = np.asarray(mcmc.get_samples()["x"])
    np.testing.assert_allclose(np.asarray(det["x2"]), 2 * x, rtol=1e-12)


def test_find_map_gaussian():
    data = jnp.array([1.0, 1.4, 0.9, 1.2])

    def m(data):
        mu = ppl.sample("mu", dist.Normal(0.0, 100.0))
        ppl.sample("obs", dist.Normal(mu, 1.0), obs=data)

    params = find_map(jax.random.PRNGKey(0), m, data, Niter=500, lr=0.05)
    assert abs(float(params["mu"]) - float(data.mean())) < 0.02


def test_smc_gaussian_moments():
    smc = SMC(correlated_gaussian_model, num_particles=2000, num_mutation_steps=5)
    res = smc.run(jax.random.PRNGKey(0))
    x = np.asarray(res.particles["x"])
    y = np.asarray(res.particles["y"])
    assert abs(x.mean()) < 0.15
    assert abs(x.std() - 1.0) < 0.15
    assert abs(np.corrcoef(x, y)[0, 1] - 0.9) < 0.1
    assert int(res.num_stages) >= 1
    assert np.isfinite(float(res.log_evidence))


def test_ess_of_iid_draws():
    x = np.random.default_rng(0).normal(size=(2, 2000))
    ess = effective_sample_size(x)
    assert 2500 < ess < 5500
    assert split_rhat(x) < 1.01


def test_smc_multimodal_bspline_posterior():
    """SMC on a deliberately multimodal posterior (a mixture built from a
    B-spline pdf): both modes populated, evidence finite
    (BASELINE configs[4] shape)."""

    def bimodal():
        x = ppl.sample("x", dist.Normal(0.0, 3.0))
        # double-well likelihood: modes near +/-2
        ppl.factor("wells", -((x**2 - 4.0) ** 2) / 4.0)

    smc = SMC(bimodal, num_particles=3000, num_mutation_steps=5)
    res = smc.run(jax.random.PRNGKey(2))
    x = np.asarray(res.particles["x"])
    frac_pos = float((x > 0).mean())
    assert 0.25 < frac_pos < 0.75, f"mode collapse: {frac_pos}"
    assert abs(abs(x).mean() - 2.0) < 0.3
    assert np.isfinite(float(res.log_evidence))


def test_smc_sharded_particles():
    from gwinferno_tpu.parallel import create_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = create_mesh(8, chain_axis_size=8, axis_names=("chain", "data"))

    smc = SMC(correlated_gaussian_model, num_particles=2048, num_mutation_steps=3, mesh=mesh)
    res = smc.run(jax.random.PRNGKey(3))
    x = np.asarray(res.particles["x"])
    assert abs(x.mean()) < 0.2
    assert abs(x.std() - 1.0) < 0.2


def test_smc_sharded_matches_unsharded():
    """The sharded run is the SAME program distributed (explicit moment-sum
    covariance + collective reductions), so with one seed the particle set
    must match the unsharded run to float tolerance -- the SMC analogue of
    test_sharded_mcmc_matches_unsharded."""
    from gwinferno_tpu.parallel import create_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = create_mesh(8, chain_axis_size=8, axis_names=("chain", "data"))

    kwargs = dict(num_particles=512, num_mutation_steps=3)
    r1 = SMC(correlated_gaussian_model, **kwargs).run(jax.random.PRNGKey(5))
    r2 = SMC(correlated_gaussian_model, mesh=mesh, **kwargs).run(jax.random.PRNGKey(5))
    for k in r1.particles:
        np.testing.assert_allclose(
            np.asarray(r1.particles[k]), np.asarray(r2.particles[k]), rtol=1e-8, atol=1e-8
        )
    np.testing.assert_allclose(float(r1.log_evidence), float(r2.log_evidence), rtol=1e-8)
    assert int(r1.num_stages) == int(r2.num_stages)


def test_find_reasonable_step_size_moves():
    """Regression: the double/halve loop must actually iterate (a condition
    bug made it return the initial step size after one evaluation)."""
    import jax
    import jax.numpy as jnp

    from gwinferno_tpu.infer.hmc_util import find_reasonable_step_size, identity_mass_matrix

    dim = 4
    mm = identity_mass_matrix(dim, dtype=jnp.float64)
    z = jnp.zeros(dim, jnp.float64)

    # stiff target: unit step is far too large and must shrink
    stiff = lambda x: 0.5 * jnp.sum((x / 1e-3) ** 2)
    ss = float(find_reasonable_step_size(stiff, mm, z, jax.random.PRNGKey(0), init_step_size=1.0))
    assert ss < 0.5, ss

    # loose target: a tiny initial step must grow
    loose = lambda x: 0.5 * jnp.sum((x / 10.0) ** 2)
    ss = float(find_reasonable_step_size(loose, mm, z, jax.random.PRNGKey(0), init_step_size=1e-6))
    assert ss > 1e-4, ss


def test_per_chain_init_params():
    """init_params values may carry a per-chain leading axis (jittered
    overdispersed starts); scalars broadcast as before."""

    def model():
        ppl.sample("x", dist.Normal(0.0, 1.0))
        ppl.sample("y", dist.HalfNormal(2.0))

    nc = 4
    init = {"x": jnp.arange(nc) * 0.1, "y": jnp.full((), 1.5)}
    m = MCMC(NUTS(model), num_warmup=0, num_samples=1, num_chains=nc,
             thinning=1)
    # no warmup + no adaptation: chain 0's first state starts from its own init
    m.kernel.adapt_step_size = False
    m.kernel.adapt_mass_matrix = False
    m.kernel.step_size = 1e-9  # effectively frozen: samples == inits
    m.run(jax.random.PRNGKey(0), init_params=init)
    s = m.get_samples(group_by_chain=True)
    assert s["x"].shape == (nc, 1)
    np.testing.assert_allclose(np.asarray(s["x"][:, 0]), np.arange(nc) * 0.1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s["y"][:, 0]), 1.5, rtol=1e-5)
