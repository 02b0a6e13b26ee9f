"""MixtureGeneral: the numpyro mixture surface the config schema's mixture
blocks instantiate (spec.model(mixing_dist, components))."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

from gwinferno_tpu.ppl.distributions import Categorical
from gwinferno_tpu.ppl.distributions import MixtureGeneral
from gwinferno_tpu.ppl.distributions import Normal
from gwinferno_tpu.ppl.distributions import TruncatedNormal
from gwinferno_tpu.ppl.distributions import Uniform


def test_log_prob_is_weighted_density():
    mix = MixtureGeneral(
        Categorical(probs=jnp.array([0.3, 0.7])),
        [Normal(-1.0, 0.5), Normal(2.0, 1.5)],
    )
    x = np.linspace(-4, 6, 101)
    want = 0.3 * stats.norm.pdf(x, -1.0, 0.5) + 0.7 * stats.norm.pdf(x, 2.0, 1.5)
    np.testing.assert_allclose(np.exp(np.asarray(mix.log_prob(jnp.asarray(x)))), want, rtol=1e-10)


def test_sample_moments_and_support():
    mix = MixtureGeneral(
        Categorical(probs=jnp.array([0.25, 0.75])),
        [Uniform(0.0, 1.0), TruncatedNormal(3.0, 0.5, low=2.0, high=4.0)],
    )
    x = np.asarray(mix.sample(jax.random.PRNGKey(0), (40_000,)))
    assert x.min() >= 0.0 and x.max() <= 4.0
    frac_low = float((x <= 1.0).mean())
    assert abs(frac_low - 0.25) < 0.02
    # support comes from the first component
    assert mix.support.low == 0.0


def test_grad_through_mixture_weights_and_components():
    def loss(lam, mu):
        mix = MixtureGeneral(
            Categorical(probs=jnp.stack([lam, 1.0 - lam])),
            [Normal(mu, 1.0), Normal(0.0, 2.0)],
        )
        return -jnp.sum(mix.log_prob(jnp.array([0.5, -1.0, 2.0])))

    g = jax.grad(loss, argnums=(0, 1))(jnp.float64(0.4), jnp.float64(1.0))
    assert np.isfinite(np.asarray(g)).all()


def test_mixture_config_roundtrip(tmp_path):
    """A powerlaw+peak mass mixture expressed in the CONFIG schema (the
    reference's numpyro.distributions.MixtureGeneral dotted path) parses,
    constructs, and evaluates to a finite log density."""
    import os

    from gwinferno_tpu import ppl
    from gwinferno_tpu.pipeline.analysis import construct_hierarchical_model
    from gwinferno_tpu.pipeline.parser import ConfigReader
    from gwinferno_tpu.pipeline.utils import load_pe_and_injections_as_dict

    cfg = tmp_path / "mix.yml"
    cfg.write_text(
        """
label: mixture_roundtrip
outdir: /tmp/mixture_roundtrip

models:
  mass_1:
    model: numpyro.distributions.MixtureGeneral
    mixture_dist:
      model: numpyro.distributions.Categorical
      hyper_params:
        probs:
          value: [0.75, 0.25]
    component_1:
      model: gwinferno.numpyro_distributions.Powerlaw
      hyper_params:
        alpha:
          prior: numpyro.distributions.Normal
          prior_params: {loc: 0.0, scale: 3.0}
        minimum: {value: 5.0}
        maximum: {value: 100.0}
    component_2:
      model: numpyro.distributions.TruncatedNormal
      hyper_params:
        loc: {value: 35.0}
        scale: {value: 5.0}
        low: {value: 5.0}
        high: {value: 100.0}
  mass_ratio:
    model: gwinferno.numpyro_distributions.Powerlaw
    hyper_params:
      alpha: {value: 1.0}
      minimum: {value: 0.02}
      maximum: {value: 1.0}
  redshift:
    model: gwinferno.numpyro_distributions.PowerlawRedshift
    hyper_params:
      lamb: {value: 1.7}
      maximum: {value: 2.3}

likelihood:
  min_neff_cut: false
  posterior_predictive_check: false
"""
    )
    reader = ConfigReader()
    reader.parse(str(cfg))
    reader.priors["redshift_maximum"] = 2.3
    model = construct_hierarchical_model(reader.models, reader.priors, **reader.likelihood_kwargs)

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    pe_file = os.path.join(repo, "tests", "data", "pe_inj_config_val.h5")
    pedict, injdict, constants, _ = load_pe_and_injections_as_dict(pe_file)
    args = (pedict, injdict, constants["total_inj"], constants["nObs"], constants["obs_time"])
    params = {"mass_1_component_1_alpha": jnp.array(-2.0), "unscaled_rate": jnp.array(40.0)}
    ld, _ = ppl.log_density(model, args, {}, params)
    assert np.isfinite(float(ld))
    g = jax.grad(lambda a: ppl.log_density(model, args, {},
                 {"mass_1_component_1_alpha": a, "unscaled_rate": jnp.array(40.0)})[0])(jnp.array(-2.0))
    assert np.isfinite(float(g))
