"""SVI: AutoDelta MAP and AutoNormal variational posterior."""

import jax
import jax.numpy as jnp
import numpy as np

from gwinferno_tpu import ppl
from gwinferno_tpu.infer import SVI
from gwinferno_tpu.infer import AutoDelta
from gwinferno_tpu.infer import Trace_ELBO
from gwinferno_tpu.infer.svi import Adam
from gwinferno_tpu.infer.svi import AutoNormal
from gwinferno_tpu.ppl import distributions as dist

DATA = jnp.array([1.1, 0.9, 1.3, 0.7, 1.0, 1.2, 0.8, 1.0])


def model(data):
    mu = ppl.sample("mu", dist.Normal(0.0, 10.0))
    sigma = ppl.sample("sigma", dist.HalfNormal(5.0))
    ppl.sample("obs", dist.Normal(mu, sigma), obs=data)


def test_autodelta_map():
    guide = AutoDelta(model)
    svi = SVI(model, guide, Adam(0.05), Trace_ELBO())
    result = svi.run(jax.random.PRNGKey(0), 800, DATA)
    est = guide.median(result.params)
    assert abs(float(est["mu"]) - float(DATA.mean())) < 0.02
    assert float(result.losses[-1]) < float(result.losses[0])


def test_autonormal_posterior():
    guide = AutoNormal(model)
    svi = SVI(model, guide, Adam(0.05), Trace_ELBO(num_particles=4))
    result = svi.run(jax.random.PRNGKey(0), 1500, DATA)
    post = guide.sample_posterior(jax.random.PRNGKey(1), result.params, sample_shape=(2000,))
    mu = np.asarray(post["mu"])
    sigma = np.asarray(post["sigma"])
    # analytic posterior of mu | data roughly N(mean, sd/sqrt(n))
    assert abs(mu.mean() - float(DATA.mean())) < 0.1
    assert np.all(sigma > 0)
    assert 0.02 < mu.std() < 0.4  # nonzero but concentrated
