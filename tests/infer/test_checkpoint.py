"""Checkpoint/resume: a resumed run continues exactly from the saved state."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from gwinferno_tpu import ppl
from gwinferno_tpu.infer import MCMC
from gwinferno_tpu.infer import NUTS
from gwinferno_tpu.ppl import distributions as dist
from gwinferno_tpu.utils.checkpoint import load_checkpoint
from gwinferno_tpu.utils.checkpoint import save_checkpoint


def model():
    x = ppl.sample("x", dist.Normal(jnp.zeros(2), jnp.ones(2)))
    ppl.sample("y", dist.Normal(x.sum(), 1.0), obs=jnp.array(0.3))


def test_resume_continues_run():
    mcmc = MCMC(NUTS(model), num_warmup=100, num_samples=50, num_chains=2)
    mcmc.run(jax.random.PRNGKey(0))
    s1 = np.asarray(mcmc.get_samples()["x"])

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        save_checkpoint(path, mcmc)
        resumed = load_checkpoint(path)

        m2 = MCMC(NUTS(model), num_warmup=100, num_samples=50, num_chains=2)
        m2.run(jax.random.PRNGKey(1), post_warmup_state=resumed)
        s2 = np.asarray(m2.get_samples()["x"])

    # same posterior, fresh draws, no warmup repeated
    assert s2.shape == s1.shape
    assert not np.allclose(s1, s2)
    pooled = np.concatenate([s1, s2])
    assert np.all(np.abs(pooled.mean(0) - 0.15) < 0.4)
    # adaptation state carried over
    np.testing.assert_allclose(
        np.asarray(m2._adapt_info["step_size"]), np.asarray(mcmc._adapt_info["step_size"])
    )
