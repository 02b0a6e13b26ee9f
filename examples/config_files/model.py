"""Example user model for the ``python_file`` config escape hatch.

The reference's example model (examples/config_files/model.py) passes stale
kwargs and indexes a Distribution (SURVEY.md S7.3 item 7); this version
implements the intended semantics against the current library surface.
"""

import jax.numpy as jnp

from gwinferno_tpu import ppl
from gwinferno_tpu.pipeline.analysis import hierarchical_likelihood
from gwinferno_tpu.population_distributions import Powerlaw
from gwinferno_tpu.population_distributions import PowerlawRedshift
from gwinferno_tpu.ppl import distributions as dist


def model(samps, injs, Ninj, Nobs, Tobs):
    alpha = ppl.sample("alpha", dist.Normal(0.0, 3.0))
    beta = ppl.sample("beta", dist.Normal(0.0, 3.0))
    lamb = ppl.sample("lamb", dist.Normal(0.0, 3.0))

    mass_dist = Powerlaw(alpha, minimum=5.0, maximum=100.0, low=2.0, high=100.0)
    q_dist = Powerlaw(beta, minimum=0.02, maximum=1.0)
    zgrid = jnp.linspace(1e-9, 2.3, 1000)
    z_dist = PowerlawRedshift(lamb, maximum=2.3, zgrid=zgrid)

    def log_weights(d):
        lw = mass_dist.log_prob(d["mass_1"]) + q_dist.log_prob(d["mass_ratio"]) + z_dist.log_prob(d["redshift"])
        return lw - jnp.log(d["prior"])

    hierarchical_likelihood(
        log_weights(samps),
        log_weights(injs),
        total_inj=Ninj,
        Nobs=Nobs,
        Tobs=Tobs,
        surveyed_hypervolume=z_dist.norm,
        marginalize_selection=False,
        min_neff_cut=False,
        log=True,
    )
