"""Multi-device sharding on the 8-device virtual CPU mesh: mesh construction,
sharded data placement, sharded MCMC runs, and equivalence of the sharded
logsumexp reduction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.special import logsumexp
from jax.sharding import PartitionSpec as P

from gwinferno_tpu import ppl
from gwinferno_tpu.infer import MCMC
from gwinferno_tpu.infer import NUTS
from gwinferno_tpu.parallel import create_mesh
from gwinferno_tpu.parallel import shard_chain_state
from gwinferno_tpu.parallel import shard_data_dict
from gwinferno_tpu.parallel import sharded_logsumexp
from gwinferno_tpu.ppl import distributions as dist

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_create_mesh_shapes():
    mesh = create_mesh(8)
    assert set(mesh.axis_names) == {"chain", "data"}
    assert mesh.shape["chain"] * mesh.shape["data"] == 8
    mesh1 = create_mesh(1)
    assert mesh1.shape["chain"] * mesh1.shape["data"] == 1


def test_shard_data_dict_placement():
    mesh = create_mesh(8)
    d = {"x": jnp.zeros((16, 10)), "y": jnp.zeros((7,))}  # 7 not divisible -> replicated
    sharded = shard_data_dict(mesh, d)
    x_spec = sharded["x"].sharding.spec
    assert x_spec[0] == "data"
    assert sharded["y"].sharding.spec == P(None)


def test_sharded_logsumexp_matches_dense():
    mesh = create_mesh(8, chain_axis_size=1)  # all 8 devices on "data"
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 64))

    from jax.experimental.shard_map import shard_map

    f = shard_map(
        lambda lx: sharded_logsumexp(lx, "data", axis=1),
        mesh=mesh,
        in_specs=P(None, "data"),
        out_specs=P(None),
    )
    got = f(x)
    want = logsumexp(x, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12)


def test_sharded_mcmc_matches_unsharded():
    """Chains sharded over the mesh produce the same draws as unsharded
    (same seeds, same program -- sharding must not change semantics)."""

    def model():
        x = ppl.sample("x", dist.Normal(jnp.zeros(3), jnp.ones(3)))
        ppl.sample("y", dist.Normal(x.sum(), 1.0), obs=jnp.array(0.5))

    kwargs = dict(num_warmup=100, num_samples=100, num_chains=4)
    m1 = MCMC(NUTS(model), **kwargs)
    m1.run(jax.random.PRNGKey(0))
    s1 = np.asarray(m1.get_samples()["x"])

    mesh = create_mesh(8, chain_axis_size=4)
    m2 = MCMC(NUTS(model), mesh=mesh, **kwargs)
    m2.run(jax.random.PRNGKey(0))
    s2 = np.asarray(m2.get_samples()["x"])
    # partitioned reductions reorder float ops; agreement is close but not
    # bitwise (and NUTS trajectories amplify ulp-level differences)
    np.testing.assert_allclose(s1, s2, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(s1.mean(0), s2.mean(0), atol=1e-6)


def test_sharded_hierarchical_step():
    """Full sharded likelihood: events + injections over 'data', chains over
    'chain'; short NUTS run executes and yields finite samples."""
    mesh = create_mesh(8)  # (2, 4) or similar
    rng = np.random.default_rng(0)
    n_obs, n_samp, n_found = 8, 32, 64
    pe = {
        "m": jnp.asarray(rng.normal(1.0, 0.2, (n_obs, n_samp))),
        "prior": jnp.asarray(rng.uniform(0.5, 1.5, (n_obs, n_samp))),
    }
    inj = {
        "m": jnp.asarray(rng.normal(1.0, 0.5, (n_found,))),
        "prior": jnp.asarray(rng.uniform(0.5, 1.5, (n_found,))),
    }
    pe = shard_data_dict(mesh, pe)
    inj = shard_data_dict(mesh, inj)

    from gwinferno_tpu.pipeline.analysis import hierarchical_likelihood

    def model(pe, inj):
        mu = ppl.sample("mu", dist.Normal(1.0, 1.0))
        sig = ppl.sample("sig", dist.HalfNormal(1.0))

        def w(d):
            return jnp.exp(dist.Normal(mu, sig).log_prob(d["m"])) / d["prior"]

        hierarchical_likelihood(
            w(pe), w(inj), total_inj=10.0 * n_found, Nobs=n_obs, Tobs=1.0,
            surveyed_hypervolume=1e9, marginalize_selection=False, min_neff_cut=False,
        )

    nc = 2 * mesh.shape["chain"]
    mcmc = MCMC(NUTS(model, max_tree_depth=5), num_warmup=50, num_samples=50, num_chains=nc,
                collective_adaptation=True, mesh=mesh)
    mcmc.run(jax.random.PRNGKey(1), pe, inj)
    s = np.asarray(mcmc.get_samples()["mu"])
    assert s.shape == (50 * nc,)
    assert np.all(np.isfinite(s))
    assert abs(s.mean() - 1.0) < 0.5
