"""Welford estimator invariants, incl. the Chan parallel combine used by
collective adaptation (VERDICT r1 weak #5: naive moment averaging dropped the
between-chain mean-dispersion term)."""

import jax
import jax.numpy as jnp
import numpy as np

from gwinferno_tpu.infer.hmc_util import welford_covariance
from gwinferno_tpu.infer.hmc_util import welford_init
from gwinferno_tpu.infer.hmc_util import welford_pool
from gwinferno_tpu.infer.hmc_util import welford_update


def _feed(dim, dense, draws):
    wf = welford_init(dim, dense, jnp.float64)
    for x in draws:
        wf = welford_update(wf, jnp.asarray(x))
    return wf


def test_welford_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(40, 3)) @ np.diag([1.0, 0.3, 2.0])
    wf = _feed(3, True, x)
    cov = np.asarray(welford_covariance(wf, regularize=False))
    np.testing.assert_allclose(cov, np.cov(x, rowvar=False), rtol=1e-12)


def test_welford_pool_equals_single_pass():
    """Pooling per-chain states (Chan combine) == one Welford over ALL
    chains' draws concatenated -- including chains with very different means,
    where the between-chain term dominates."""
    rng = np.random.default_rng(1)
    nc, n, dim = 4, 25, 3
    # chains deliberately NOT mixed: distinct means, distinct scales
    draws = np.stack(
        [rng.normal(loc=5.0 * c, scale=1.0 + c, size=(n, dim)) for c in range(nc)]
    )  # (nc, n, dim)

    for dense in (False, True):
        per_chain = [_feed(dim, dense, draws[c]) for c in range(nc)]
        batched = jax.tree.map(lambda *xs: jnp.stack(xs), *per_chain)
        pooled = welford_pool(batched)
        single = _feed(dim, dense, draws.reshape(nc * n, dim))
        np.testing.assert_allclose(np.asarray(pooled.mean), np.asarray(single.mean), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(pooled.m2), np.asarray(single.m2), rtol=1e-10)
        assert float(pooled.count) == float(single.count)
        np.testing.assert_allclose(
            np.asarray(welford_covariance(pooled, regularize=False)),
            np.asarray(welford_covariance(single, regularize=False)),
            rtol=1e-10,
        )


def test_welford_pool_beats_naive_averaging():
    """The regression the Chan combine fixes: with unmixed chains, naive
    averaging of per-chain m2 underestimates the pooled variance."""
    rng = np.random.default_rng(2)
    nc, n, dim = 4, 50, 2
    draws = np.stack([rng.normal(loc=10.0 * c, size=(n, dim)) for c in range(nc)])
    per_chain = [_feed(dim, False, draws[c]) for c in range(nc)]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *per_chain)
    pooled_var = np.asarray(welford_covariance(welford_pool(batched), regularize=False))
    naive_var = np.asarray(jnp.mean(batched.m2, axis=0) / (n - 1.0))
    true_var = np.var(draws.reshape(-1, dim), axis=0, ddof=1)
    np.testing.assert_allclose(pooled_var, true_var, rtol=1e-10)
    assert (naive_var < 0.2 * true_var).all()  # naive misses the spread entirely
