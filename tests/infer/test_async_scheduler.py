"""The continuous-batching (async) chain scheduler is a pure reschedule:
its samples, extra fields, and adaptation results must be BIT-IDENTICAL to
the sync fused scan (same per-(step, chain) key table, same per-chain update
order) -- only the wall-clock scheduling of leapfrog work differs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gwinferno_tpu import ppl
from gwinferno_tpu.infer import MCMC
from gwinferno_tpu.infer import NUTS
from gwinferno_tpu.ppl import distributions as dist


def funnelish_model():
    # varying curvature -> strongly varying tree depths across chains/steps,
    # the regime the async scheduler exists for
    log_s = ppl.sample("log_s", dist.Normal(0.0, 1.0))
    ppl.sample("x", dist.Normal(jnp.zeros(4), jnp.exp(0.5 * log_s) * jnp.ones(4)))


def _run(scheduler, **kw):
    mcmc = MCMC(
        NUTS(funnelish_model, max_tree_depth=6, dense_mass=kw.pop("dense_mass", False)),
        num_warmup=kw.pop("num_warmup", 120),
        num_samples=kw.pop("num_samples", 80),
        num_chains=kw.pop("num_chains", 4),
        chain_scheduler=scheduler,
        **kw,
    )
    mcmc.run(jax.random.PRNGKey(7))
    return mcmc


def _assert_identical(a, b):
    sa, sb = a.get_samples(group_by_chain=True), b.get_samples(group_by_chain=True)
    assert set(sa) == set(sb)
    for k in sa:
        np.testing.assert_array_equal(np.asarray(sa[k]), np.asarray(sb[k]), err_msg=k)
    ea, eb = a.get_extra_fields(), b.get_extra_fields()
    for k in ("num_steps", "tree_depth", "diverging", "accept_prob", "energy", "potential_energy"):
        np.testing.assert_array_equal(np.asarray(ea[k]), np.asarray(eb[k]), err_msg=k)
    np.testing.assert_array_equal(
        np.asarray(a.post_warmup_state["step_size"]), np.asarray(b.post_warmup_state["step_size"])
    )
    np.testing.assert_array_equal(
        np.asarray(a.post_warmup_state["inverse_mass_matrix"]),
        np.asarray(b.post_warmup_state["inverse_mass_matrix"]),
    )


def test_async_bitwise_equals_sync():
    _assert_identical(_run("sync"), _run("async"))


def test_leapfrogs_per_round_bitwise_identical():
    """L masked substeps per round only reschedule wall-clock work: the
    realized sample stream, extra fields, and adaptation state must be
    BIT-IDENTICAL to L=1 (and hence to the sync scan) for every L."""
    base = _run("async", leapfrogs_per_round=1)
    for L in (2, 4, 7):
        _assert_identical(base, _run("async", leapfrogs_per_round=L))


def test_leapfrogs_per_round_collective_bitwise_identical():
    """The window-barrier collective path must also be invariant to L
    (parked lanes stay parked across substeps; the pooled close still fires
    the round the last chain crosses the boundary)."""

    def run(L):
        m = MCMC(
            NUTS(funnelish_model, max_tree_depth=6, adapt_step_size=False, step_size=0.2),
            num_warmup=120, num_samples=80, num_chains=4,
            collective_adaptation=True, chain_scheduler="async",
            leapfrogs_per_round=L,
        )
        m.run(jax.random.PRNGKey(7))
        return m

    _assert_identical(run(1), run(5))


def test_leapfrogs_per_round_guards():
    with pytest.raises(ValueError):
        MCMC(NUTS(funnelish_model), num_chains=4, leapfrogs_per_round=0)
    m = MCMC(NUTS(funnelish_model), num_chains=4, chain_scheduler="sync", leapfrogs_per_round=4)
    with pytest.raises(ValueError):
        m._resolve_leapfrogs_per_round(False, 4)


def test_async_equals_sync_dense_mass_to_ulp():
    """Dense mass: the batched Cholesky fuses differently in the two program
    structures, so XLA rounding differs at the ULP level (measured 2e-16 on
    the mass matrix); adaptation state must agree to ~ULP and the short
    sample window to the trajectory amplification of that seed difference."""
    a, b = _run("sync", dense_mass=True, num_samples=20), _run("async", dense_mass=True, num_samples=20)
    np.testing.assert_allclose(
        np.asarray(a.post_warmup_state["inverse_mass_matrix"]),
        np.asarray(b.post_warmup_state["inverse_mass_matrix"]),
        rtol=1e-12, atol=1e-14,
    )
    np.testing.assert_allclose(
        np.asarray(a.post_warmup_state["step_size"]),
        np.asarray(b.post_warmup_state["step_size"]),
        rtol=1e-7,
    )
    sa, sb = a.get_samples(), b.get_samples()
    for k in sa:
        np.testing.assert_allclose(np.asarray(sa[k]), np.asarray(sb[k]), atol=5e-3, err_msg=k)


def test_async_bitwise_equals_sync_segmented():
    """Segmented dispatch (max_steps_per_call) crosses segment seams at
    arbitrary points of the warmup schedule; the equivalence must survive."""
    _assert_identical(
        _run("sync", max_steps_per_call=17), _run("async", max_steps_per_call=17)
    )


def test_auto_resolves_async_for_vectorized_nuts():
    m = MCMC(NUTS(funnelish_model), num_chains=4)
    assert m._resolve_scheduler(4) is True
    m2 = MCMC(NUTS(funnelish_model), num_chains=4, collective_adaptation=True)
    assert m2._resolve_scheduler(4) is False
    m3 = MCMC(NUTS(funnelish_model), num_chains=1)
    assert m3._resolve_scheduler(1) is False


def test_async_rejects_sequential():
    m = MCMC(NUTS(funnelish_model), num_chains=2, chain_method="sequential", chain_scheduler="async")
    with pytest.raises(ValueError):
        m._resolve_scheduler(2)


def test_async_collective_bitwise_equals_sync_when_ss_fixed():
    """With adapt_step_size=False (and diag mass) the ONLY adaptation is the
    pooled Welford mass matrix, whose async window-barrier close is designed
    to be identical to the lockstep collective engine's -- so the full runs
    must be bit-identical."""

    def run(scheduler):
        m = MCMC(
            NUTS(funnelish_model, max_tree_depth=6, adapt_step_size=False, step_size=0.2),
            num_warmup=120, num_samples=80, num_chains=4,
            collective_adaptation=True, chain_scheduler=scheduler,
        )
        m.run(jax.random.PRNGKey(7))
        return m

    _assert_identical(run("sync"), run("async"))


def test_async_collective_adaptive_ss_statistics():
    """Full async-collective (adaptive per-chain step size + pooled mass
    matrix): valid posterior statistics.  Not bit-comparable to the sync
    collective engine, whose dual averaging pools the per-step mean accept
    (documented deviation)."""
    m = MCMC(
        NUTS(lambda: ppl.sample("x", dist.Normal(jnp.zeros(3), jnp.ones(3))), max_tree_depth=6),
        num_warmup=250, num_samples=400, num_chains=4,
        collective_adaptation=True, chain_scheduler="async",
    )
    m.run(jax.random.PRNGKey(3))
    x = np.asarray(m.get_samples()["x"])
    assert np.all(np.abs(x.mean(0)) < 0.15)
    assert np.all(np.abs(x.std(0) - 1.0) < 0.15)
    # the pooled close must leave every chain with the SAME mass matrix
    mm = np.asarray(m.post_warmup_state["inverse_mass_matrix"])
    assert np.allclose(mm, mm[:1])


def test_async_collective_sharded_matches_unsharded():
    """Async-collective under a chain-sharded mesh is the SAME program as
    unsharded -- but partitioned reductions reorder floats and NUTS dynamics
    amplify single accept/reject boundary flips into macroscopically
    different (equally valid) draws within ~100 steps, for the sync engine
    just as much (measured).  The honest invariants: the sharded run
    completes, every chain carries the SAME pooled mass matrix, and the
    posterior moments agree within MC error."""
    from gwinferno_tpu.parallel import create_mesh

    def gauss_model():
        x = ppl.sample("x", dist.Normal(jnp.zeros(4), jnp.ones(4)))
        ppl.sample("y", dist.Normal(x.sum(), 1.0), obs=jnp.array(0.5))

    def run(mesh):
        m = MCMC(
            NUTS(gauss_model, max_tree_depth=6),
            num_warmup=300, num_samples=400, num_chains=4,
            collective_adaptation=True, chain_scheduler="async", mesh=mesh,
        )
        m.run(jax.random.PRNGKey(5))
        return m

    a, b = run(None), run(create_mesh(8, chain_axis_size=4))
    sa = np.asarray(a.get_samples()["x"])
    sb = np.asarray(b.get_samples()["x"])
    np.testing.assert_allclose(sa.mean(0), sb.mean(0), atol=0.12)
    np.testing.assert_allclose(sa.std(0), sb.std(0), atol=0.12)
    for m in (a, b):
        mm = np.asarray(m.post_warmup_state["inverse_mass_matrix"])
        assert np.allclose(mm, mm[:1])
    # pooled mass matrices from the two runs estimate the same posterior
    # covariance diagonal from the same warmup schedule
    ma = np.asarray(a.post_warmup_state["inverse_mass_matrix"])[0]
    mb = np.asarray(b.post_warmup_state["inverse_mass_matrix"])[0]
    np.testing.assert_allclose(ma, mb, rtol=0.5)


def test_async_grouped_leapfrogs_statistics():
    """chain_groups under the async scheduler re-tiles the round's leapfrog
    batch (lax.map over sub-batches) for the >16-lane fusion cliff
    (docs/chain_scaling.json).  XLA accumulates the re-tiled reductions in a
    different order, and warmup amplifies that rounding into macroscopically
    different (but equally valid) adaptation -- so the pin here is
    statistical correctness + determinism, not numeric identity."""

    def run_grouped():
        m = MCMC(
            NUTS(lambda: ppl.sample("x", dist.Normal(jnp.zeros(3), jnp.ones(3))), max_tree_depth=6),
            num_warmup=250, num_samples=400, num_chains=4,
            chain_scheduler="async", chain_groups=2,
        )
        m.run(jax.random.PRNGKey(11))
        return m

    m = run_grouped()
    x = np.asarray(m.get_samples()["x"])
    assert np.all(np.abs(x.mean(0)) < 0.15)
    assert np.all(np.abs(x.std(0) - 1.0) < 0.15)
    assert int(np.asarray(m.get_extra_fields()["diverging"]).sum()) == 0
    # same config, same seed -> identical draws (the grouped program is
    # deterministic even though it differs from the flat tiling)
    m2 = run_grouped()
    np.testing.assert_array_equal(x, np.asarray(m2.get_samples()["x"]))


def test_chain_batch_size_dispatch():
    """chain_batch_size=B runs the vectorized engine in sequential B-chain
    batches reusing one executable; shapes, statistics, and determinism."""

    def model():
        ppl.sample("x", dist.Normal(jnp.zeros(3), jnp.ones(3)))

    def run():
        m = MCMC(NUTS(model, max_tree_depth=6), num_warmup=200, num_samples=300,
                 num_chains=4, chain_batch_size=2)
        m.run(jax.random.PRNGKey(9))
        return m

    m = run()
    xs = m.get_samples(group_by_chain=True)["x"]
    assert xs.shape == (4, 300, 3)
    flat = np.asarray(xs).reshape(-1, 3)
    assert np.all(np.abs(flat.mean(0)) < 0.15)
    assert np.all(np.abs(flat.std(0) - 1.0) < 0.15)
    # batches use distinct key streams
    assert not np.allclose(np.asarray(xs[0]), np.asarray(xs[2]))
    # deterministic across runs
    m2 = run()
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(m2.get_samples(group_by_chain=True)["x"]))


def test_chain_batch_size_guards():
    with pytest.raises(ValueError):
        MCMC(NUTS(funnelish_model), num_chains=4, chain_batch_size=3)
    with pytest.raises(ValueError):
        MCMC(NUTS(funnelish_model), num_chains=4, chain_batch_size=2, collective_adaptation=True)
    with pytest.raises(ValueError):
        MCMC(NUTS(funnelish_model), num_chains=4, chain_batch_size=2, chain_groups=2)
