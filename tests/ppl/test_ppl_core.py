"""PPL core: distributions vs scipy, handlers, log_density/potential_energy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose
from scipy import stats

from gwinferno_tpu import ppl
from gwinferno_tpu.ppl import distributions as dist
from gwinferno_tpu.ppl.constraints import biject_to

KEY = jax.random.PRNGKey(0)


# ---------------------------------------------------------------- distributions
@pytest.mark.parametrize(
    "d,scipy_d",
    [
        (dist.Normal(0.3, 1.7), stats.norm(0.3, 1.7)),
        (dist.HalfNormal(2.0), stats.halfnorm(scale=2.0)),
        (dist.LogNormal(0.2, 0.9), stats.lognorm(0.9, scale=np.exp(0.2))),
        (dist.Uniform(-2.0, 3.0), stats.uniform(-2.0, 5.0)),
        (dist.Gamma(3.5, 1.0), stats.gamma(3.5)),
        (dist.Gamma(2.0, 0.5), stats.gamma(2.0, scale=2.0)),
        (dist.Exponential(1.3), stats.expon(scale=1 / 1.3)),
        (dist.Beta(2.0, 5.0), stats.beta(2.0, 5.0)),
        (dist.TruncatedNormal(1.0, 2.0, -1.0, 4.0), stats.truncnorm(-1.0, 1.5, loc=1.0, scale=2.0)),
    ],
)
def test_log_prob_matches_scipy(d, scipy_d):
    x = np.asarray(d.sample(KEY, (200,)))
    assert_allclose(np.asarray(d.log_prob(jnp.asarray(x))), scipy_d.logpdf(x), rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize(
    "d",
    [
        dist.Normal(0.3, 1.7),
        dist.HalfNormal(2.0),
        dist.Uniform(-2.0, 3.0),
        dist.Gamma(3.5, 2.0),
        dist.Beta(2.0, 5.0),
        dist.TruncatedNormal(1.0, 2.0, -1.0, 4.0),
        dist.Exponential(0.7),
        dist.LogNormal(0.2, 0.9),
    ],
)
def test_sample_moments(d):
    x = np.asarray(d.sample(KEY, (200_000,)))
    lp = np.asarray(d.log_prob(jnp.asarray(x)))
    assert np.all(np.isfinite(lp))
    # MC mean vs quadrature mean of exp(log_prob)
    grid = np.linspace(x.min(), x.max(), 20001)
    pdf = np.exp(np.asarray(d.log_prob(jnp.asarray(grid))))
    mean_quad = np.trapezoid(grid * pdf, grid)
    assert abs(x.mean() - mean_quad) < 4 * x.std() / np.sqrt(len(x)) + 1e-3


def test_dirichlet_logprob():
    conc = jnp.array([2.0, 3.0, 4.0])
    d = dist.Dirichlet(conc)
    x = d.sample(KEY, (50,))
    want = stats.dirichlet(np.asarray(conc)).logpdf(np.asarray(x).T)
    assert_allclose(np.asarray(d.log_prob(x)), want, rtol=1e-5)


def test_categorical():
    probs = jnp.array([0.2, 0.5, 0.3])
    d = dist.Categorical(probs=probs)
    x = d.sample(KEY, (100_000,))
    freqs = np.bincount(np.asarray(x), minlength=3) / 100_000
    assert_allclose(freqs, np.asarray(probs), atol=0.01)
    assert_allclose(np.asarray(d.log_prob(jnp.array([0, 1, 2]))), np.log(np.asarray(probs)), rtol=1e-6)


# ---------------------------------------------------------------- transforms
@pytest.mark.parametrize(
    "d",
    [
        dist.Normal(),
        dist.HalfNormal(2.0),
        dist.Uniform(-2.0, 3.0),
        dist.Gamma(3.0),
        dist.Beta(2.0, 2.0),
        dist.TruncatedNormal(0.0, 1.0, -0.5, 2.0),
    ],
)
def test_biject_roundtrip(d):
    t = biject_to(d.support)
    y = d.sample(KEY, (100,))
    u = t.inv(y)
    assert_allclose(np.asarray(t(u)), np.asarray(y), rtol=1e-6, atol=1e-9)
    # jacobian consistency vs autodiff on a scalar
    u0 = np.float64(0.37)
    auto = np.log(np.abs(jax.grad(lambda x: t(x))(u0)))
    assert_allclose(np.asarray(t.log_abs_det_jacobian(u0, t(u0))), auto, rtol=1e-6)


def test_stickbreaking_roundtrip_and_jacobian():
    t = biject_to(dist.Dirichlet(jnp.ones(4)).support)
    u = jax.random.normal(KEY, (10, 3))
    y = t(u)
    assert_allclose(np.asarray(jnp.sum(y, -1)), 1.0, rtol=1e-12)
    assert np.all(np.asarray(y) > 0)
    assert_allclose(np.asarray(t.inv(y)), np.asarray(u), rtol=1e-6, atol=1e-8)
    # jacobian vs autodiff determinant
    u0 = jnp.array([0.3, -0.2, 0.5])
    J = jax.jacobian(lambda x: t(x)[:-1])(u0)  # square part (last comp is determined)
    auto = np.linalg.slogdet(np.asarray(J))[1]
    assert_allclose(float(t.log_abs_det_jacobian(u0, t(u0))), auto, rtol=1e-6)


# ---------------------------------------------------------------- handlers + density
def model(data):
    mu = ppl.sample("mu", dist.Normal(0.0, 10.0))
    sigma = ppl.sample("sigma", dist.HalfNormal(5.0))
    ppl.sample("obs", dist.Normal(mu, sigma), obs=data)
    ppl.deterministic("mu2", mu * 2)
    ppl.factor("penalty", -0.5 * mu**2)


def test_trace_and_seed():
    with ppl.trace() as tr, ppl.seed(rng_seed=0):
        model(jnp.array([1.0, 2.0]))
    assert set(tr.trace) == {"mu", "sigma", "obs", "mu2", "penalty"}
    assert tr.trace["obs"]["is_observed"]
    assert tr.trace["mu2"]["type"] == "deterministic"


def test_log_density_matches_manual():
    data = jnp.array([1.0, 2.0, 0.5])
    params = {"mu": jnp.array(0.7), "sigma": jnp.array(1.3)}
    ld, tr = ppl.log_density(model, (data,), {}, params)
    want = (
        stats.norm(0, 10).logpdf(0.7)
        + stats.halfnorm(scale=5).logpdf(1.3)
        + stats.norm(0.7, 1.3).logpdf(np.asarray(data)).sum()
        - 0.5 * 0.7**2
    )
    assert_allclose(float(ld), want, rtol=1e-8)


def test_potential_energy_includes_jacobian():
    data = jnp.array([1.0, 2.0, 0.5])
    params_c = {"mu": jnp.array(0.7), "sigma": jnp.array(1.3)}
    params_u = ppl.unconstrain_fn(model, (data,), {}, params_c)
    assert_allclose(float(params_u["sigma"]), np.log(1.3), rtol=1e-9)
    pe = ppl.potential_energy(model, (data,), {}, params_u)
    ld, _ = ppl.log_density(model, (data,), {}, params_c)
    # PE = -(log_density + log|dsigma/du|) with u = log sigma
    assert_allclose(float(pe), -(float(ld) + float(params_u["sigma"])), rtol=1e-8)


def test_potential_energy_grad_finite():
    data = jnp.array([1.0, 2.0, 0.5])
    pe_fn = lambda p: ppl.potential_energy(model, (data,), {}, p)  # noqa: E731
    g = jax.grad(pe_fn)({"mu": jnp.array(0.7), "sigma": jnp.array(0.1)})
    flat, _ = jax.flatten_util.ravel_pytree(g)
    assert np.all(np.isfinite(np.asarray(flat)))


def test_condition_handler():
    def m():
        x = ppl.sample("x", dist.Normal())
        ppl.sample("y", dist.Normal(x, 1.0))

    with ppl.trace() as tr, ppl.condition(data={"y": jnp.array(2.0)}), ppl.seed(rng_seed=1):
        m()
    assert tr.trace["y"]["is_observed"]
    assert float(tr.trace["y"]["value"]) == 2.0


def test_plate_indices():
    def m():
        with ppl.plate("n", 5) as idx:
            ppl.deterministic("idx", idx)

    with ppl.trace() as tr, ppl.seed(rng_seed=0):
        m()
    assert np.array_equal(np.asarray(tr.trace["idx"]["value"]), np.arange(5))


def test_explicit_rng_key_site_excluded_from_density():
    def m():
        q = ppl.sample("q", dist.Categorical(probs=jnp.array([0.5, 0.5])), rng_key=jax.random.PRNGKey(7))
        ppl.sample("x", dist.Normal(jnp.asarray(q, dtype=jnp.float64), 1.0), obs=jnp.array(0.3))

    ld, tr = ppl.log_density(m, (), {}, {})
    q = int(tr["q"]["value"])
    assert_allclose(float(ld), stats.norm(q, 1).logpdf(0.3), rtol=1e-8)


def test_sample_shape():
    def m():
        ppl.sample("c", dist.Normal(0.0, 6.0), sample_shape=(11,))

    with ppl.trace() as tr, ppl.seed(rng_seed=0):
        m()
    assert tr.trace["c"]["value"].shape == (11,)


def test_plate_draws_one_copy_per_element():
    """A drawn site inside plate(N) gets N iid values (the reference's
    latent categorical subpopulation pattern, analysis.py:248-252)."""
    def m():
        with ppl.plate("n", 7):
            ppl.sample("q", dist.Categorical(probs=jnp.array([0.5, 0.5])), rng_key=jax.random.PRNGKey(3))
            ppl.sample("x", dist.Normal(0.0, 1.0))

    with ppl.trace() as tr, ppl.seed(rng_seed=0):
        m()
    q = np.asarray(tr.trace["q"]["value"])
    x = np.asarray(tr.trace["x"]["value"])
    assert q.shape == (7,) and x.shape == (7,)
    # iid copies, not one broadcast value
    assert len(np.unique(x)) > 1


def test_plate_batched_dist_not_reexpanded():
    def m():
        with ppl.plate("n", 5):
            ppl.sample("x", dist.Normal(jnp.zeros(5), jnp.ones(5)))

    with ppl.trace() as tr, ppl.seed(rng_seed=0):
        m()
    assert tr.trace["x"]["value"].shape == (5,)


def test_plate_shape_mismatch_raises():
    def m():
        with ppl.plate("n", 5):
            ppl.sample("x", dist.Normal(jnp.zeros(3), jnp.ones(3)))

    with pytest.raises(ValueError, match="plate"):
        with ppl.trace(), ppl.seed(rng_seed=0):
            m()


def test_nested_plates_raise():
    def m():
        with ppl.plate("a", 3), ppl.plate("b", 4):
            ppl.sample("x", dist.Normal(0.0, 1.0))

    with pytest.raises(NotImplementedError, match="nested"):
        with ppl.trace(), ppl.seed(rng_seed=0):
            m()
