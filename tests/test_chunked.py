"""Sample-axis-chunked likelihood reductions (ops/chunked.py) == the flat
path, in values AND gradients (the chunks only re-tile the reduction)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import logsumexp

from gwinferno_tpu.ops.chunked import chunked_double_logsumexp, chunked_summaries

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_chunked_double_logsumexp_matches_flat():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 24))

    def f(theta):
        def logw(part):
            return theta * part["x"] - 0.1 * part["x"] ** 2

        lse1, lse2 = chunked_double_logsumexp(logw, {"x": x}, 4)
        return lse1, lse2

    lse1, lse2 = f(0.7)
    lw = 0.7 * x - 0.1 * x**2
    np.testing.assert_allclose(np.asarray(lse1), logsumexp(lw, axis=-1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(lse2), logsumexp(2 * lw, axis=-1), rtol=1e-12)

    # gradient wrt the closed-over parameter matches the flat gradient
    g_chunk = jax.grad(lambda t: jnp.sum(f(t)[0] + f(t)[1]))(0.7)
    g_flat = jax.grad(
        lambda t: jnp.sum(
            logsumexp(t * x - 0.1 * x**2, axis=-1) + logsumexp(2 * (t * x - 0.1 * x**2), axis=-1)
        )
    )(0.7)
    np.testing.assert_allclose(float(g_chunk), float(g_flat), rtol=1e-10)


def test_chunked_handles_minus_inf_rows():
    """-inf log weights (out-of-support samples) must neither poison the
    combine nor the gradient."""
    x = np.linspace(-1, 1, 12).reshape(1, 12)

    def f(theta):
        def logw(part):
            return jnp.where(part["x"] > 0.5, jnp.nan_to_num(-jnp.inf), theta * part["x"])

        lse1, _ = chunked_double_logsumexp(logw, {"x": x}, 3)
        return lse1[0]

    v, g = jax.value_and_grad(f)(1.3)
    lw = np.where(x > 0.5, -np.inf, 1.3 * x)
    np.testing.assert_allclose(float(v), logsumexp(lw[0]), rtol=1e-12)
    assert np.isfinite(float(g))


def test_bench_model_chunked_matches_flat_potential():
    """The bench model with BENCH_SAMPLE_CHUNKS>1 must evaluate the same
    posterior density (same logBFs/n_eff semantics through the summaries
    seam) as the flat path -- identical potential energy and gradients up to
    reduction-order roundoff."""
    import bench
    from gwinferno_tpu import ppl
    from gwinferno_tpu.models.parametric.parametric import PowerlawRedshiftModel

    rng = np.random.default_rng(1)
    E, S, F = 6, 32, 64

    def cloud(lo, hi, shape):
        return rng.uniform(lo, hi, shape)

    pedict = {
        "mass_1": cloud(6, 90, (E, S)), "mass_ratio": cloud(0.3, 1, (E, S)),
        "redshift": cloud(0.05, 1.5, (E, S)), "a_1": cloud(0.05, 0.9, (E, S)),
        "a_2": cloud(0.05, 0.9, (E, S)), "cos_tilt_1": cloud(-1, 1, (E, S)),
        "cos_tilt_2": cloud(-1, 1, (E, S)), "prior": cloud(0.5, 2, (E, S)),
    }
    injdict = {
        "mass_1": cloud(6, 90, (F,)), "mass_ratio": cloud(0.3, 1, (F,)),
        "redshift": cloud(0.05, 1.5, (F,)), "a_1": cloud(0.05, 0.9, (F,)),
        "a_2": cloud(0.05, 0.9, (F,)), "cos_tilt_1": cloud(-1, 1, (F,)),
        "cos_tilt_2": cloud(-1, 1, (F,)), "prior": cloud(0.5, 2, (F,)),
    }
    constants = {"total_inj": 10.0 * F, "obs_time": 1.0, "nObs": E}
    z_model = PowerlawRedshiftModel(pedict["redshift"], injdict["redshift"])

    params = dict(bench.FIDUCIAL_INIT)
    params = {k: jnp.asarray(v, jnp.float64) for k, v in params.items()}

    def potential(chunks):
        old = os.environ.get("BENCH_SAMPLE_CHUNKS")
        os.environ["BENCH_SAMPLE_CHUNKS"] = str(chunks)
        try:
            model = bench.make_model(pedict, injdict, constants, z_model)
        finally:
            if old is None:
                os.environ.pop("BENCH_SAMPLE_CHUNKS", None)
            else:
                os.environ["BENCH_SAMPLE_CHUNKS"] = old

        def pe_of(p):
            u = ppl.unconstrain_fn(model, (), {}, p)
            return ppl.potential_energy(model, (), {}, u)

        return jax.value_and_grad(lambda p: pe_of(p))(params)

    v1, g1 = potential(1)
    v4, g4 = potential(4)
    np.testing.assert_allclose(float(v1), float(v4), rtol=1e-10)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g4[k]), rtol=1e-7, atol=1e-9, err_msg=k)


def test_chunked_summaries_semantics():
    """chunked_summaries reproduces per_event_log_bayes_factors +
    detection_efficiency exactly (log path)."""
    from gwinferno_tpu.pipeline.analysis import detection_efficiency, per_event_log_bayes_factors

    rng = np.random.default_rng(3)
    pe_x = rng.normal(size=(4, 20))
    inj_x = rng.normal(size=(30,))

    def logw(part):
        return -0.5 * part["x"] ** 2

    (logBFs, log_n_effs, S), (log_mu, log_n_eff_inj) = chunked_summaries(
        logw, {"x": pe_x}, logw, {"x": inj_x}, 300.0, 4, inj_chunks=3
    )
    assert S == 20
    want_bf, want_ne, _ = per_event_log_bayes_factors(jnp.asarray(-0.5 * pe_x**2), log=True)
    np.testing.assert_allclose(np.asarray(logBFs), np.asarray(want_bf), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(log_n_effs), np.asarray(want_ne), rtol=1e-12)
    want_mu, want_nei, _ = detection_efficiency(jnp.asarray(-0.5 * inj_x**2), 300.0, log=True)
    np.testing.assert_allclose(float(log_mu), float(want_mu), rtol=1e-12)
    np.testing.assert_allclose(float(log_n_eff_inj), float(want_nei), rtol=1e-10)
