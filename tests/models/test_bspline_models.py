"""B-spline population models: shape/truncation contracts on real data
(mirrors reference tests/models/bsplines/*_test.py) + inference smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gwinferno_tpu import ppl
from gwinferno_tpu.models.bsplines.separable import BSplineIIDSpinMagnitudes
from gwinferno_tpu.models.bsplines.separable import BSplineIIDSpinTilts
from gwinferno_tpu.models.bsplines.separable import BSplineIndependentSpinMagnitudes
from gwinferno_tpu.models.bsplines.separable import BSplinePrimaryBSplineRatio
from gwinferno_tpu.models.bsplines.single import BSplineMass
from gwinferno_tpu.models.bsplines.single import BSplineRatio
from gwinferno_tpu.models.bsplines.smoothing import apply_difference_prior
from gwinferno_tpu.models.spline_perturbation import PowerlawSplineRedshiftModel
from gwinferno_tpu.pipeline.analysis import hierarchical_likelihood
from gwinferno_tpu.pipeline.utils import load_pe_and_injections_as_dict
from gwinferno_tpu.ppl import distributions as dist

MMIN, MMAX = 5.0, 100.0


@pytest.fixture(scope="module")
def data(pe_inj_file):
    pedict, injdict, constants, _ = load_pe_and_injections_as_dict(pe_inj_file)
    rng = np.random.default_rng(0)
    idx = rng.choice(pedict["mass_1"].shape[1], size=100, replace=False)
    pedict = {k: v[:, idx] for k, v in pedict.items()}
    return pedict, injdict, constants


def test_mass_model_shapes_and_truncation(data):
    pedict, injdict, _ = data
    model = BSplinePrimaryBSplineRatio(
        10, 5, pedict["mass_1"], injdict["mass_1"], pedict["mass_ratio"], injdict["mass_ratio"],
        m1min=MMIN, m2min=MMIN, mmax=MMAX,
    )
    key = jax.random.PRNGKey(0)
    m_cs = jax.random.normal(key, (10,))
    q_cs = jax.random.normal(jax.random.PRNGKey(1), (5,))
    p_pe = model(m_cs, q_cs, pe_samples=True)
    p_inj = model(m_cs, q_cs, pe_samples=False)
    assert p_pe.shape == pedict["mass_1"].shape
    assert p_inj.shape == injdict["mass_1"].shape
    assert np.all(np.isfinite(np.asarray(p_pe)))
    # truncation: zero outside [mmin, mmax]
    oob = np.asarray(pedict["mass_1"] < MMIN)
    assert np.all(np.asarray(p_pe)[oob] == 0.0)


def test_mass_model_normalizes_on_grid():
    grid = jnp.linspace(MMIN, MMAX, 2000)
    model = BSplineMass(12, grid, grid, mmin=MMIN, mmax=MMAX)
    cs = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (12,))
    p = np.asarray(model(cs))
    norm = np.trapezoid(p, np.asarray(grid))
    assert abs(norm - 1.0) < 2e-3


def test_spin_models_shapes(data):
    pedict, injdict, _ = data
    mag = BSplineIIDSpinMagnitudes(8, pedict["a_1"], pedict["a_2"], injdict["a_1"], injdict["a_2"])
    tilt = BSplineIIDSpinTilts(8, pedict["cos_tilt_1"], pedict["cos_tilt_2"], injdict["cos_tilt_1"], injdict["cos_tilt_2"])
    cs = 0.3 * jax.random.normal(jax.random.PRNGKey(3), (8,))
    for m in (mag, tilt):
        assert m(cs, pe_samples=True).shape == pedict["a_1"].shape
        assert m(cs, pe_samples=False).shape == injdict["a_1"].shape
        assert np.all(np.isfinite(np.asarray(m(cs))))
    magi = BSplineIndependentSpinMagnitudes(8, 6, pedict["a_1"], pedict["a_2"], injdict["a_1"], injdict["a_2"])
    p = magi(cs, 0.3 * jax.random.normal(jax.random.PRNGKey(4), (6,)))
    assert p.shape == pedict["a_1"].shape


def test_redshift_spline_model(data):
    pedict, injdict, _ = data
    zmod = PowerlawSplineRedshiftModel(5, pedict["redshift"], injdict["redshift"])
    cs = jnp.zeros(5)
    # zero coefficients reduce to the plain powerlaw redshift model
    p_spline = np.asarray(zmod(pedict["redshift"], 2.9, cs))
    from gwinferno_tpu.models.parametric.parametric import PowerlawRedshiftModel

    plain = PowerlawRedshiftModel(pedict["redshift"], injdict["redshift"])
    p_plain = np.asarray(plain(pedict["redshift"], 2.9))
    np.testing.assert_allclose(p_spline, p_plain, rtol=1e-10)
    # norm consistent too
    np.testing.assert_allclose(float(zmod.normalization(2.9, cs)), float(plain.normalization(2.9)), rtol=1e-10)


def test_smoothing_prior_value():
    cs = jnp.array([1.0, 2.0, 4.0, 7.0])
    # first differences: [1,2,3]; penalty = -0.5 * tau * 14
    assert float(apply_difference_prior(cs, 2.0, degree=1)) == pytest.approx(-14.0)
    # second differences: [1,1]; penalty = -0.5 * tau * 2
    assert float(apply_difference_prior(cs, 3.0, degree=2)) == pytest.approx(-3.0)


def test_bspline_inference_smoke(data):
    """Potential energy + gradient finite for the full B-spline model
    (reference tests/inference_test.py:331-347 pattern)."""
    pedict, injdict, constants = data
    mass_model = BSplinePrimaryBSplineRatio(
        10, 5, pedict["mass_1"], injdict["mass_1"], pedict["mass_ratio"], injdict["mass_ratio"],
        m1min=MMIN, m2min=MMIN, mmax=MMAX,
    )
    z_model = PowerlawSplineRedshiftModel(5, pedict["redshift"], injdict["redshift"])

    def model():
        m_cs = ppl.sample("m1_coefs", dist.Normal(0.0, 6.0), sample_shape=(10,))
        q_cs = ppl.sample("q_coefs", dist.Normal(0.0, 6.0), sample_shape=(5,))
        lamb = ppl.sample("lamb", dist.Normal(0.0, 3.0))
        z_cs = ppl.sample("z_coefs", dist.Normal(0.0, 6.0), sample_shape=(5,))

        def get_weights(z, prior, pe_samples):
            p_m1q = mass_model(m_cs, q_cs, pe_samples=pe_samples)
            p_z = z_model(z, lamb, z_cs)
            wts = p_m1q * p_z / prior
            return jnp.where(jnp.isnan(wts) | jnp.isinf(wts), 0.0, wts)

        peweights = get_weights(pedict["redshift"], pedict["prior"], True)
        injweights = get_weights(injdict["redshift"], injdict["prior"], False)
        hierarchical_likelihood(
            peweights,
            injweights,
            total_inj=constants["total_inj"],
            Nobs=constants["nObs"],
            Tobs=constants["obs_time"],
            surveyed_hypervolume=z_model.normalization(lamb, z_cs),
            marginalize_selection=False,
            min_neff_cut=False,
            m1min=MMIN,
            m2min=MMIN,
            mmax=MMAX,
        )

    test_params = {
        "m1_coefs": jax.random.normal(jax.random.PRNGKey(0), (10,)),
        "q_coefs": jax.random.normal(jax.random.PRNGKey(1), (5,)),
        "z_coefs": jnp.ones(5),
        "lamb": jnp.array(2.9),
        "unscaled_rate": jnp.array(30.0),
    }
    params_u = ppl.unconstrain_fn(model, (), {}, test_params)
    pe, grad = jax.value_and_grad(lambda p: ppl.potential_energy(model, (), {}, p))(params_u)
    gflat, _ = jax.flatten_util.ravel_pytree(grad)
    assert np.isfinite(float(pe))
    assert np.all(np.isfinite(np.asarray(gflat)))
