"""Pallas kernels vs their XLA reference implementations (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
from gwinferno_tpu.ops.fused import fused_logweight_logsumexp
from gwinferno_tpu.ops.fused import fused_logweight_logsumexp_xla


def _setup(C=4, K=16, E=8, S=128, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    coefs = jax.random.normal(k1, (C, K), dtype=jnp.float32) * 0.3
    design = jax.random.uniform(k2, (K, E * S), dtype=jnp.float32)
    nlp = jax.random.normal(k3, (E * S,), dtype=jnp.float32)
    return coefs, design, nlp, E, S


def test_fused_kernel_matches_xla_reference():
    coefs, design, nlp, E, S = _setup()
    want_bf, want_neff = fused_logweight_logsumexp_xla(coefs, design, nlp, E, S)
    got_bf, got_neff = fused_logweight_logsumexp(coefs, design, nlp, E, S, event_tile=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got_bf), np.asarray(want_bf), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got_neff), np.asarray(want_neff), rtol=2e-5)


def test_fused_kernel_event_padding():
    # E=6 not divisible by tile 4 -> internal padding path
    coefs, design, nlp, E, S = _setup(E=6)
    want_bf, _ = fused_logweight_logsumexp_xla(coefs, design, nlp, E, S)
    got_bf, _ = fused_logweight_logsumexp(coefs, design, nlp, E, S, event_tile=4, interpret=True)
    assert got_bf.shape == want_bf.shape
    np.testing.assert_allclose(np.asarray(got_bf), np.asarray(want_bf), rtol=2e-5)


def test_fused_bspline_helper_matches_model_composition(pe_inj_file):
    """The fused stacked-matmul path equals composing the 1-D B-spline models
    (log-weight level) on real catalog banks."""
    import numpy as np

    from gwinferno_tpu.models.bsplines.single import BSplineMass, BSplineRatio
    from gwinferno_tpu.ops import fused_bspline_per_event_log_bayes_factors
    from gwinferno_tpu.pipeline.analysis import per_event_log_bayes_factors
    from gwinferno_tpu.pipeline.utils import load_pe_and_injections_as_dict

    pedict, injdict, constants, _ = load_pe_and_injections_as_dict(pe_inj_file)
    E, S = pedict["mass_1"].shape
    m_model = BSplineMass(10, pedict["mass_1"], injdict["mass_1"], mmin=5.0, mmax=100.0)
    q_model = BSplineRatio(6, pedict["mass_ratio"], injdict["mass_ratio"], qmin=0.05)
    key = jax.random.PRNGKey(0)
    m_cs = 0.2 * jax.random.normal(key, (10,))
    q_cs = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (6,))

    # model-composition path (linear)
    p = m_model(m_cs) * q_model(q_cs) / pedict["prior"]
    p = jnp.where(jnp.isnan(p) | jnp.isinf(p) | (p <= 0), 0.0, p)
    want_logBF, want_logneff, _ = per_event_log_bayes_factors(jnp.log(p), log=True)

    # fused path: stacked finite design matrices + masks in the log prior
    def finite_dm(model):
        dm = model.pe_design_matrix.reshape(model.pe_design_matrix.shape[0], -1)
        return dm
    mask = (m_model._valid_xx & q_model._valid_xx).reshape(-1)
    nlp = jnp.where(mask, -jnp.log(pedict["prior"].reshape(-1)), -jnp.inf)
    # log-normalizations of each spline are coefficient-dependent scalars
    log_norm_m = jnp.log(m_model.interpolator.norm(m_cs))
    log_norm_q = jnp.log(q_model.interpolator.norm(q_cs))
    got_logBF, got_logneff = fused_bspline_per_event_log_bayes_factors(
        [(finite_dm(m_model), m_cs), (finite_dm(q_model), q_cs)],
        nlp, E, S, log_norms=[log_norm_m, log_norm_q],
    )
    np.testing.assert_allclose(np.asarray(got_logBF), np.asarray(want_logBF), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(got_logneff), np.asarray(want_logneff), rtol=1e-5, atol=1e-6)
