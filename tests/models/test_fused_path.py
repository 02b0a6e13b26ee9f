"""FusedBSplineLikelihood (the fused Pallas b-spline hot path) against the
plain per-model projection + reduction pipeline, values and gradients, in
Pallas interpret mode on CPU (the compiled-kernel equivalence runs in the
real-TPU lane, tests/tpu)."""

import jax
import jax.numpy as jnp
import numpy as np

from gwinferno_tpu.models.bsplines.fused_path import FusedBSplineLikelihood
from gwinferno_tpu.pipeline.analysis import detection_efficiency
from gwinferno_tpu.pipeline.analysis import per_event_log_bayes_factors
from gwinferno_tpu.pipeline.utils import load_pe_and_injections_as_dict
from gwinferno_tpu.pipeline.utils import setup_bspline_mass_models
from gwinferno_tpu.pipeline.utils import setup_bspline_spin_models
from gwinferno_tpu.pipeline.utils import setup_powerlaw_spline_redshift_model


def _setup(pe_inj_file, n=(12, 8, 6, 6, 6)):
    pedict, injdict, constants, _ = load_pe_and_injections_as_dict(pe_inj_file)
    # trim the sample axis for test speed
    pedict = {k: v[:, :200] for k, v in pedict.items()}
    mass = setup_bspline_mass_models(pedict, injdict, n[0], n[1], 5.0, 100.0)
    mag, tilt = setup_bspline_spin_models(pedict, injdict, n[2], n[3], iid=True)
    zmod = setup_powerlaw_spline_redshift_model(pedict, injdict, n[4])
    fused = FusedBSplineLikelihood(mass, mag, tilt, zmod, pedict, injdict, constants["total_inj"])
    return pedict, injdict, constants, mass, mag, tilt, zmod, fused


def test_fused_bspline_matches_plain_path(pe_inj_file):
    pedict, injdict, constants, mass, mag, tilt, zmod, fused = _setup(pe_inj_file)
    rng = np.random.default_rng(0)
    m_cs = jnp.asarray(rng.normal(0, 1, 12))
    q_cs = jnp.asarray(rng.normal(0, 1, 8))
    a_cs = jnp.asarray(rng.normal(0, 1, 6))
    t_cs = jnp.asarray(rng.normal(0, 1, 6))
    z_cs = jnp.asarray(rng.normal(0, 0.3, 6))
    lamb = jnp.asarray(1.2)

    def weights(d, pe):
        w = (
            mass(m_cs, q_cs, pe_samples=pe)
            * mag(a_cs, pe_samples=pe)
            * tilt(t_cs, pe_samples=pe)
            * zmod(d["redshift"], lamb, z_cs)
            / d["prior"]
        )
        return jnp.where(jnp.isnan(w) | jnp.isinf(w), 0.0, w)

    logBFs_x, logneff_x, _ = per_event_log_bayes_factors(weights(pedict, True), log=False)
    logmu_x, logneffinj_x, _ = detection_efficiency(weights(injdict, False), constants["total_inj"], log=False)

    logBFs_f, logneff_f, logmu_f, logneffinj_f = fused(m_cs, q_cs, a_cs, t_cs, z_cs, lamb, interpret=True)
    np.testing.assert_allclose(np.asarray(logBFs_f), np.asarray(logBFs_x), rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(logneff_f), np.asarray(logneff_x), rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(float(logmu_f), float(logmu_x), rtol=1e-10)
    np.testing.assert_allclose(float(logneffinj_f), float(logneffinj_x), rtol=1e-8)

    # gradients through the custom VJP == autodiff through the plain path
    def plain_sum(c):
        w = (
            mass(c, q_cs, pe_samples=True)
            * mag(a_cs, pe_samples=True)
            * tilt(t_cs, pe_samples=True)
            * zmod(pedict["redshift"], lamb, z_cs)
            / pedict["prior"]
        )
        w = jnp.where(jnp.isnan(w) | jnp.isinf(w), 0.0, w)
        return jnp.sum(per_event_log_bayes_factors(w, log=False)[0])

    g_f = jax.grad(lambda c: jnp.sum(fused(c, q_cs, a_cs, t_cs, z_cs, lamb, interpret=True)[0]))(m_cs)
    g_x = jax.grad(plain_sum)(m_cs)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_x), rtol=1e-9, atol=1e-12)

    # and w.r.t. the non-spline hyperparameter (the lamb feature row)
    h_f = jax.grad(lambda L: fused(m_cs, q_cs, a_cs, t_cs, z_cs, L, interpret=True)[2])(lamb)

    def plain_mu(L):
        w = (
            mass(m_cs, q_cs, pe_samples=False)
            * mag(a_cs, pe_samples=False)
            * tilt(t_cs, pe_samples=False)
            * zmod(injdict["redshift"], L, z_cs)
            / injdict["prior"]
        )
        w = jnp.where(jnp.isnan(w) | jnp.isinf(w), 0.0, w)
        return detection_efficiency(w, constants["total_inj"], log=False)[0]

    h_x = jax.grad(plain_mu)(lamb)
    np.testing.assert_allclose(float(h_f), float(h_x), rtol=1e-8)
