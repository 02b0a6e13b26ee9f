"""EXACT model parity against the independent implementation: the two
log-joints agree pointwise up to one additive constant.

Moment parity (test_parity.py / the bench's self-check) carries the MC error
of BOTH samplers -- and the committed ensemble baseline is a deliberately
short run whose residual burn-in bias (~0.5 sd on weakly-identified sites)
dominates its nominal mc_se.  This test is the sharp instrument: evaluate
the framework's log-density (ppl.log_density on the bench model) and the
pure-numpy IndependentPosterior at random hyperparameter points and require
the DIFFERENCE to be constant to ~1e-4 in f64.  Any modeling discrepancy --
wrong pdf, wrong truncation, wrong selection term, wrong prior -- shows up
as point-to-point variation; only normalization conventions may differ
(the Gamma(Nobs) rate prior is subtracted analytically, so the rate
dependence is checked too).

Reference seam analogue: tests/inference_test.py:313-347 (potential energy
at known points).
"""

import os
import sys

import jax
import numpy as np
import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


@pytest.mark.filterwarnings("ignore")
def test_log_density_matches_independent_up_to_constant(pe_inj_synthetic_file):
    prev_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        sys.path.insert(0, ROOT)
        import bench
        from gwinferno_tpu import ppl
        from gwinferno_tpu.models.parametric.parametric import PowerlawRedshiftModel
        from gwinferno_tpu.pipeline.utils import load_pe_and_injections_as_dict
        from tools.parity.independent_numpy_model import IndependentPosterior, PARAM_ORDER

        pedict, injdict, constants, _ = load_pe_and_injections_as_dict(pe_inj_synthetic_file)
        z_model = PowerlawRedshiftModel(pedict["redshift"], injdict["redshift"])
        model = bench.make_model(pedict, injdict, constants, z_model)
        post = IndependentPosterior(pedict, injdict, constants)

        rng = np.random.default_rng(3)
        base = np.array([bench.TRUTH[k] for k in PARAM_ORDER])
        jitter = np.array(
            [0.3, 0.3, 1.5, 0.8, 0.05, 0.04, 0.008, 0.04, 0.008, 0.08, 0.08, 0.12, 0.12, 1.2]
        )

        # unscaled_rate is jittered too: the framework's rate term must be
        # exactly the analytic Gamma(Nobs) log-pdf (the independent model
        # omits it as rate-independent of the data), so subtract it and any
        # wrong rate exponent in the likelihood shows up as spread instead
        # of being absorbed into the constant offset.
        from scipy.stats import gamma as scipy_gamma

        n_obs = int(constants["nObs"])
        deltas = []
        for _ in range(8):
            theta = base + jitter * rng.uniform(-1.0, 1.0, len(base))
            r = float(rng.uniform(40.0, 110.0))
            params = {k: float(v) for k, v in zip(PARAM_ORDER, theta)}
            params["unscaled_rate"] = r
            ld, _ = ppl.log_density(model, (), {}, params)
            deltas.append(float(ld) - post(theta) - scipy_gamma.logpdf(r, n_obs))
        deltas = np.asarray(deltas)

        assert np.isfinite(deltas).all()
        spread = float(deltas.max() - deltas.min())
        assert spread < 1e-4, (
            f"log-density difference varies across points (spread {spread:.3e}); "
            f"the model implementations disagree: {deltas}"
        )
    finally:
        jax.config.update("jax_enable_x64", prev_x64)
