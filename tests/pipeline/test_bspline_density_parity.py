"""EXACT density parity for the B-SPLINE production model against a fully
independent scipy/numpy implementation (tools/parity/
independent_bspline_density.py) -- the nonparametric analogue of
test_density_parity.py.  The two log-joints must agree pointwise up to one
additive constant at random coefficient/hyperparameter points; any basis
layout, normalization, masking, penalty, or likelihood discrepancy shows up
as point-to-point spread."""

import os
import sys

import jax
import numpy as np
import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))

N_M, N_Q, N_A, N_CT, N_Z = 20, 12, 8, 8, 10


@pytest.mark.filterwarnings("ignore")
def test_bspline_log_density_matches_independent_up_to_constant(pe_inj_synthetic_file):
    prev_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        sys.path.insert(0, ROOT)
        sys.path.insert(0, os.path.join(ROOT, "examples"))
        import simple_bspline_example as ex
        from utils import run_bspline_analysis

        from gwinferno_tpu import ppl
        from gwinferno_tpu.pipeline.utils import load_base_parser
        from gwinferno_tpu.pipeline.utils import load_pe_and_injections_as_dict
        from tools.parity.independent_bspline_density import IndependentBSplineDensity

        pedict, injdict, constants, param_names = load_pe_and_injections_as_dict(pe_inj_synthetic_file)
        # subsample the PE bank for test speed (both implementations see the
        # same banks, so the comparison stays exact)
        rng = np.random.default_rng(0)
        idx = rng.choice(pedict["mass_1"].shape[1], size=600, replace=False)
        pedict = {k: np.ascontiguousarray(v[:, idx]) for k, v in pedict.items()}

        args = load_base_parser().parse_args([
            "--m-nsplines", str(N_M), "--q-nsplines", str(N_Q),
            "--a-nsplines", str(N_A), "--tilt-nsplines", str(N_CT),
            "--z-nsplines", str(N_Z), "--mmin", "3.0", "--mmax", "100.0",
        ])
        models = run_bspline_analysis(ex.model, pedict, injdict, constants, param_names, args,
                                      skip_inference=True)

        def bound_model():
            ex.model(pedict, injdict, constants["nObs"], constants["obs_time"],
                     constants["total_inj"], models["mass"], models["mag"], models["tilt"],
                     models["z"], args.mmin, args.mmax, param_names)

        indep = IndependentBSplineDensity(pedict, injdict, constants,
                                          n_m=N_M, n_q=N_Q, n_a=N_A, n_ct=N_CT, n_z=N_Z,
                                          mmin=3.0, mmax=100.0)

        deltas = []
        for trial in range(6):
            p = {
                "mass_cs": 0.4 * rng.standard_normal(N_M),
                "q_cs": 0.3 * rng.standard_normal(N_Q),
                "a_cs": 0.3 * rng.standard_normal(N_A),
                "tilt_cs": 0.3 * rng.standard_normal(N_CT),
                "z_cs": 0.2 * rng.standard_normal(N_Z - 1),
                "lamb": 1.7 + 0.8 * rng.uniform(-1, 1),
                "unscaled_rate": float(rng.uniform(40.0, 110.0)),
            }
            ld, _ = ppl.log_density(bound_model, (), {}, {k: np.asarray(v) for k, v in p.items()})
            deltas.append(float(ld) - indep(p))
        deltas = np.asarray(deltas)

        assert np.isfinite(deltas).all(), deltas
        spread = float(deltas.max() - deltas.min())
        assert spread < 1e-4, (
            f"B-spline log-density difference varies across points "
            f"(spread {spread:.3e}): {deltas}"
        )
    finally:
        jax.config.update("jax_enable_x64", prev_x64)
