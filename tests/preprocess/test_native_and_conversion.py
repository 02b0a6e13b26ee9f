"""Native chi_p prior library + full spin-coordinate conversion machinery."""

import numpy as np
import pytest

from gwinferno_tpu.preprocess.data_collection import convert_component_spins_to_chieff
from gwinferno_tpu.preprocess.native import chi_p_prior_given_chi_eff_q_batch
from gwinferno_tpu.preprocess.native import native_available
from gwinferno_tpu.utils.dataset import DataArray

RNG = np.random.default_rng(7)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_matches_python_oracle():
    from gwinferno_tpu.preprocess.priors import chi_p_prior_given_chi_eff_q

    n = 6
    chi_p = RNG.uniform(0.1, 0.5, n)
    chi_eff = RNG.uniform(-0.15, 0.25, n)
    q = RNG.uniform(0.4, 0.95, n)
    native = chi_p_prior_given_chi_eff_q_batch(chi_p, chi_eff, q, ndraws=20000)
    py = np.array([float(chi_p_prior_given_chi_eff_q(chi_p[i], chi_eff[i], q[i], ndraws=20000)) for i in range(n)])
    # both are Monte-Carlo KDE estimates; agree within MC noise
    np.testing.assert_allclose(native, py, rtol=0.2, atol=0.05)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_normalizes():
    grid = np.linspace(1e-3, 0.999, 200)
    p = chi_p_prior_given_chi_eff_q_batch(grid, 0.1, 0.8, ndraws=20000)
    assert abs(np.trapezoid(p, grid) - 1.0) < 0.05


def _fake_bank(n_ev=3, n_samp=20):
    params = ["mass_ratio", "a_1", "a_2", "cos_tilt_1", "cos_tilt_2", "mass_1", "prior"]
    data = np.stack(
        [
            RNG.uniform(0.4, 0.95, (n_ev, n_samp)),
            RNG.uniform(0.05, 0.9, (n_ev, n_samp)),
            RNG.uniform(0.05, 0.9, (n_ev, n_samp)),
            RNG.uniform(-0.95, 0.95, (n_ev, n_samp)),
            RNG.uniform(-0.95, 0.95, (n_ev, n_samp)),
            RNG.uniform(6, 60, (n_ev, n_samp)),
            RNG.uniform(0.5, 2.0, (n_ev, n_samp)),
        ],
        axis=1,
    )
    return DataArray(
        data,
        ("event", "param", "sample"),
        coords={"event": np.array([f"ev{i}" for i in range(n_ev)]), "param": np.array(params)},
    )


def test_convert_component_spins_to_chieff_pe_bank():
    arr = _fake_bank()
    out = convert_component_spins_to_chieff(arr, ["mass_1", "mass_ratio", "chi_eff"])
    new_params = list(out.coords["param"])
    assert "chi_eff" in new_params and "prior" in new_params
    assert "a_1" not in new_params
    chi_eff = out.sel(param="chi_eff").data
    assert chi_eff.shape == (3, 20)
    assert np.all(np.abs(chi_eff) <= 1.0)
    prior = out.sel(param="prior").data
    assert np.all(np.isfinite(prior)) and np.all(prior >= 0)
