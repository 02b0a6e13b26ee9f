"""Config parsing + config-driven model construction round-trips
(mirrors reference tests/inference_test.py:424-442)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from gwinferno_tpu import ppl
from gwinferno_tpu.pipeline.analysis import construct_hierarchical_model
from gwinferno_tpu.pipeline.parser import ConfigReader
from gwinferno_tpu.pipeline.parser import load_dist_from_string
from gwinferno_tpu.pipeline.parser import load_model_from_python_file
from gwinferno_tpu.pipeline.utils import load_pe_and_injections_as_dict

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
CONFIG = os.path.join(REPO, "examples/config_files/config.yml")
CONFIG_PY = os.path.join(REPO, "examples/config_files/config_w_py_model.yml")


def test_config_reader():
    reader = ConfigReader()
    reader.parse(CONFIG)
    assert set(reader.models) == {"mass_1", "mass_ratio", "redshift"}
    assert "mass_1_alpha" in reader.priors
    assert reader.priors["mass_ratio_minimum"] == 0.02
    assert reader.sampler_conf["kernel"] == "NUTS"
    model = construct_hierarchical_model(reader.models, reader.priors, **reader.likelihood_kwargs)
    assert callable(model)


def test_dotted_path_aliasing():
    # reference-era module paths resolve onto this package
    cls = load_dist_from_string("gwinferno.numpyro_distributions.Powerlaw")
    from gwinferno_tpu.population_distributions import Powerlaw

    assert cls is Powerlaw
    cls2 = load_dist_from_string("numpyro.distributions.Normal")
    from gwinferno_tpu.ppl.distributions import Normal

    assert cls2 is Normal


def test_config_py_reader():
    reader = ConfigReader()
    reader.parse(CONFIG_PY)
    assert "file_path" in reader.models
    model = load_model_from_python_file(os.path.join(REPO, reader.models.pop("file_path")))
    assert callable(model)
    assert not reader.priors


def test_config_driven_potential_energy(pe_inj_file):
    """The full config-driven model evaluates to a finite potential energy."""
    reader = ConfigReader()
    reader.parse(CONFIG)
    reader.priors["redshift_maximum"] = 2.3
    model = construct_hierarchical_model(reader.models, reader.priors, **reader.likelihood_kwargs)
    pedict, injdict, constants, _ = load_pe_and_injections_as_dict(pe_inj_file)
    rng = np.random.default_rng(0)
    idx = rng.choice(pedict["mass_1"].shape[1], size=100, replace=False)
    pedict = {k: v[:, idx] for k, v in pedict.items()}
    args = (pedict, injdict, constants["total_inj"], constants["nObs"], constants["obs_time"])
    params = {
        "mass_1_alpha": jnp.array(-3.0),
        "mass_1_minimum": jnp.array(4.9),
        "mass_1_maximum": jnp.array(99.0),
        "mass_ratio_alpha": jnp.array(1.0),
        "redshift_lamb": jnp.array(2.0),
        "unscaled_rate": jnp.array(30.0),
    }
    params_u = ppl.unconstrain_fn(model, args, {}, params)
    pe = float(ppl.potential_energy(model, args, {}, params_u))
    assert np.isfinite(pe)
