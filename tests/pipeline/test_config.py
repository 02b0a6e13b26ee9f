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


_IID_MODELS_TMPL = """
label: iid_roundtrip
outdir: /tmp/iid_roundtrip

models:
  mass_1:
    model: gwinferno.numpyro_distributions.Powerlaw
    hyper_params:
      alpha:
        prior: numpyro.distributions.Normal
        prior_params:
          loc: 0.0
          scale: 3.0
      minimum:
        value: 5.0
      maximum:
        value: 100.0
  mass_ratio:
    model: gwinferno.numpyro_distributions.Powerlaw
    hyper_params:
      alpha:
        value: 1.0
      minimum:
        value: 0.02
      maximum:
        value: 1.0
  redshift:
    model: gwinferno.numpyro_distributions.PowerlawRedshift
    hyper_params:
      lamb:
        value: 2.0
      maximum:
        value: 2.3
  a_1:
    model: gwinferno.numpyro_distributions.Powerlaw
    hyper_params:
      alpha:
        prior: numpyro.distributions.Normal
        prior_params:
          loc: 0.0
          scale: 2.0
      minimum:
        value: 0.001
      maximum:
        value: 1.0
{a1_extra}
{a2_block}
sampler:
  kernel: NUTS

likelihood:
  marginalize_selection: false
  min_neff_cut: false
  max_variance_cut: false
  posterior_predictive_check: false
"""

_IID_ALIAS = """    iid:
      shared_parameter: a_2
"""

_A2_EXPLICIT = """  a_2:
    model: gwinferno.numpyro_distributions.Powerlaw
    hyper_params:
      alpha:
        value: 1.3
      minimum:
        value: 0.001
      maximum:
        value: 1.0
"""


def test_iid_alias_roundtrip(pe_inj_file, tmp_path):
    """An ``iid: shared_parameter`` block must reuse the source block's model:
    the config with ``a_1 iid-> a_2`` evaluates to exactly the same log
    density as an explicit config whose a_2 block pins the same alpha."""
    cfg_iid = tmp_path / "iid.yml"
    cfg_iid.write_text(_IID_MODELS_TMPL.format(a1_extra=_IID_ALIAS, a2_block=""))
    cfg_exp = tmp_path / "explicit.yml"
    cfg_exp.write_text(_IID_MODELS_TMPL.format(a1_extra="", a2_block=_A2_EXPLICIT))

    pedict, injdict, constants, _ = load_pe_and_injections_as_dict(pe_inj_file)
    rng = np.random.default_rng(1)
    idx = rng.choice(pedict["mass_1"].shape[1], size=50, replace=False)
    pedict = {k: v[:, idx] for k, v in pedict.items()}
    args = (pedict, injdict, constants["total_inj"], constants["nObs"], constants["obs_time"])
    params = {"mass_1_alpha": jnp.array(-2.0), "a_1_alpha": jnp.array(1.3), "unscaled_rate": jnp.array(40.0)}

    vals = []
    for cfg in (cfg_iid, cfg_exp):
        reader = ConfigReader()
        reader.parse(str(cfg))
        model = construct_hierarchical_model(reader.models, reader.priors, **reader.likelihood_kwargs)
        ld, _ = ppl.log_density(model, args, {}, params)
        vals.append(float(ld))

    reader = ConfigReader()
    reader.parse(str(cfg_iid))
    assert reader.models["a_2"] == "a_1"
    assert np.isfinite(vals[0])
    np.testing.assert_allclose(vals[0], vals[1], rtol=1e-12)


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
        "mass_1_maximum": jnp.array(90.0),
        "mass_1_alpha_min": jnp.array(2.0),
        "mass_1_alpha_max": jnp.array(10.0),
        "mass_ratio_alpha": jnp.array(1.0),
        "redshift_lamb": jnp.array(2.0),
        "unscaled_rate": jnp.array(30.0),
    }
    params_u = ppl.unconstrain_fn(model, args, {}, params)
    pe = float(ppl.potential_energy(model, args, {}, params_u))
    assert np.isfinite(pe)
