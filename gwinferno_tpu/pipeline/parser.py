"""Config-file and CLI parsing for analysis pipelines.

YAML schema parity with the reference (gwinferno/pipeline/parser.py:48-118):
top-level ``label``/``outdir``/``data``/``sampler``/``likelihood``/``models``;
per-parameter blocks with ``model`` + ``hyper_params`` (each either
``prior``+``prior_params`` -> sampled, or ``value`` -> fixed constant, list
values -> arrays); mixtures via ``"Mixture" in model`` with ``mixture_dist``
and ``component_{i}`` blocks (N inferred from the Dirichlet concentration
length); ``iid: {shared_parameter: ...}`` aliasing; ``python_file`` escape
hatch.  Dotted-path class resolution maps ``gwinferno.*`` onto this package
so existing reference configs run unmodified.
"""

from __future__ import annotations

import sys
from argparse import ArgumentParser
from importlib import import_module

import jax.numpy as jnp
import yaml

__all__ = [
    "PopModel",
    "PopPrior",
    "PopMixtureModel",
    "load_model_from_python_file",
    "load_dist_from_string",
    "ConfigReader",
    "load_base_parser",
]


class PopModel:
    """Typed config record: population-model callable + hyperparameter names."""

    def __init__(self, model, params):
        self.model = model
        self.params = params


class PopPrior:
    """Typed config record: hyperprior distribution class + its kwargs."""

    def __init__(self, dist, params):
        self.dist = dist
        self.params = params


class PopMixtureModel(PopModel):
    def __init__(self, model, mix_dist, mix_params, components, component_params):
        self.model = model
        self.components = components
        self.mixing_dist = mix_dist
        self.mixing_params = mix_params
        self.component_params = component_params


def load_model_from_python_file(path):
    """Import ``model`` from a user python file (sys.path side-load)."""
    fn = path.split("/")[-1]
    direct = path.replace(f"/{fn}", "")
    sys.path.append(direct)
    return getattr(import_module(fn.replace(".py", "")), "model")


# Accept reference-era dotted paths in existing configs.
_MODULE_ALIASES = {
    "gwinferno": "gwinferno_tpu",
    "numpyro.distributions": "gwinferno_tpu.ppl.distributions",
    "gwinferno.numpyro_distributions": "gwinferno_tpu.population_distributions",
    "gwinferno_tpu.numpyro_distributions": "gwinferno_tpu.population_distributions",
}


def _alias_module(module):
    # longest prefix wins so "gwinferno.numpyro_distributions" isn't shadowed
    # by the bare "gwinferno" alias
    for old in sorted(_MODULE_ALIASES, key=len, reverse=True):
        new = _MODULE_ALIASES[old]
        if module == old:
            return new
        if module.startswith(old + "."):
            return new + module[len(old):]
    return module


def load_dist_from_string(dist):
    """Resolve a dotted path to a class/callable, mapping reference module
    names onto this package (parity: parser.py:41-45)."""
    split_d = dist.split(".")
    module = ".".join(split_d[:-1])
    function = split_d[-1]
    for candidate in (_alias_module(module), module):
        try:
            return getattr(import_module(candidate), function)
        except (ImportError, AttributeError):
            continue
    raise ImportError(f"cannot resolve '{dist}' (tried module '{_alias_module(module)}' and '{module}')")


class ConfigReader:
    """Parse a YAML analysis config into model/prior dicts + run settings."""

    def __init__(self):
        self.models = {}
        self.priors = {}
        self.sampling_params = []
        self.label = None
        self.outdir = None
        self.data_conf = None
        self.sampler_conf = None
        self.likelihood_kwargs = None

    def parse(self, yml_file):
        with open(yml_file, "r") as f:
            yml = yaml.safe_load(f)
        self.label = yml.pop("label", "label")
        self.outdir = yml.pop("outdir", "./")
        self.data_conf = yml.pop("data", {})
        self.sampler_conf = yml.pop("sampler", {})
        self.likelihood_kwargs = yml.pop("likelihood", {})
        self.construct_model_and_prior_dicts(yml["models"])

    def construct_model_and_prior_dicts(self, yml):
        if "python_file" in yml:
            self.models["file_path"] = yml["python_file"]
        else:
            for param in yml:
                if "Mixture" in yml[param]["model"]:
                    self.add_mixture_model(param, yml[param])
                else:
                    self.add_model(param, yml[param])

    def add_prior(self, key, subd):
        if "prior" in subd and "prior_params" in subd:
            for k in subd["prior_params"]:
                if type(subd["prior_params"][k]) is list:
                    subd["prior_params"][k] = jnp.array(subd["prior_params"][k])
            self.priors[key] = PopPrior(load_dist_from_string(subd["prior"]), subd["prior_params"])
            self.sampling_params.append(key)
        elif "value" in subd:
            if type(subd["value"]) is list:
                self.priors[key] = jnp.array(subd["value"])
            else:
                self.priors[key] = subd["value"]

    def add_model(self, param, subd):
        self.models[param] = PopModel(load_dist_from_string(subd["model"]), [p for p in subd["hyper_params"]])
        for hp in subd["hyper_params"]:
            self.add_prior(f"{param}_{hp}", subd["hyper_params"][hp])
        if "iid" in subd:
            self.add_iid_model(param, subd["iid"]["shared_parameter"])

    def add_iid_model(self, param, shared_param):
        self.models[shared_param] = param

    def add_mixture_model(self, param, subd):
        model = load_dist_from_string(subd["model"])
        mix_dist = load_dist_from_string(subd["mixture_dist"]["model"])
        mix_params = [p for p in subd["mixture_dist"]["hyper_params"]]
        N = len(subd["mixture_dist"]["hyper_params"][mix_params[0]]["prior_params"]["concentration"])
        for hp in mix_params:
            self.add_prior(f"{param}_mixture_dist_{hp}", subd["mixture_dist"]["hyper_params"][hp])
        components = []
        component_params = []
        for i in range(N):
            name = f"component_{i + 1}"
            components.append(load_dist_from_string(subd[name]["model"]))
            component_params.append([p for p in subd[name]["hyper_params"]])
            for hp in subd[name]["hyper_params"]:
                self.add_prior(f"{param}_component_{i + 1}_{hp}", subd[name]["hyper_params"][hp])
        self.models[param] = PopMixtureModel(model, mix_dist, mix_params, components, component_params)
        if "iid" in subd[name]:
            self.add_iid_model(param, subd[name]["iid"]["shared_parameter"])


def load_base_parser():
    parser = ArgumentParser()
    parser.add_argument("--data-dir", type=str, default="./data")
    parser.add_argument("--inj-file", type=str, default="./data/injections.h5")
    parser.add_argument("--outdir", type=str, default="results")
    parser.add_argument("--mmin", type=float, default=3.0)
    parser.add_argument("--mmax", type=float, default=100.0)
    parser.add_argument("--chains", type=int, default=1)
    parser.add_argument("--samples", type=int, default=1500)
    parser.add_argument("--thinning", type=int, default=1)
    parser.add_argument("--warmup", type=int, default=500)
    parser.add_argument("--skip-inference", action="store_true", default=False)
    return parser
