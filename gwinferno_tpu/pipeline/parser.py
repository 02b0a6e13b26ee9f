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

import importlib.util
from argparse import ArgumentParser
from dataclasses import dataclass
from importlib import import_module
from pathlib import Path

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


@dataclass
class PopModel:
    """Typed config record: population-model callable + hyperparameter names."""

    model: object
    params: list


@dataclass
class PopPrior:
    """Typed config record: hyperprior distribution class + its kwargs."""

    dist: object
    params: dict


class PopMixtureModel(PopModel):
    """Config record for a mixture parameter: outer mixture callable, mixing
    distribution + its hyperparameter names, and per-component callables with
    their hyperparameter name lists."""

    def __init__(self, model, mix_dist, mix_params, components, component_params):
        self.model = model
        self.mixing_dist = mix_dist
        self.mixing_params = mix_params
        self.components = components
        self.component_params = component_params


def load_model_from_python_file(path):
    """Import the ``model`` symbol from a user python file.

    Loaded directly from the file path (importlib spec machinery) rather than
    the reference's sys.path append + module-name import, which breaks when
    two configs point at same-named files in different directories.
    """
    spec = importlib.util.spec_from_file_location(Path(path).stem, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.model


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
    module, _, symbol = dist.rpartition(".")
    for candidate in (_alias_module(module), module):
        try:
            return getattr(import_module(candidate), symbol)
        except (ImportError, AttributeError):
            continue
    raise ImportError(f"cannot resolve '{dist}' (tried module '{_alias_module(module)}' and '{module}')")


def _as_array_if_list(v):
    """YAML lists become jnp arrays; scalars pass through (schema rule:
    list-valued prior params / fixed values are coefficient vectors)."""
    return jnp.array(v) if isinstance(v, list) else v


def _hyper_param_entries(prefix, hyper_block):
    """Walk one ``hyper_params`` mapping and yield flat prior-table rows.

    Each hyperparameter block is either sampled (``prior`` + ``prior_params``
    -> a (key, PopPrior, True) row) or pinned (``value`` -> a (key, constant,
    False) row); anything else is silently skipped, matching the schema's
    permissiveness.  Keys are ``{prefix}_{name}`` -- the site names the
    constructed model will sample.
    """
    for name, spec in hyper_block.items():
        key = f"{prefix}_{name}" if prefix else name
        if "prior" in spec and "prior_params" in spec:
            cls = load_dist_from_string(spec["prior"])
            kwargs = {k: _as_array_if_list(v) for k, v in spec["prior_params"].items()}
            yield key, PopPrior(cls, kwargs), True
        elif "value" in spec:
            yield key, _as_array_if_list(spec["value"]), False


def _component_blocks(subd):
    """Yield ``(index, block)`` for the ``component_{i}`` sub-blocks of a
    mixture parameter, in index order starting at 1."""
    i = 1
    while f"component_{i}" in subd:
        yield i, subd[f"component_{i}"]
        i += 1


class ConfigReader:
    """Parse a YAML analysis config into model/prior dicts + run settings.

    Schema (parity with the reference's ConfigReader,
    gwinferno/pipeline/parser.py:48-118 -- the *schema* is the spec; this
    walker is an independent implementation): top-level ``label``/``outdir``/
    ``data``/``sampler``/``likelihood``/``models``; under ``models`` either a
    ``python_file`` escape hatch or one block per source parameter with
    ``model`` (dotted path) + ``hyper_params``; mixture models are any block
    whose model name contains ``"Mixture"``, carrying a ``mixture_dist``
    block plus ``component_1..N`` blocks; ``iid: {shared_parameter: x}``
    aliases parameter ``x`` to this block's model.

    Results land in ``models`` (param -> PopModel/PopMixtureModel, or an
    alias string for iid parameters), ``priors`` (flat site name -> PopPrior
    or pinned constant), and ``sampling_params`` (site names to sample, in
    declaration order).
    """

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
            conf = yaml.safe_load(f)
        self.label = conf.get("label", "label")
        self.outdir = conf.get("outdir", "./")
        self.data_conf = conf.get("data", {})
        self.sampler_conf = conf.get("sampler", {})
        self.likelihood_kwargs = conf.get("likelihood", {})
        self.construct_model_and_prior_dicts(conf["models"])

    def construct_model_and_prior_dicts(self, models_block):
        if "python_file" in models_block:
            self.models["file_path"] = models_block["python_file"]
            return
        for param, subd in models_block.items():
            is_mixture = "Mixture" in subd["model"]
            builder = self.add_mixture_model if is_mixture else self.add_model
            builder(param, subd)

    def _record(self, entries):
        """Commit prior-table rows produced by :func:`_hyper_param_entries`."""
        for key, record, sampled in entries:
            self.priors[key] = record
            if sampled:
                self.sampling_params.append(key)

    def add_prior(self, key, subd):
        """Register a single hyperparameter block under flat name ``key``."""
        self._record((key, rec, s) for _, rec, s in _hyper_param_entries("", {key: subd}))

    def add_model(self, param, subd):
        cls = load_dist_from_string(subd["model"])
        self.models[param] = PopModel(cls, list(subd["hyper_params"]))
        self._record(_hyper_param_entries(param, subd["hyper_params"]))
        if "iid" in subd:
            self.add_iid_model(param, subd["iid"]["shared_parameter"])

    def add_iid_model(self, param, shared_param):
        # alias: the shared parameter reuses `param`'s constructed model
        self.models[shared_param] = param

    def add_mixture_model(self, param, subd):
        mix_block = subd["mixture_dist"]
        self._record(_hyper_param_entries(f"{param}_mixture_dist", mix_block["hyper_params"]))

        components, component_params = [], []
        last_block = None
        for i, block in _component_blocks(subd):
            components.append(load_dist_from_string(block["model"]))
            component_params.append(list(block["hyper_params"]))
            self._record(_hyper_param_entries(f"{param}_component_{i}", block["hyper_params"]))
            last_block = block

        self.models[param] = PopMixtureModel(
            load_dist_from_string(subd["model"]),
            load_dist_from_string(mix_block["model"]),
            list(mix_block["hyper_params"]),
            components,
            component_params,
        )
        if last_block is not None and "iid" in last_block:
            self.add_iid_model(param, last_block["iid"]["shared_parameter"])


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
