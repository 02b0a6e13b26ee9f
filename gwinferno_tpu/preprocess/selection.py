"""Injection search-result readers and importance resampling.

Schema parity with the reference loaders (gwinferno/preprocess/selection.py):
the LVK O3 sensitivity-injection HDF5 layout (``injections`` group with
``mass1_source``/``mass2_source``/``redshift``/``spin*z``/``sampling_pdf``/
ifar columns, ``total_generated`` attr) and the O4a cumulative layout
(``events`` structured array with lnpdraw + weights).
"""

from __future__ import annotations

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.dataset import DataArray

__all__ = [
    "get_o4a_cumulative_injection_dict",
    "get_o3_cumulative_injection_dict",
    "resample_injections",
]


def _as_inj_dataarray(injs, total_generated, analysis_time):
    injdata = np.array([np.asarray(injs[param]) for param in list(injs.keys())])
    return DataArray(
        injdata,
        ("param", "injection"),
        coords={"param": np.array(list(injs.keys())), "injection": np.arange(injdata.shape[1])},
        attrs={"total_generated": total_generated, "analysis_time": analysis_time},
    )


def get_o4a_cumulative_injection_dict(file, param_names, snr_threshold=10, ifar_threshold=1):
    """O4a cumulative injection loader: found = semianalytic SNR >= thresh OR
    any far column <= 1/ifar; prior = exp(lnpdraw)/weights with q-jacobian and
    spin-magnitude factors.

    Parity: gwinferno/preprocess/selection.py:12-79.
    """
    with h5py.File(file, "r") as ff:
        total_generated = ff.attrs["total_generated"]
        injections = np.asarray(ff["events"][:])
        analysis_time = None
        for key in ("analysis_time", "total_analysis_time", "analysis_time_s"):
            if key in ff.attrs:
                analysis_time = ff.attrs[key]
        if analysis_time is None:
            raise Exception("analysis time not found")

    found = injections["semianalytic_observed_phase_maximized_snr_net"] >= snr_threshold
    for key in injections.dtype.names:
        if "far" in key:
            found |= injections[key] <= 1 / ifar_threshold

    inj_weights = injections[found]["weights"]
    injs = dict(
        mass_1=injections["mass1_source"][found],
        mass_2=injections["mass2_source"][found],
        mass_ratio=injections["mass2_source"][found] / injections["mass1_source"][found],
        redshift=injections["redshift"][found],
    )
    analysis_time = analysis_time / 365.25 / 24 / 60 / 60
    injs["prior"] = (
        np.exp(injections["lnpdraw_mass1_source_mass2_source_redshift_spin1x_spin1y_spin1z_spin2x_spin2y_spin2z"][found])
        / inj_weights
    )
    if "mass_ratio" in param_names:
        injs["prior"] *= injections["mass1_source"][found]
    if ("a_1" in param_names) | ("chi_eff" in param_names):
        for ii in [1, 2]:
            injs[f"a_{ii}"] = (
                injections[f"spin{ii}x"][found] ** 2
                + injections[f"spin{ii}y"][found] ** 2
                + injections[f"spin{ii}z"][found] ** 2
            ) ** 0.5
            injs[f"cos_tilt_{ii}"] = injections[f"spin{ii}z"][found] / injs[f"a_{ii}"]
        injs["prior"] *= (2 * np.pi * injs["a_1"] ** 2) * (2 * np.pi * injs["a_2"] ** 2)

    return _as_inj_dataarray(injs, total_generated, analysis_time)


def get_o3_cumulative_injection_dict(fi, param_names, ifar_threshold=1, snr_threshold=10, additional_cuts=None):
    """O3 sensitivity-injection loader (LVK zenodo record 5546676 schema).

    found = any ifar column > threshold, plus o1/o2 SNR cut when a ``name``
    column exists.  Parity: gwinferno/preprocess/selection.py:82-140.
    """
    with h5py.File(fi, "r") as ff:
        data = ff["injections"]
        found = np.zeros_like(data["mass1_source"][()], dtype=bool)
        for key in data:
            if "ifar" in key.lower():
                found = found | (data[key][()] > ifar_threshold)
        if "name" in data.keys():
            gwtc1 = (data["name"][()] == b"o1") | (data["name"][()] == b"o2")
            found = found | (gwtc1 & (data["optimal_snr_net"][()] > snr_threshold))
        if additional_cuts is not None:
            for k in additional_cuts.keys():
                found = found | (data[k][()] >= additional_cuts[k])
        n_found = int(found.sum())
        injs = dict(
            mass_1=data["mass1_source"][()][found],
            mass_2=data["mass2_source"][()][found],
            mass_ratio=data["mass2_source"][()][found] / data["mass1_source"][()][found],
            redshift=data["redshift"][()][found],
        )
        # total_generated appears as a group attr in some LVK releases and a
        # scalar dataset in others (reference selection.py:110-112 reads the
        # attr; real O3 files have shipped both layouts)
        if "total_generated" in data.attrs:
            tg = data.attrs["total_generated"]
        elif "total_generated" in data:
            tg = data["total_generated"][()]
        else:
            raise KeyError("injections group has neither a total_generated attr nor dataset")
        total_generated = tg[()] if hasattr(tg, "__getitem__") and not np.isscalar(tg) else tg
        analysis_time = None
        for attrs in (ff.attrs, data.attrs):
            for key in ("analysis_time", "total_analysis_time", "analysis_time_s"):
                if key in attrs and analysis_time is None:
                    at = attrs[key]
                    analysis_time = (at[()] if hasattr(at, "__getitem__") and not np.isscalar(at) else at) / 365.25 / 24 / 60 / 60
        if analysis_time is None:
            raise Exception("analysis time not found")

        injs["prior"] = data["sampling_pdf"][()][found]
        if ("a_1" in param_names) | ("chi_eff" in param_names):
            for ii in [1, 2]:
                sx = data[f"spin{ii}x"][()][found] if f"spin{ii}x" in data else np.zeros(n_found)
                sy = data[f"spin{ii}y"][()][found] if f"spin{ii}y" in data else np.zeros(n_found)
                sz = data[f"spin{ii}z"][()][found]
                injs[f"a_{ii}"] = (sx**2 + sy**2 + sz**2) ** 0.5
                injs[f"cos_tilt_{ii}"] = sz / injs[f"a_{ii}"]
            injs["prior"] *= (2 * np.pi * injs["a_1"] ** 2) * (2 * np.pi * injs["a_2"] ** 2)
        if "mass_ratio" in param_names:
            injs["prior"] *= data["mass1_source"][()][found]

    return _as_inj_dataarray(injs, total_generated, analysis_time)


def resample_injections(rng_key, model_prob, injdata, Ndraw, param_map, **kwargs):
    """Importance-resample the injection bank to a target population,
    recomputing the effective prior and N_eff.

    Parity: gwinferno/preprocess/selection.py:143-156.
    """
    wts = model_prob(injdata, **kwargs) / injdata[param_map["prior"], :]
    p = wts / jnp.sum(wts)
    Ndet = len(p)
    N = int((jnp.sum(wts)) ** 2 // jnp.sum(wts * wts))
    norm = jnp.sum(wts) / Ndraw
    idxs = jax.random.choice(rng_key, Ndet, shape=[N], replace=True, p=p)
    injdata_new = injdata.at[:, idxs].get()
    p_new = model_prob(injdata_new, **kwargs) / norm
    injdata_new = injdata_new.at[param_map["prior"], :].set(p_new)
    s2_new = jnp.sum(wts * wts) / (Ndraw * Ndraw) - norm * norm / Ndraw
    Neff_new = norm * norm / s2_new
    return (injdata_new, N, Neff_new)
