"""Pipeline plumbing: data loading, model setup, prior builders, result
containers.

Parity: gwinferno/pipeline/utils.py (argparse schema, the
``load_pe_and_injections_as_dict`` handoff-artifact reader, the B-spline
model-setup helpers and coefficient-prior builders, and the xarray result
converters -- here backed by the lightweight Dataset container since this
environment has no xarray).
"""

from __future__ import annotations

from argparse import ArgumentParser

import jax.numpy as jnp
import numpy as np

from .. import ppl
from ..models.bsplines.smoothing import apply_difference_prior
from ..ppl import distributions as dist
from ..utils.dataset import DataArray
from ..utils.dataset import Dataset
from ..utils.dataset import load_groups

__all__ = [
    "load_base_parser",
    "load_pe_and_injections_as_dict",
    "setup_bspline_mass_models",
    "setup_bspline_spin_models",
    "setup_powerlaw_spline_redshift_model",
    "bspline_mass_prior",
    "bspline_spin_prior",
    "bspline_redshift_prior",
    "posterior_dict_to_xarray",
    "pdf_dict_to_xarray",
]


def load_base_parser():
    parser = ArgumentParser()
    parser.add_argument("--pe-inj-file", type=str)
    parser.add_argument("--run-label", type=str)
    parser.add_argument("--result-dir", type=str)
    parser.add_argument("--m-nsplines", type=int, default=50)
    parser.add_argument("--q-nsplines", type=int, default=30)
    parser.add_argument("--a-nsplines", type=int, default=16)
    parser.add_argument("--tilt-nsplines", type=int, default=16)
    parser.add_argument("--z-nsplines", type=int, default=20)
    parser.add_argument("--fused", action="store_true", default=False,
                        help="run the importance-weight reductions through the fused Pallas TPU kernel")
    parser.add_argument("--mmin", type=float, default=3.0)
    parser.add_argument("--mmax", type=float, default=100.0)
    parser.add_argument("--chains", type=int, default=1)
    parser.add_argument("--samples", type=int, default=1500)
    parser.add_argument("--thinning", type=int, default=1)
    parser.add_argument("--warmup", type=int, default=1000)
    parser.add_argument("--skip-inference", action="store_true", default=False)
    parser.add_argument("--rngkey", type=int, default=1)
    parser.add_argument("--save-plots", type=bool, default=True)
    parser.add_argument("--max-steps-per-call", type=int, default=None,
                        help="segment the MCMC into fixed-size device calls (recommended "
                        "~25 on remote-TPU tunnels; long single programs have faulted)")
    parser.add_argument("--target-accept", type=float, default=0.8,
                        help="NUTS dual-averaging target acceptance probability")
    parser.add_argument("--max-tree-depth", type=int, default=10)
    parser.add_argument("--chain-scheduler", type=str, default="auto",
                        choices=["auto", "sync", "async"],
                        help="MCMC chain scheduler (auto = continuous batching when eligible)")
    return parser


def load_pe_and_injections_as_dict(file, ignore=None):
    """Load the pe+injection handoff artifact.

    Returns ``(pedict {param: (N_obs, N_samp)}, injdict {param: (N_found,)},
    constants {total_inj, obs_time, nObs}, param_names)``.
    Parity: gwinferno/pipeline/utils.py:51-96.
    """
    groups = load_groups(file)
    pe, inj = groups["pe_data"], groups["inj_data"]
    print(f"data file {file} loaded")

    pe_arr = pe["posteriors"]
    params = [str(p) for p in pe_arr.coords["param"]]
    events = np.asarray(pe_arr.coords["event"])
    if ignore is not None:
        sel = ~np.isin(events, np.asarray(ignore))
    else:
        sel = np.ones(len(events), dtype=bool)
    p_axis = pe_arr.dims.index("param")
    # HOST numpy banks (utils.host convention): models close over these as
    # compile-time constants; a device-resident bank would be fetched back
    # through the TPU tunnel at every jit lowering (~30 s/MB)
    pedict = {
        k: np.ascontiguousarray(np.take(pe_arr.data[sel], i, axis=p_axis))
        for i, k in enumerate(params)
    }

    inj_arr = inj["injections"]
    inj_params = [str(p) for p in inj_arr.coords["param"]]
    injdict = {k: np.ascontiguousarray(inj_arr.data[i]) for i, k in enumerate(inj_params)}

    attrs = dict(inj_arr.attrs) or dict(inj.attrs)
    constants = {
        "total_inj": float(attrs["total_generated"]),
        "obs_time": float(attrs["analysis_time"]),
        "nObs": int(sel.sum()),
    }
    param_names = [p for p in params]
    return pedict, injdict, constants, param_names


# --------------------------------------------------------------- model setup

def setup_bspline_mass_models(pedict, injdict, nsplines_m, nsplines_q, mmin, mmax, m2min=None):
    """Construct the production mass model (LogXLogY m1 x LogY q B-splines)
    with design matrices cached over the PE and injection banks.

    Parity: gwinferno/pipeline/utils.py:104-118.
    """
    from ..models.bsplines.separable import BSplinePrimaryBSplineRatio

    return BSplinePrimaryBSplineRatio(
        nsplines_m,
        nsplines_q,
        pedict["mass_1"],
        injdict["mass_1"],
        pedict["mass_ratio"],
        injdict["mass_ratio"],
        m1min=mmin,
        m2min=m2min if m2min is not None else mmin,
        mmax=mmax,
    )


def setup_bspline_spin_models(pedict, injdict, nsplines_mag, nsplines_tilt, iid=True):
    """IID or independent B-spline spin magnitude+tilt models.

    Parity: gwinferno/pipeline/utils.py:121-146.
    """
    from ..models.bsplines.separable import BSplineIIDSpinMagnitudes
    from ..models.bsplines.separable import BSplineIIDSpinTilts
    from ..models.bsplines.separable import BSplineIndependentSpinMagnitudes
    from ..models.bsplines.separable import BSplineIndependentSpinTilts

    if iid:
        mag = BSplineIIDSpinMagnitudes(
            nsplines_mag, pedict["a_1"], pedict["a_2"], injdict["a_1"], injdict["a_2"]
        )
        tilt = BSplineIIDSpinTilts(
            nsplines_tilt, pedict["cos_tilt_1"], pedict["cos_tilt_2"], injdict["cos_tilt_1"], injdict["cos_tilt_2"]
        )
    else:
        mag = BSplineIndependentSpinMagnitudes(
            nsplines_mag, nsplines_mag, pedict["a_1"], pedict["a_2"], injdict["a_1"], injdict["a_2"]
        )
        tilt = BSplineIndependentSpinTilts(
            nsplines_tilt, nsplines_tilt, pedict["cos_tilt_1"], pedict["cos_tilt_2"], injdict["cos_tilt_1"], injdict["cos_tilt_2"]
        )
    return mag, tilt


def setup_powerlaw_spline_redshift_model(pedict, injdict, nsplines_z):
    """Powerlaw x exp(B-spline) redshift model with cached dVc/dz banks.

    Parity: gwinferno/pipeline/utils.py:149-155.
    """
    from ..models.spline_perturbation import PowerlawSplineRedshiftModel

    return PowerlawSplineRedshiftModel(nsplines_z, pedict["redshift"], injdict["redshift"])


# ------------------------------------------------------------- prior builders

def bspline_mass_prior(m_nsplines=None, q_nsplines=None, m_tau=1, q_tau=1, name=None, m_cs_sig=15, q_cs_sig=5, m_deg=1, q_deg=1):
    """Mass B-spline coefficient priors + P-spline smoothing penalties.

    Parity: gwinferno/pipeline/utils.py:161-180 (site names and defaults).
    """
    name = "_" + name if name is not None else ""
    mass_cs = q_cs = None
    if m_nsplines is not None:
        mass_cs = ppl.sample("mass_cs" + name, dist.Normal(0.0, m_cs_sig), sample_shape=(m_nsplines,))
        ppl.factor("mass_smoothing_prior" + name, apply_difference_prior(mass_cs, m_tau, degree=m_deg))
    if q_nsplines is not None:
        q_cs = ppl.sample("q_cs" + name, dist.Normal(0.0, q_cs_sig), sample_shape=(q_nsplines,))
        ppl.factor("q_smoothing_prior" + name, apply_difference_prior(q_cs, q_tau, degree=q_deg))
    if m_nsplines is not None and q_nsplines is None:
        return mass_cs
    if m_nsplines is None and q_nsplines is not None:
        return q_cs
    if m_nsplines is None and q_nsplines is None:
        raise AssertionError("number of mass splines or q splines must be specified.")
    return mass_cs, q_cs


def bspline_spin_prior(a_nsplines=None, ct_nsplines=None, a_tau=None, ct_tau=None, name=None, IID=False, a_cs_sig=5, ct_cs_sig=5, a_deg=2, ct_deg=2):
    """Spin coefficient priors + smoothing (parity: pipeline/utils.py:183-207)."""
    name = "_" + name if name is not None else ""
    if IID:
        a_cs = ppl.sample("a_cs" + name, dist.Normal(0.0, a_cs_sig), sample_shape=(a_nsplines,))
        ppl.factor("a_smoothing_prior" + name, apply_difference_prior(a_cs, a_tau, degree=a_deg))
        ct_cs = ppl.sample("tilt_cs" + name, dist.Normal(0.0, ct_cs_sig), sample_shape=(ct_nsplines,))
        ppl.factor("ct_smoothing_prior" + name, apply_difference_prior(ct_cs, ct_tau, degree=ct_deg))
        return a_cs, ct_cs
    a1_cs = ppl.sample("a1_cs" + name, dist.Normal(0.0, a_cs_sig), sample_shape=(a_nsplines,))
    ppl.factor("a1_smoothing_prior" + name, apply_difference_prior(a1_cs, a_tau, degree=a_deg))
    a2_cs = ppl.sample("a2_cs" + name, dist.Normal(0.0, a_cs_sig), sample_shape=(a_nsplines,))
    ppl.factor("a2_smoothing_prior" + name, apply_difference_prior(a2_cs, a_tau, degree=a_deg))
    ct1_cs = ppl.sample("tilt1_cs" + name, dist.Normal(0.0, ct_cs_sig), sample_shape=(ct_nsplines,))
    ppl.factor("ct1_smoothing_prior" + name, apply_difference_prior(ct1_cs, ct_tau, degree=ct_deg))
    ct2_cs = ppl.sample("tilt2_cs" + name, dist.Normal(0.0, ct_cs_sig), sample_shape=(ct_nsplines,))
    ppl.factor("ct2_smoothing_prior" + name, apply_difference_prior(ct2_cs, ct_tau, degree=ct_deg))
    return a1_cs, ct1_cs, a2_cs, ct2_cs


def bspline_redshift_prior(z_nsplines=None, z_tau=None, name=None, z_cs_sig=1, z_deg=2):
    """Redshift coefficient prior; first coefficient pinned to 0.

    Parity: gwinferno/pipeline/utils.py:210-215.
    """
    name = "_" + name if name is not None else ""
    z_cs = ppl.sample("z_cs" + name, dist.Normal(0.0, z_cs_sig), sample_shape=(z_nsplines - 1,))
    z_cs = jnp.concatenate([jnp.zeros(1), z_cs])
    ppl.factor("z_smoothing_prior" + name, apply_difference_prior(z_cs, z_tau, degree=z_deg))
    return z_cs


# ----------------------------------------------------------- result containers

def posterior_dict_to_xarray(posterior_dict, subpop_names=None):
    """Pack a posterior sample dict into a labeled Dataset (draw x ...).

    Parity surface: gwinferno/pipeline/utils.py:219-230.
    """
    variables = {}
    for k, v in posterior_dict.items():
        v = np.asarray(v)
        dims = ("draw",) + tuple(f"{k}_dim{i}" for i in range(v.ndim - 1))
        variables[k] = DataArray(v, dims, coords={"draw": np.arange(v.shape[0])})
    return Dataset(variables)


def pdf_dict_to_xarray(pdf_dict, param_dict, n_draws, subpop_names=None):
    """Pack PPD grids into a labeled Dataset (draw x grid per parameter).

    Parity surface: gwinferno/pipeline/utils.py:232-250.
    """
    variables = {}
    for k, pdfs in pdf_dict.items():
        pdfs = np.asarray(pdfs)
        grid = np.asarray(param_dict[k])
        variables[k] = DataArray(
            pdfs,
            ("draw", f"{k}_grid"),
            coords={"draw": np.arange(pdfs.shape[0]), f"{k}_grid": grid},
        )
    return Dataset(variables)
