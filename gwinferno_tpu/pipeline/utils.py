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

import sys

import jax.numpy as jnp
import numpy as np

from jax.scipy.linalg import solve_triangular

from .. import ppl
from ..models.bsplines.smoothing import apply_difference_prior
from ..models.bsplines.smoothing import prior_precision_cholesky
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
    parser.add_argument("--reparam", type=str, default="centered",
                        choices=["centered", "whitened"],
                        help="B-spline coefficient-prior parameterization: 'centered' is the "
                        "reference's (iid Normal sites + smoothing factors); 'whitened' samples "
                        "standard normals and maps through the prior-precision Cholesky -- "
                        "identical prior, isotropic sampling geometry (recommended)")
    parser.add_argument("--m-tau", type=float, default=1.0,
                        help="P-spline smoothing strength, primary-mass coefficients")
    parser.add_argument("--q-tau", type=float, default=1.0,
                        help="P-spline smoothing strength, mass-ratio coefficients")
    parser.add_argument("--a-tau", type=float, default=25.0,
                        help="P-spline smoothing strength, spin-magnitude coefficients "
                        "(reference default 25; smaller = less smoothing bias on sharp features)")
    parser.add_argument("--ct-tau", type=float, default=25.0,
                        help="P-spline smoothing strength, spin-tilt coefficients")
    parser.add_argument("--z-tau", type=float, default=1.0,
                        help="P-spline smoothing strength, redshift coefficients")
    return parser


def load_pe_and_injections_as_dict(file, ignore=None):
    """Load the pe+injection handoff artifact.

    Returns ``(pedict {param: (N_obs, N_samp)}, injdict {param: (N_found,)},
    constants {total_inj, obs_time, nObs}, param_names)``.
    Parity: gwinferno/pipeline/utils.py:51-96.
    """
    groups = load_groups(file)
    pe, inj = groups["pe_data"], groups["inj_data"]
    print(f"data file {file} loaded", file=sys.stderr)

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

def _coef_block(site, factor_site, n, sig, tau, degree, reparam, pin_first=False):
    """One B-spline coefficient block under either parameterization.

    centered (reference parity): iid ``Normal(0, sig)`` site named ``site``
    plus the difference-penalty ``factor_site``; returns the sampled vector
    (without the pinned leading zero when ``pin_first``).

    whitened (non-centered): samples ``u ~ N(0, I)`` at ``site + "_white"``
    and records ``c = L^{-T} u`` as the deterministic site ``site``, where
    ``L`` is the Cholesky of the combined prior precision
    ``I/sig^2 + tau D^T D`` (prior_precision_cholesky).  The implied prior on
    ``c`` is EXACTLY the centered one (tested to a constant in
    tests/models/test_whitened_reparam.py); the sampled geometry is isotropic,
    which is what a diagonal mass matrix can actually precondition.
    """
    if reparam == "whitened":
        L = prior_precision_cholesky(n, sig, tau, degree=degree, drop_first=pin_first)
        u = ppl.sample(site + "_white", dist.Normal(0.0, 1.0), sample_shape=(L.shape[0],))
        c = solve_triangular(jnp.asarray(L, dtype=u.dtype), u, lower=True, trans="T")
        return ppl.deterministic(site, c)
    if reparam != "centered":
        raise ValueError(f"unknown reparam {reparam!r}: expected 'centered' or 'whitened'")
    cs = ppl.sample(site, dist.Normal(0.0, sig), sample_shape=(n - int(pin_first),))
    padded = jnp.concatenate([jnp.zeros(1, cs.dtype), cs]) if pin_first else cs
    ppl.factor(factor_site, apply_difference_prior(padded, tau, degree=degree))
    return cs


def bspline_mass_prior(m_nsplines=None, q_nsplines=None, m_tau=1, q_tau=1, name=None, m_cs_sig=15, q_cs_sig=5, m_deg=1, q_deg=1, reparam="centered"):
    """Mass B-spline coefficient priors + P-spline smoothing penalties.

    Parity: gwinferno/pipeline/utils.py:161-180 (site names and defaults).
    ``reparam="whitened"`` swaps in the non-centered parameterization with
    the identical prior (see _coef_block).
    """
    name = "_" + name if name is not None else ""
    mass_cs = q_cs = None
    if m_nsplines is not None:
        mass_cs = _coef_block("mass_cs" + name, "mass_smoothing_prior" + name,
                              m_nsplines, m_cs_sig, m_tau, m_deg, reparam)
    if q_nsplines is not None:
        q_cs = _coef_block("q_cs" + name, "q_smoothing_prior" + name,
                           q_nsplines, q_cs_sig, q_tau, q_deg, reparam)
    if m_nsplines is not None and q_nsplines is None:
        return mass_cs
    if m_nsplines is None and q_nsplines is not None:
        return q_cs
    if m_nsplines is None and q_nsplines is None:
        raise AssertionError("number of mass splines or q splines must be specified.")
    return mass_cs, q_cs


def bspline_spin_prior(a_nsplines=None, ct_nsplines=None, a_tau=None, ct_tau=None, name=None, IID=False, a_cs_sig=5, ct_cs_sig=5, a_deg=2, ct_deg=2, reparam="centered"):
    """Spin coefficient priors + smoothing (parity: pipeline/utils.py:183-207)."""
    name = "_" + name if name is not None else ""
    if IID:
        a_cs = _coef_block("a_cs" + name, "a_smoothing_prior" + name,
                           a_nsplines, a_cs_sig, a_tau, a_deg, reparam)
        ct_cs = _coef_block("tilt_cs" + name, "ct_smoothing_prior" + name,
                            ct_nsplines, ct_cs_sig, ct_tau, ct_deg, reparam)
        return a_cs, ct_cs
    a1_cs = _coef_block("a1_cs" + name, "a1_smoothing_prior" + name,
                        a_nsplines, a_cs_sig, a_tau, a_deg, reparam)
    a2_cs = _coef_block("a2_cs" + name, "a2_smoothing_prior" + name,
                        a_nsplines, a_cs_sig, a_tau, a_deg, reparam)
    ct1_cs = _coef_block("tilt1_cs" + name, "ct1_smoothing_prior" + name,
                         ct_nsplines, ct_cs_sig, ct_tau, ct_deg, reparam)
    ct2_cs = _coef_block("tilt2_cs" + name, "ct2_smoothing_prior" + name,
                         ct_nsplines, ct_cs_sig, ct_tau, ct_deg, reparam)
    return a1_cs, ct1_cs, a2_cs, ct2_cs


def bspline_redshift_prior(z_nsplines=None, z_tau=None, name=None, z_cs_sig=1, z_deg=2, reparam="centered"):
    """Redshift coefficient prior; first coefficient pinned to 0.

    Parity: gwinferno/pipeline/utils.py:210-215.  The site (and, whitened,
    the deterministic ``z_cs``) holds the n-1 FREE coefficients; the pinned
    zero is prepended here and by the PPD calculators.
    """
    name = "_" + name if name is not None else ""
    z_cs = _coef_block("z_cs" + name, "z_smoothing_prior" + name,
                       z_nsplines, z_cs_sig, z_tau, z_deg, reparam, pin_first=True)
    return jnp.concatenate([jnp.zeros(1, z_cs.dtype), z_cs])


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
