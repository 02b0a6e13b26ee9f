"""Example-script harness: result dirs + analysis runners.

Parity: reference examples/utils.py:15-142, with the chain-parallelism knob
replaced by the framework's native batched-chain MCMC (no host-device-count
spoofing needed) and the stale hierarchical-likelihood kwargs fixed
(SURVEY.md S2.8).
"""

from __future__ import annotations

import os

import jax

from gwinferno_tpu.infer import MCMC
from gwinferno_tpu.infer import NUTS
from gwinferno_tpu.models.parametric.parametric import PowerlawRedshiftModel
from gwinferno_tpu.pipeline.utils import setup_bspline_mass_models
from gwinferno_tpu.pipeline.utils import setup_bspline_spin_models
from gwinferno_tpu.pipeline.utils import setup_powerlaw_spline_redshift_model


def setup_result_dir(args, default_label="run"):
    label = args.run_label or default_label
    result_dir = args.result_dir or f"results/{label}"
    os.makedirs(result_dir, exist_ok=True)
    return label, result_dir


def run_powerlawpeak_analysis(model, pedict, injdict, constants, param_names, args, skip_inference=False):
    """Build the redshift model, run NUTS on the powerlaw+peak model, return
    (posterior dict, z_model).  Parity: examples/utils.py:93-142."""
    z_model = PowerlawRedshiftModel(z_pe=pedict["redshift"], z_inj=injdict["redshift"])
    if skip_inference:
        return z_model

    def bound_model():
        model(
            pedict,
            injdict,
            constants["nObs"],
            constants["obs_time"],
            constants["total_inj"],
            z_model,
            args.mmin,
            args.mmax,
            param_names,
        )

    mcmc = MCMC(
        NUTS(
            bound_model,
            target_accept_prob=getattr(args, "target_accept", 0.8),
            max_tree_depth=getattr(args, "max_tree_depth", 10),
        ),
        num_warmup=args.warmup,
        num_samples=args.samples,
        num_chains=args.chains,
        thinning=args.thinning,
        progress_bar=True,
        max_steps_per_call=getattr(args, "max_steps_per_call", None),
        chain_scheduler=getattr(args, "chain_scheduler", "auto"),
    )
    mcmc.run(jax.random.PRNGKey(args.rngkey))
    mcmc.print_summary()
    posterior = {k: v for k, v in mcmc.get_samples().items()}
    posterior.update(mcmc.get_deterministic(site_names={"rate", "surveyed_hypervolume", "detection_efficiency"}))
    # derived beta-distribution shape parameters ride along
    return posterior, z_model


def run_bspline_analysis(model, pedict, injdict, constants, param_names, args, skip_inference=False):
    """Build all B-spline models, run NUTS, return (posterior, models).
    Parity: examples/utils.py:34-90.  With ``args.fused`` the importance-weight
    reductions run through the fused Pallas TPU kernel
    (gwinferno_tpu.models.bsplines.fused_path)."""
    mass_model = setup_bspline_mass_models(
        pedict, injdict, args.m_nsplines, args.q_nsplines, args.mmin, args.mmax
    )
    mag_model, tilt_model = setup_bspline_spin_models(pedict, injdict, args.a_nsplines, args.tilt_nsplines, iid=True)
    z_model = setup_powerlaw_spline_redshift_model(pedict, injdict, args.z_nsplines)
    models = {"mass": mass_model, "mag": mag_model, "tilt": tilt_model, "z": z_model}
    if skip_inference:
        return models

    fused_lik = None
    if getattr(args, "fused", False):
        from gwinferno_tpu.models.bsplines.fused_path import FusedBSplineLikelihood

        fused_lik = FusedBSplineLikelihood(
            mass_model, mag_model, tilt_model, z_model, pedict, injdict, constants["total_inj"]
        )

    def bound_model():
        model(
            pedict,
            injdict,
            constants["nObs"],
            constants["obs_time"],
            constants["total_inj"],
            mass_model,
            mag_model,
            tilt_model,
            z_model,
            args.mmin,
            args.mmax,
            param_names,
            fused_lik=fused_lik,
            reparam=getattr(args, "reparam", "centered"),
            m_tau=getattr(args, "m_tau", 1), q_tau=getattr(args, "q_tau", 1),
            a_tau=getattr(args, "a_tau", 25), ct_tau=getattr(args, "ct_tau", 25),
            z_tau=getattr(args, "z_tau", 1),
        )

    mcmc = MCMC(
        NUTS(
            bound_model,
            target_accept_prob=getattr(args, "target_accept", 0.8),
            max_tree_depth=getattr(args, "max_tree_depth", 10),
        ),
        num_warmup=args.warmup,
        num_samples=args.samples,
        num_chains=args.chains,
        thinning=args.thinning,
        progress_bar=True,
        max_steps_per_call=getattr(args, "max_steps_per_call", None),
        chain_scheduler=getattr(args, "chain_scheduler", "auto"),
    )
    mcmc.run(jax.random.PRNGKey(args.rngkey))
    mcmc.print_summary()
    posterior = {k: v for k, v in mcmc.get_samples().items()}
    # coefficient names are deterministic sites under --reparam whitened
    # (sample sites otherwise, where the extra names are simply absent)
    posterior.update(mcmc.get_deterministic(site_names={
        "rate", "surveyed_hypervolume", "detection_efficiency",
        "mass_cs", "q_cs", "a_cs", "tilt_cs", "z_cs",
        "a1_cs", "a2_cs", "tilt1_cs", "tilt2_cs",
    }))
    models["_mcmc"] = mcmc  # run metadata (ESS/r_hat/divergences) for perf tooling
    return posterior, models
