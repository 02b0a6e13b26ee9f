"""Hierarchical population likelihood with selection-effect correction.

The Monte-Carlo importance-sampled hierarchical likelihood over per-event PE
sample banks and found-injection sets -- semantic parity with
gwinferno/pipeline/analysis.py:50-356, re-expressed on this framework's PPL
and organized so the two hot reductions (per-event logsumexp over the sample
axis, detection-efficiency logsumexp over the injection axis) are single
fused XLA reductions that shard trivially over a device mesh
(shard-local logsumexp + psum combine; SURVEY.md S2.9).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from .. import ppl
from ..ops.fused import double_logsumexp
from ..ppl import distributions as dist
from ..infer import MCMC
from ..infer import NUTS
from ..infer import HMC
from ..infer import find_map  # re-export parity (analysis.py:24-47)
from .parser import PopMixtureModel
from .parser import PopModel
from .parser import PopPrior

__all__ = [
    "NP_KERNEL_MAP",
    "find_map",
    "per_event_log_bayes_factors",
    "detection_efficiency",
    "hierarchical_likelihood",
    "construct_hierarchical_model",
]

NP_KERNEL_MAP = {"NUTS": NUTS, "HMC": HMC}


@partial(jax.jit, static_argnames=["log"])
def per_event_log_bayes_factors(weights, log=False):
    r"""Per-event log Bayes factors by importance sampling over PE banks.

    ``weights``: ``(N_events, N_samples)`` (log-weights when ``log=True``).
    Returns ``(logBFs, log_n_effs, variances)``.

    Semantics: gwinferno/pipeline/analysis.py:50-88.  The log path never
    leaves log space (one fused pass computes ``logsumexp(w)`` and
    ``logsumexp(2w)`` -- see ops/fused.py for the Pallas TPU kernel), so it is
    f32-safe on TPU where the reference's linear path overflows.
    """
    n_samples = weights.shape[-1]
    if log:
        lse1, lse2 = double_logsumexp(weights)
        logn_effs = 2.0 * lse1 - lse2
        logBFs = lse1 - jnp.log(1.0 * n_samples)
    else:
        BFs = jnp.sum(weights, axis=1)
        n_effs = BFs**2 / jnp.sum(weights**2, axis=1)
        BFs = BFs / n_samples
        logBFs = jnp.log(BFs)
        logn_effs = jnp.log(n_effs)
    variances = jnp.exp(-logn_effs) - 1.0 / n_samples
    return logBFs, logn_effs, variances


@partial(jax.jit, static_argnames=["log"])
def detection_efficiency(weights, Ninj, log=False):
    r"""Detection efficiency mu (expected detected fraction) by importance
    sampling over found injections, with its MC effective sample size.

    ``weights``: ``(N_found,)``; ``Ninj``: total generated injections.
    Returns ``(log_mu, log_n_eff, variance)``.

    Semantics: gwinferno/pipeline/analysis.py:91-136 -- same estimator
    ``var = sum(w^2)/Ninj^2 - mu^2/Ninj``, but the log path evaluates it in
    shifted log space (``logvar = A + log1p(-exp(B - A))``) so that f32 never
    squares linear weights (round 1's TPU overflow).
    """
    if log:
        logweights = weights
        log_ninj = jnp.log(Ninj)
        lse1, lse2 = double_logsumexp(logweights[None, :])
        lse1, lse2 = lse1[0], lse2[0]
        logmu = lse1 - log_ninj
        # var = e^A - e^B with A = log(sum w^2 / Ninj^2), B = log(mu^2/Ninj);
        # B - A = log(n_eff_raw / Ninj) < 0 since n_eff_raw <= N_found < Ninj
        A = lse2 - 2.0 * log_ninj
        B = 2.0 * logmu - log_ninj
        logvar = A + jnp.log1p(-jnp.exp(jnp.minimum(B - A, -1e-6)))
        logn_eff = 2.0 * logmu - logvar
    else:
        mu = jnp.sum(weights) / Ninj
        var = jnp.sum(weights**2) / Ninj**2 - mu**2 / Ninj
        logmu = jnp.log(mu)
        logn_eff = 2.0 * logmu - jnp.log(var)
    variance = jnp.exp(-logn_eff) - 1.0 / Ninj
    return logmu, logn_eff, variance


def hierarchical_likelihood(
    pe_weights,
    inj_weights,
    total_inj,
    Nobs,
    Tobs,
    surveyed_hypervolume=None,
    categorical=False,
    marginal_qs=False,
    indv_weights=None,
    rngkey=None,
    pop_frac=None,
    reconstruct_rate=True,
    marginalize_selection=False,
    min_neff_cut=True,
    max_variance_cut=False,
    posterior_predictive_check=False,
    param_names=None,
    pedata=None,
    injdata=None,
    m2min=3.0,
    m1min=5.0,
    mmax=100.0,
    log=False,
    pe_summaries=None,
    inj_summaries=None,
):
    """The centerpiece: importance-sampled hierarchical likelihood with rate
    reconstruction, convergence cuts, and deterministic diagnostics.

    Semantic parity with gwinferno/pipeline/analysis.py:139-356, including:
    the Gamma(Nobs) rate reconstruction, selection-uncertainty
    marginalization, the ``min_neff``/``max_variance`` likelihood walls (and
    their mutual-exclusion rule), the full set of deterministic diagnostic
    sites, and the fixed-key posterior-predictive draws.

    Fused seam: ``pe_summaries=(logBFs, log_n_effs, n_samples)`` /
    ``inj_summaries=(log_mu, log_n_eff_inj)`` inject reductions computed
    upstream by the fused Pallas kernel
    (ops.fused.fused_bspline_per_event_log_bayes_factors) without ever
    materializing the weight banks; ``pe_weights``/``inj_weights`` may then
    be ``None`` (pass None for both and keep
    ``posterior_predictive_check=False``, which needs the raw weights).

    Returns the reconstructed ``rate`` (or None).
    """
    if max_variance_cut and (marginalize_selection or min_neff_cut):
        raise ValueError(
            "max_variance_cut is True which requires marginalize_selection and "
            "min_neff_cut to be False but got "
            f"marginalize_selection = {marginalize_selection} "
            f"and min_neff_cut = {min_neff_cut}",
        )
    if pe_summaries is not None and categorical:
        raise ValueError("pe_summaries (the fused seam) cannot be combined with categorical subpopulations")
    if (pe_summaries is not None or inj_summaries is not None) and posterior_predictive_check:
        raise ValueError("posterior_predictive_check needs the raw weight banks; disable it on the fused path")

    rate = None
    if categorical:
        with ppl.plate("nObs", Nobs) as i:
            Qs = ppl.sample(
                "Qs",
                dist.Categorical(probs=jnp.array(pop_frac)),
                rng_key=rngkey,
            ).reshape((-1, 1))
            mix_pe_weights = jnp.where(Qs[i] == 0, pe_weights[0][i], pe_weights[1][i])
            logBFs, logn_effs, variances = per_event_log_bayes_factors(mix_pe_weights, log=log)
    elif pe_summaries is not None:
        logBFs, logn_effs, n_samples = pe_summaries
        variances = jnp.exp(-logn_effs) - 1.0 / n_samples
    else:
        logBFs, logn_effs, variances = per_event_log_bayes_factors(pe_weights, log=log)

    if inj_summaries is not None:
        log_det_eff, logn_eff_inj = inj_summaries
        variance = jnp.exp(-logn_eff_inj) - 1.0 / total_inj
    else:
        log_det_eff, logn_eff_inj, variance = detection_efficiency(inj_weights, total_inj, log=log)
    ppl.deterministic("log_nEff_inj", logn_eff_inj)
    ppl.deterministic("log_nEffs", logn_effs)
    ppl.deterministic("logBFs", logBFs)
    ppl.deterministic("detection_efficiency", jnp.exp(log_det_eff))
    ppl.deterministic("variance_log_BFs", variances)
    ppl.deterministic("variance_log_detection_efficiency", variance)

    if reconstruct_rate:
        total_vt = ppl.deterministic("surveyed_hypervolume", surveyed_hypervolume / 1.0e9 * Tobs)
        unscaled_rate = ppl.sample("unscaled_rate", dist.Gamma(Nobs * 1.0))
        rate = ppl.deterministic("rate", unscaled_rate / jnp.exp(log_det_eff) / total_vt)
    if marginalize_selection:
        log_det_eff = log_det_eff - (3.0 + Nobs) / (2.0 * jnp.exp(logn_eff_inj))
    if min_neff_cut:
        log_det_eff = jnp.where(
            jnp.greater_equal(logn_eff_inj, jnp.log(4.0 * Nobs)),
            log_det_eff,
            jnp.inf,
        )
    sel = ppl.deterministic(
        "selection_factor",
        jnp.where(jnp.isinf(log_det_eff), jnp.nan_to_num(-jnp.inf), -Nobs * log_det_eff),
    )
    sumlogBFs = ppl.deterministic("sum_logBFs", jnp.sum(logBFs))
    log_l = sel + sumlogBFs
    log_l = ppl.deterministic(
        "log_l",
        jnp.where(jnp.isnan(log_l), jnp.nan_to_num(-jnp.inf), jnp.nan_to_num(log_l)),
    )

    if min_neff_cut:
        min_n_effs = jnp.exp(jnp.min(jnp.nan_to_num(logn_effs)))
        log_l = ppl.deterministic(
            "neff_less_Nobs",
            jnp.where(jnp.less_equal(min_n_effs, Nobs), jnp.nan_to_num(-jnp.inf), log_l),
        )

    variance = ppl.deterministic(
        "variance_log_likelihood",
        Nobs**2 * variance + variances.sum(),
    )
    if max_variance_cut:
        log_l = ppl.deterministic(
            "variance_less_1",
            jnp.where(jnp.less_equal(variance, 1.0), log_l, jnp.nan_to_num(-jnp.inf)),
        )

    ppl.factor("log_likelihood", log_l)

    if posterior_predictive_check:
        if param_names is not None and injdata is not None and pedata is not None:
            _posterior_predictive_sites(
                pe_weights, inj_weights, pedata, injdata, param_names, Nobs,
                marginal_qs=marginal_qs, indv_weights=indv_weights,
                m1min=m1min, m2min=m2min, mmax=mmax, log=log,
            )
    return rate


def _posterior_predictive_sites(
    pe_weights, inj_weights, pedata, injdata, param_names, Nobs,
    marginal_qs=False, indv_weights=None, m1min=5.0, m2min=3.0, mmax=100.0, log=False,
):
    """Reweighted observed/predicted draws per event, emitted as deterministic
    sites ``{param}_{obs,pred}_event_{i}``.

    Semantics: gwinferno/pipeline/analysis.py:321-355, with the per-event
    python loop of ``jax.random.choice`` ops over the full banks replaced by
    ONE vmapped batch of categorical draws (the reference pattern unrolled
    Nobs x len(param_names) choice programs into every trace -- compile-time
    poison).  The reference's fixed per-event keys (``PRNGKey(ev)``,
    analysis.py:340) are preserved: draws are deterministic given weights.
    """
    if log:
        # shift by the per-bank max before exponentiating: the categorical
        # draws only need weights up to a constant scale, and raw exp(logw)
        # overflows f32 on TPU for the same reason the likelihood runs in
        # log space
        pe_weights = jnp.exp(pe_weights - jnp.max(pe_weights, axis=1, keepdims=True))
        inj_weights = jnp.exp(inj_weights - jnp.max(inj_weights))
    pe_weights = jnp.where(
        jnp.less(pedata["mass_1"], m1min)
        | jnp.greater(pedata["mass_1"], mmax)
        | jnp.less(pedata["mass_1"] * pedata["mass_ratio"], m2min),
        0.0,
        pe_weights,
    )
    inj_weights = jnp.where(
        jnp.less(injdata["mass_1"], m1min)
        | jnp.greater(injdata["mass_1"], mmax)
        | jnp.less(injdata["mass_1"] * injdata["mass_ratio"], m2min),
        0.0,
        inj_weights,
    )
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(Nobs))
    split = jax.vmap(jax.random.split)(keys)  # (Nobs, 2, key)
    k1, k2 = split[:, 0], split[:, 1]
    n_samp, n_found = pe_weights.shape[1], inj_weights.shape[0]
    obs_idx = jax.vmap(lambda k, w: jax.random.choice(k, n_samp, p=w / jnp.sum(w)))(k1, pe_weights)
    pred_idx = jax.vmap(lambda k: jax.random.choice(k, n_found, p=inj_weights / jnp.sum(inj_weights)))(k2)
    for ev in range(Nobs):
        if marginal_qs:
            for i in range(len(indv_weights)):
                ppl.deterministic(
                    f"cat_frac_subpop_{i + 1}_event_{ev}",
                    indv_weights[i][ev, obs_idx[ev]] / pe_weights[ev, obs_idx[ev]],
                )
        for p in param_names:
            # jnp.asarray: the banks may be host numpy (utils.host convention)
            # while obs_idx/pred_idx are traced gather indices
            ppl.deterministic(f"{p}_obs_event_{ev}", jnp.asarray(pedata[p])[ev, obs_idx[ev]])
            ppl.deterministic(f"{p}_pred_event_{ev}", jnp.asarray(injdata[p])[pred_idx[ev]])


def _plan_hyperpriors(prior_dict):
    """Split the flat hyperprior dict into sample-site specs and pinned
    constants, once, at construction time (nothing config-shaped survives
    into the traced model)."""
    sites, pinned = [], {}
    for name, spec in prior_dict.items():
        if isinstance(spec, PopPrior) or (hasattr(spec, "dist") and hasattr(spec, "params")):
            # duck-typed like the reference (any object carrying .dist/.params
            # is a prior spec) so hand-built prior dicts sample rather than
            # being silently pinned as constants
            sites.append((name, spec.dist, spec.params))
        else:
            pinned[name] = spec
    return sites, pinned


def _plan_population_builders(model_dict, z_grid):
    """Compile each config block into a builder ``hypers -> distribution``.

    All site-name mangling (``{param}_{hp}``, ``{param}_component_{i}_{hp}``,
    ``{param}_mixture_dist_{hp}``) is resolved here into key lists; the
    builders themselves only do dict lookups and constructor calls.  String
    blocks are iid aliases: the parser records ``models[shared] = source``
    (parser.py:add_iid_model), so the alias key reuses the model built for
    the block it points at.  Parity note: the reference's literal iid code
    assigns in the broken direction (``pop_models[source] =
    pop_models[alias]``, i.e. None over the built model -- it would crash at
    evaluation, ref gwinferno/pipeline/analysis.py:412-414); the intended
    semantics ``dists[alias] = dists[source]`` are implemented here.
    """
    builders, aliases = [], []
    for param, spec in model_dict.items():
        if isinstance(spec, PopMixtureModel):
            comp_keys = [
                (cls, [(f"{param}_component_{i + 1}_{hp}", hp) for hp in hps])
                for i, (cls, hps) in enumerate(zip(spec.components, spec.component_params))
            ]
            mix_keys = [(f"{param}_mixture_dist_{hp}", hp) for hp in spec.mixing_params]

            def build_mixture(hypers, spec=spec, comp_keys=comp_keys, mix_keys=mix_keys):
                comps = [cls(**{hp: hypers[key] for key, hp in keys}) for cls, keys in comp_keys]
                mixing = spec.mixing_dist(**{hp: hypers[key] for key, hp in mix_keys})
                return spec.model(mixing, comps)

            builders.append((param, build_mixture))
        elif isinstance(spec, PopModel):
            keys = [(f"{param}_{hp}", hp) for hp in spec.params]
            extra = {"grid": z_grid} if param == "redshift" else {}

            def build_single(hypers, spec=spec, keys=keys, extra=extra):
                return spec.model(**{hp: hypers[key] for key, hp in keys}, **extra)

            builders.append((param, build_single))
        elif isinstance(spec, str):
            aliases.append((param, spec))
        else:
            raise ValueError(f"Unknown model type: {type(spec)}:{spec}")
    return builders, aliases


def construct_hierarchical_model(
    model_dict,
    prior_dict,
    marginalize_selection=False,
    min_neff_cut=True,
    max_variance_cut=False,
    posterior_predictive_check=True,
):
    """Build a PPL model closure from config-driven model/prior dicts.

    Behavioral parity with gwinferno/pipeline/analysis.py:359-424 (hyperprior
    sampling, mixture instantiation, iid aliasing, redshift z-grid special
    case, VT from the redshift model's ``norm``), but structured as a
    two-phase compile: the config dicts are resolved into a site plan and
    population builders HERE, so the traced model never walks config
    structures -- it replays a flat plan (smaller traced program, and config
    errors surface at construction instead of first trace).
    """
    source_params = tuple(model_dict)
    z_grid = None
    if "redshift" in model_dict:
        z_grid = jnp.linspace(1e-9, prior_dict["redshift_maximum"], 1000)
    sites, pinned = _plan_hyperpriors(prior_dict)
    builders, aliases = _plan_population_builders(model_dict, z_grid)

    def model(samps, injs, Ninj, Nobs, Tobs):
        hypers = dict(pinned)
        for name, dist_cls, dist_kwargs in sites:
            hypers[name] = ppl.sample(name, dist_cls(**dist_kwargs))
        dists = {param: build(hypers) for param, build in builders}
        for alias, source in aliases:
            dists[alias] = dists[source]

        def bank_log_weights(data):
            lw = -jnp.log(data["prior"])
            for p in source_params:
                lw = lw + dists[p].log_prob(data[p])
            return lw

        hierarchical_likelihood(
            bank_log_weights(samps),
            bank_log_weights(injs),
            total_inj=Ninj,
            Nobs=Nobs,
            Tobs=Tobs,
            surveyed_hypervolume=dists["redshift"].norm,
            marginalize_selection=marginalize_selection,
            min_neff_cut=min_neff_cut,
            max_variance_cut=max_variance_cut,
            posterior_predictive_check=posterior_predictive_check,
            pedata=samps,
            injdata=injs,
            param_names=source_params,
            m1min=2.0,
            m2min=2.0,
            mmax=100.0,
            log=True,
        )

    return model
