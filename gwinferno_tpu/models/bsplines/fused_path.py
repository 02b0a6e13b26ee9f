"""Fused TPU hot path for the production B-spline population model.

The b-spline example's log-weights are exactly affine in the stacked
coefficient vector (LogY/LogXLogY splines project as ``exp(B @ c)``; the
redshift powerlaw contributes ``lamb * log1p(z)``), so the entire
multi-parameter likelihood reduction is ONE

    (1, K_total) @ (K_total, E*S)  matmul -> per-event (logsumexp, logsumexp2)

pass through :func:`gwinferno_tpu.ops.fused.fused_logweight_logsumexp` (MXU
matmul + online VPU reductions, no (E, S) weight tensor in HBM), with the
per-chain normalization scalars added after the reduction.

Hot-path spec: SURVEY.md S3.2; reference design-matrix caching
gwinferno/models/bsplines/single.py:35-58.  Consumed by
examples/simple_bspline_example.py via ``--fused`` and fed into
``hierarchical_likelihood(pe_summaries=..., inj_summaries=...)``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...ops.fused import fused_logweight_logsumexp

__all__ = ["FusedBSplineLikelihood"]


class FusedBSplineLikelihood:
    """Precompute the stacked design matrices for the b-spline example model
    (LogXLogY m1 x LogY q x IID LogY mags x IID LogY tilts x
    powerlaw-spline redshift) over both banks; evaluate all importance-weight
    reductions in one fused kernel call per bank.

    ``__call__(m_cs, q_cs, a_cs, tilt_cs, z_cs, lamb)`` returns
    ``(logBFs (E,), log_n_effs (E,), log_mu, log_n_eff_inj)`` matching
    per_event_log_bayes_factors / detection_efficiency in log mode.
    """

    def __init__(self, mass_models, mag_model, tilt_model, z_model, pedict, injdict, total_inj):
        self.total_inj = float(total_inj)
        self.mass_models = mass_models
        self.mag_model = mag_model
        self.tilt_model = tilt_model
        self.z_model = z_model
        E, S = pedict["mass_1"].shape
        self.n_events, self.n_samples = E, S
        self.n_found = injdict["mass_1"].shape[0]

        for pe in (True, False):
            design, nlp = self._build_bank(pedict if pe else injdict, pe)
            if pe:
                self.pe_design, self.pe_nlp = design, nlp
            else:
                self.inj_design, self.inj_nlp = design, nlp

    def _build_bank(self, d, pe):
        idx = 1 if pe else 0
        mass = self.mass_models
        mag, tilt, zm = self.mag_model, self.tilt_model, self.z_model
        m1m, qm = mass.primary_model, mass.ratio_model
        a1m, a2m = mag.primary_model, mag.secondary_model
        t1m, t2m = tilt.primary_model, tilt.secondary_model

        def dm(model):
            mat = model.pe_design_matrix if pe else model.inj_design_matrix
            return mat.reshape(mat.shape[0], -1)

        z = d["redshift"]
        z_dm = (zm.pe_design_matrix if pe else zm.inj_design_matrix).reshape(zm.n_splines, -1)
        lamb_row = jnp.log1p(z).reshape(1, -1)

        design = jnp.concatenate(
            [dm(m1m), dm(qm), dm(a1m), dm(a2m), dm(t1m), dm(t2m), z_dm, lamb_row], axis=0
        )

        valid = (
            (m1m._valid_xx if pe else m1m._valid_xx_inj)
            & (qm._valid_xx if pe else qm._valid_xx_inj)
            & (a1m._valid_xx if pe else a1m._valid_xx_inj)
            & (a2m._valid_xx if pe else a2m._valid_xx_inj)
            & (t1m._valid_xx if pe else t1m._valid_xx_inj)
            & (t2m._valid_xx if pe else t2m._valid_xx_inj)
            & jnp.less_equal(z, zm.zmax)
        )
        dVdz = zm.dVdzs[idx]
        nlp = jnp.log(dVdz) - jnp.log1p(z) - jnp.log(d["prior"])
        nlp = jnp.where(valid, nlp, -jnp.inf).reshape(-1)
        return design, nlp

    def _coefs(self, m_cs, q_cs, a_cs, tilt_cs, z_cs, lamb):
        return jnp.concatenate(
            [m_cs, q_cs, a_cs, a_cs, tilt_cs, tilt_cs, z_cs, jnp.reshape(lamb, (1,))]
        )[None, :]

    def _log_norm(self, m_cs, q_cs, a_cs, tilt_cs, z_cs, lamb):
        """Per-chain scalar: sum of the spline normalizations (multipliers)
        minus the redshift model's normalization integral."""
        mass, mag, tilt, zm = self.mass_models, self.mag_model, self.tilt_model, self.z_model
        return (
            jnp.log(mass.primary_model.interpolator.norm(m_cs))
            + jnp.log(mass.ratio_model.interpolator.norm(q_cs))
            + 2.0 * jnp.log(mag.primary_model.interpolator.norm(a_cs))
            + 2.0 * jnp.log(tilt.primary_model.interpolator.norm(tilt_cs))
            - jnp.log(zm.normalization(lamb, z_cs))
        )

    def __call__(self, m_cs, q_cs, a_cs, tilt_cs, z_cs, lamb, **kernel_kwargs):
        coefs = self._coefs(m_cs, q_cs, a_cs, tilt_cs, z_cs, lamb)
        log_norm = self._log_norm(m_cs, q_cs, a_cs, tilt_cs, z_cs, lamb)

        logBF, log_neff = fused_logweight_logsumexp(
            coefs, self.pe_design, self.pe_nlp, self.n_events, self.n_samples, **kernel_kwargs
        )
        logBFs = logBF[0] + log_norm
        log_n_effs = log_neff[0]

        inj_logbf, inj_log_neff_raw = fused_logweight_logsumexp(
            coefs, self.inj_design, self.inj_nlp, 1, self.n_found, **kernel_kwargs
        )
        # the helper subtracted log(n_found); undo to get raw logsumexp(logw)
        lse1_raw = inj_logbf[0, 0] + jnp.log(1.0 * self.n_found)
        log_ninj = jnp.log(self.total_inj)
        log_mu = lse1_raw + log_norm - log_ninj
        # detection_efficiency's n_eff = mu^2/var with var = s2/N^2 - mu^2/N;
        # in log space (norms cancel): n_eff_raw = (sum w)^2 / sum w^2 gives
        # log_n_eff_inj = log_n_eff_raw - log1p(-n_eff_raw/Ninj)
        log_neff_raw = inj_log_neff_raw[0, 0]
        delta = jnp.minimum(log_neff_raw - log_ninj, -1e-6)
        log_n_eff_inj = log_neff_raw - jnp.log1p(-jnp.exp(delta))
        return logBFs, log_n_effs, log_mu, log_n_eff_inj
