"""B-spline POSTERIOR-MOMENT parity: independent ensemble vs the NUTS engine.

Complements the exact density parity (independent_bspline_density.py +
tests/pipeline/test_bspline_density_parity.py) with sampler-level evidence
on a REDUCED B-spline problem (small knot counts + subsampled banks so the
pure-numpy ensemble is tractable on this 2-core host): the Goodman-Weare
stretch sampler on the independent scipy/numpy density must agree with the
framework's NUTS (whitened parameterization, c-space moments recovered from
the deterministic sites) in every coefficient/hyperparameter mean within
combined MC error.

Writes tools/parity/bspline_moment_parity.json.

Run from the repo root:  python tools/parity/run_bspline_moment_parity.py
(~30-60 min CPU; offline artifact generator, not part of the suite.)
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.abspath(os.path.join(HERE, "..", ".."))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

import bench  # noqa: E402
from tools.parity.independent_bspline_density import IndependentBSplineDensity  # noqa: E402
from tools.parity.independent_numpy_model import run_ensemble_parallel  # noqa: E402
from tools.parity.make_parity_baseline import ess_1d  # noqa: E402

N_M, N_Q, N_A, N_CT, N_Z = 10, 6, 5, 5, 5
S_SUB, INJ_SUB = 600, 8000
BLOCKS = [("mass_cs", N_M), ("q_cs", N_Q), ("a_cs", N_A), ("tilt_cs", N_CT), ("z_cs", N_Z - 1)]
DIM = sum(n for _, n in BLOCKS) + 2  # + lamb + unscaled_rate


def unpack(theta):
    p, i = {}, 0
    for name, n in BLOCKS:
        p[name] = theta[i : i + n]
        i += n
    p["lamb"] = theta[i]
    p["unscaled_rate"] = theta[i + 1]
    return p


def main():
    from gwinferno_tpu.pipeline.utils import load_base_parser, load_pe_and_injections_as_dict
    import simple_bspline_example as ex
    from utils import run_bspline_analysis

    pedict, injdict, constants, param_names = load_pe_and_injections_as_dict(bench.ensure_data())
    rng = np.random.default_rng(5)
    idx = rng.choice(pedict["mass_1"].shape[1], size=S_SUB, replace=False)
    pedict = {k: np.ascontiguousarray(v[:, idx]) for k, v in pedict.items()}
    iidx = rng.choice(injdict["mass_1"].shape[0], size=INJ_SUB, replace=False)
    injdict = {k: np.ascontiguousarray(v[iidx]) for k, v in injdict.items()}
    # total_inj stays unchanged: mu is then miscalibrated vs the full bank,
    # but BOTH implementations see the identical banks/constants, so the
    # parity comparison is exact regardless

    # ---------------- independent ensemble ----------------
    indep = IndependentBSplineDensity(pedict, injdict, constants,
                                      n_m=N_M, n_q=N_Q, n_a=N_A, n_ct=N_CT, n_z=N_Z,
                                      mmin=3.0, mmax=100.0)

    def log_post(theta):
        if theta[-1] <= 0:
            return -np.inf
        try:
            return indep(unpack(theta))
        except FloatingPointError:
            return -np.inf

    n_walkers = int(os.environ.get("BSP_WALKERS", 80))
    n_steps = int(os.environ.get("BSP_STEPS", 4000))
    x0 = 0.05 * np.random.default_rng(11).standard_normal((n_walkers, DIM))
    x0[:, -2] += 1.7          # lamb near truth-ish
    x0[:, -1] = 69.0 + 2.0 * np.random.default_rng(12).standard_normal(n_walkers)
    t0 = time.time()
    chain, acc = run_ensemble_parallel(
        log_post, x0, n_steps=n_steps, seed=7,
        progress_every=max(1, n_steps // 20), n_procs=int(os.environ.get("PARITY_PROCS", 2)),
    )
    t_ens = time.time() - t0
    burn = n_steps // 2
    ens = chain[burn:]  # (steps, walkers, dim)
    ens_mean = ens.reshape(-1, DIM).mean(axis=0)
    ens_sd = ens.reshape(-1, DIM).std(axis=0)
    ens_se = np.array([
        ens_sd[d] / np.sqrt(max(ess_1d(ens[:, :, d].T), 4.0)) for d in range(DIM)
    ])
    print(f"ensemble: {n_steps} steps x {n_walkers} walkers, acc {acc:.2f}, {t_ens:.0f}s", flush=True)

    # ---------------- framework NUTS (whitened) ----------------
    argv = [
        "--m-nsplines", str(N_M), "--q-nsplines", str(N_Q), "--a-nsplines", str(N_A),
        "--tilt-nsplines", str(N_CT), "--z-nsplines", str(N_Z),
        "--mmin", "3.0", "--mmax", "100.0",
        "--warmup", os.environ.get("BSP_NUTS_WARMUP", "300"),
        "--samples", os.environ.get("BSP_NUTS_SAMPLES", "600"),
        "--chains", os.environ.get("BSP_NUTS_CHAINS", "2"),
        "--result-dir", "/tmp/bsp_parity", "--run-label", "parity",
        "--rngkey", "3", "--reparam", "whitened", "--chain-scheduler", "sync",
    ]
    args = load_base_parser().parse_args(argv)
    t0 = time.time()
    posterior, models = run_bspline_analysis(ex.model, pedict, injdict, constants, param_names, args)
    t_nuts = time.time() - t0
    mcmc = models.pop("_mcmc")

    nuts_stats = {}
    n_chains = int(args.chains)
    for name, n in BLOCKS + [("lamb", 1), ("unscaled_rate", 1)]:
        if name in posterior:
            v = np.asarray(posterior[name])
        else:
            v = np.asarray(mcmc.get_samples()[name])
        v = v.reshape(v.shape[0], -1)  # (draws*chains, k)
        bc = v.reshape(-1, n_chains, v.shape[1]).swapaxes(0, 1)  # (chains, draws, k)
        from gwinferno_tpu.infer.diagnostics import effective_sample_size
        se = np.array([
            bc[:, :, j].std() / np.sqrt(max(float(effective_sample_size(bc[:, :, j])), 4.0))
            for j in range(v.shape[1])
        ])
        nuts_stats[name] = (v.mean(axis=0), v.std(axis=0), se)

    # ---------------- comparison ----------------
    rows, zmax = [], 0.0
    i = 0
    for name, n in BLOCKS + [("lamb", 1), ("unscaled_rate", 1)]:
        mean_n, sd_n, se_n = nuts_stats[name]
        for j in range(n):
            se = np.sqrt(se_n[j] ** 2 + ens_se[i] ** 2)
            z = float((mean_n[j] - ens_mean[i]) / max(se, 1e-12))
            rows.append({"param": f"{name}[{j}]" if n > 1 else name,
                         "nuts_mean": round(float(mean_n[j]), 4),
                         "ens_mean": round(float(ens_mean[i]), 4),
                         "combined_se": round(float(se), 4), "z": round(z, 2)})
            zmax = max(zmax, abs(z))
            i += 1

    out = {
        "config": (
            f"reduced B-spline problem: knots m{N_M} q{N_Q} a{N_A} t{N_CT} z{N_Z}, "
            f"{S_SUB} PE samples/event, {INJ_SUB} injections, min_neff walls on; "
            f"ensemble {n_steps}x{n_walkers} (acc {acc:.2f}, {t_ens:.0f}s) vs NUTS whitened "
            f"{args.warmup}w+{args.samples}s x {args.chains} chains ({t_nuts:.0f}s)"
        ),
        "max_abs_z": round(zmax, 2),
        "n_params": len(rows),
        "rows": rows,
    }
    path = os.path.join(HERE, "bspline_moment_parity.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("config", "max_abs_z", "n_params")}, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
