"""Produce the independent posterior-moment parity baseline.

Runs the pure-numpy IndependentPosterior (tools/parity/independent_numpy_model.py)
under the Goodman-Weare ensemble sampler on the same 69-event catalog +
synthetic injection bank the bench uses, and writes
``tools/parity/parity_baseline.json``: posterior mean/std + MC standard error
per hyperparameter.  tests/pipeline/test_parity.py asserts the NUTS engine
reproduces these within combined MC error.

Run from the repo root:  python tools/parity/make_parity_baseline.py
(~10-20 min of single-core numpy; this is an offline artifact generator,
not part of the test suite.)
"""

import hashlib
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.abspath(os.path.join(HERE, "..", ".."))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

from tools.parity.independent_numpy_model import PARAM_ORDER as PARAMS  # noqa: E402


def ess_1d(x):
    """FFT autocorrelation ESS for a (walkers, steps) array (walker mean
    series treated per-walker, summed)."""
    n = x.shape[1]
    x = x - x.mean(axis=1, keepdims=True)
    f = np.fft.rfft(x, n=2 * n, axis=1)
    acf = np.fft.irfft(f * np.conj(f), axis=1)[:, :n].real
    acf /= acf[:, :1]
    acf_m = acf.mean(axis=0)
    # Geyer initial positive sequence
    tau = 1.0
    for k in range(1, n - 1, 2):
        pair = acf_m[k] + acf_m[k + 1]
        if pair < 0:
            break
        tau += 2.0 * pair
    return x.shape[0] * n / tau


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    sys.path.insert(0, ROOT)
    import bench
    from gwinferno_tpu.pipeline.utils import load_pe_and_injections_as_dict
    from tools.parity.independent_numpy_model import IndependentPosterior, run_ensemble

    pedict, injdict, constants, _ = load_pe_and_injections_as_dict(bench.ensure_data())
    post = IndependentPosterior(pedict, injdict, constants)

    rng = np.random.default_rng(11)
    n_walkers = int(os.environ.get("PARITY_WALKERS", 48))
    # jittered inits around the bench fiducial point (bench.FIDUCIAL_INIT),
    # clipped into the prior boxes
    x0 = np.column_stack(
        [
            -2.35 + 0.3 * rng.standard_normal(n_walkers),
            1.0 + 0.3 * rng.standard_normal(n_walkers),
            35.0 + 2.0 * rng.standard_normal(n_walkers),
            5.0 + 1.0 * np.abs(rng.standard_normal(n_walkers)),
            np.clip(0.25 + 0.05 * rng.standard_normal(n_walkers), 1e-3, 0.9),
            np.clip(0.35 + 0.05 * rng.standard_normal(n_walkers), 0.05, 0.95),  # mu_a1
            np.clip(0.03 + 0.01 * rng.standard_normal(n_walkers), 0.006, 0.2),  # var_a1
            np.clip(0.35 + 0.05 * rng.standard_normal(n_walkers), 0.05, 0.95),  # mu_a2
            np.clip(0.03 + 0.01 * rng.standard_normal(n_walkers), 0.006, 0.2),  # var_a2
            np.clip(0.7 + 0.1 * rng.standard_normal(n_walkers), 0.05, 0.95),  # lambda_ct1
            np.clip(0.7 + 0.1 * rng.standard_normal(n_walkers), 0.05, 0.95),  # lambda_ct2
            np.clip(0.5 + 0.15 * rng.standard_normal(n_walkers), 0.15, 3.5),  # sig_ct1
            np.clip(0.5 + 0.15 * rng.standard_normal(n_walkers), 0.15, 3.5),  # sig_ct2
            1.7 + 0.5 * rng.standard_normal(n_walkers),
        ]
    )
    bad = ~np.isfinite([post(w) for w in x0])
    assert not bad.all(), "no finite starting walkers"
    if bad.any():
        good = x0[~bad]
        x0[bad] = good[rng.integers(len(good), size=bad.sum())]

    t0 = time.time()
    n_steps = int(os.environ.get("PARITY_STEPS", 3000))
    n_procs = int(os.environ.get("PARITY_PROCS", 2))
    if n_procs > 1:
        from tools.parity.independent_numpy_model import run_ensemble_parallel

        chain, acc = run_ensemble_parallel(
            post, x0, n_steps=n_steps, progress_every=50, n_procs=n_procs
        )
    else:
        chain, acc = run_ensemble(post, x0, n_walkers=n_walkers, n_steps=n_steps, progress_every=200)
    wall = time.time() - t0
    burn = n_steps // 3
    kept = chain[burn:]  # (steps, walkers, dim)

    with open(bench.ensure_data(), "rb") as f:
        data_md5 = hashlib.md5(f.read()).hexdigest()[:12]

    out = {
        "sampler": "Goodman-Weare affine-invariant ensemble (pure numpy, independent implementation)",
        "model": "14-hyperparameter PR1 powerlaw+peak w/ independent spins x powerlaw redshift, min_neff_cut, 69-ev catalog (bench.py config)",
        "data_md5": data_md5,
        "n_walkers": n_walkers,
        "n_steps": n_steps,
        "burn_in": burn,
        "acceptance": round(acc, 3),
        "wall_s": round(wall, 1),
        "moments": {},
    }
    for i, name in enumerate(PARAMS):
        x = kept[:, :, i]
        ess = ess_1d(x.T)
        out["moments"][name] = {
            "mean": float(x.mean()),
            "std": float(x.std()),
            "mc_se": float(x.std() / np.sqrt(max(ess, 4.0))),
            "ess": float(ess),
        }
        print(f"{name:>10}: mean={x.mean():8.3f} std={x.std():6.3f} ess={ess:7.1f}")

    path = os.path.join(HERE, "parity_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}  (acc={acc:.2f}, {wall:.0f}s)")


if __name__ == "__main__":
    main()
