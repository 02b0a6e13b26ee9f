"""Metadata-driven catalog ingestion, end to end: synthetic per-event PE h5
files + a metadata json -> load_posterior_dataset (incl. the GWTC-1 DL->z
branch and per-event redshift-prior kinds) -> idata artifact ->
load_pe_and_injections_as_dict.

Mirrors the layer the reference pins in tests/preprocess/
data_collection_test.py against gwinferno/preprocess/data_collection.py:24-169,
but drives the whole chain rather than one identity check.
"""

import json
import os

import h5py
import numpy as np
import pytest

from gwinferno_tpu.cosmology import PLANCK_2015_Cosmology as cosmo
from gwinferno_tpu.preprocess.data_collection import (
    append_prior_to_processed_catalog,
    dl_2_prior_on_z,
    load_injection_dataset,
    load_posterior_dataset,
    save_posterior_samples_and_injection_datasets_as_idata,
)
from gwinferno_tpu.utils.dataset import Dataset

N_RAW = 120  # per-event raw samples; ev2's mmax cut brings the common count down
MMAX = 100.0


def _structured(fields):
    names = list(fields)
    n = len(fields[names[0]])
    out = np.zeros(n, dtype=[(k, "<f8") for k in names])
    for k in names:
        out[k] = fields[k]
    return out


def _spin_block(rng, n):
    return {
        "a_1": rng.uniform(0.01, 0.99, n),
        "a_2": rng.uniform(0.01, 0.99, n),
        "cos_tilt_1": rng.uniform(-1, 1, n),
        "cos_tilt_2": rng.uniform(-1, 1, n),
    }


@pytest.fixture(scope="module")
def catalog_files(tmp_path_factory):
    """Three synthetic event files: one GWTC-1-layout event whose masses are
    detector-frame (pins the DL->z branch), two GWTC-3-layout events, one of
    which has samples above mmax (pins the cut + common downsampling)."""
    root = tmp_path_factory.mktemp("catalog")
    rng = np.random.default_rng(42)

    # --- ev1: GWTC-1 layout.  mass_1_det = 50 (1+z), so a correct DL->z
    # conversion must recover mass_1 == 50 exactly for every sample.
    z1 = rng.uniform(0.05, 0.8, N_RAW)
    dl1 = np.asarray(cosmo.z2DL(z1))
    ev1 = root / "GW150914_posterior.h5"
    with h5py.File(ev1, "w") as f:
        f.create_dataset(
            "Overall_posterior",
            data=_structured(
                {
                    "luminosity_distance": dl1,
                    "mass_1_det": 50.0 * (1.0 + z1),
                    "mass_ratio": np.full(N_RAW, 0.8),
                    **_spin_block(rng, N_RAW),
                }
            ),
        )

    # --- ev2: GWTC-3 layout under a waveform group, 20 samples above mmax
    z2 = rng.uniform(0.05, 1.2, N_RAW)
    m1_2 = rng.uniform(20.0, 60.0, N_RAW)
    m1_2[:20] = rng.uniform(110.0, 150.0, 20)
    ev2 = root / "GW190000_posterior.h5"
    with h5py.File(ev2, "w") as f:
        f.create_dataset(
            "C01:Mixed/posterior_samples",
            data=_structured(
                {
                    "redshift": z2,
                    "mass_1": m1_2,
                    "mass_ratio": rng.uniform(0.3, 1.0, N_RAW),
                    **_spin_block(rng, N_RAW),
                }
            ),
        )

    # --- ev3: GWTC-3 layout, flat posterior_samples group (no waveform key)
    z3 = rng.uniform(0.05, 1.0, N_RAW)
    ev3 = root / "GW200000_posterior.h5"
    with h5py.File(ev3, "w") as f:
        f.create_dataset(
            "posterior_samples",
            data=_structured(
                {
                    "redshift": z3,
                    "mass_1": rng.uniform(10.0, 80.0, N_RAW),
                    "mass_ratio": rng.uniform(0.2, 1.0, N_RAW),
                    **_spin_block(rng, N_RAW),
                }
            ),
        )

    metadata = {
        "GW150914": {"file_path": str(ev1), "catalog": "GWTC-1", "redshift_prior": "euclidean"},
        "GW190000": {"file_path": str(ev2), "waveform": "C01:Mixed", "redshift_prior": "euclidean"},
        "GW200000": {"file_path": str(ev3), "redshift_prior": "comoving"},
    }
    meta_file = root / "metadata.json"
    meta_file.write_text(json.dumps(metadata))
    return str(meta_file), metadata


def test_load_posterior_dataset_full_chain(catalog_files):
    meta_file, _ = catalog_files
    ds = load_posterior_dataset(metadata_file=meta_file, mmax=MMAX)
    arr = ds["posteriors"]
    assert arr.dims == ("event", "param", "sample")
    events = [str(e) for e in arr.coords["event"]]
    params = [str(p) for p in arr.coords["param"]]
    assert events == ["GW150914", "GW190000", "GW200000"]
    assert params[-1] == "prior"
    assert set(params) == {
        "redshift", "mass_1", "a_1", "cos_tilt_1", "mass_2", "a_2", "cos_tilt_2", "mass_ratio", "prior",
    }
    # ev2 lost its 20 over-mmax samples, so the common count is N_RAW - 20
    assert arr.data.shape == (3, 9, N_RAW - 20)
    assert np.isfinite(arr.data).all()
    assert (arr.data[:, params.index("mass_1")] <= MMAX).all()


def test_gwtc1_dl_to_z_branch(catalog_files):
    """The GWTC-1 event carries only luminosity distance + detector-frame
    mass; the constructed source-frame mass must come out exactly 50."""
    meta_file, _ = catalog_files
    ds = load_posterior_dataset(metadata_file=meta_file, mmax=MMAX)
    arr = ds["posteriors"]
    params = [str(p) for p in arr.coords["param"]]
    m1 = arr.data[0, params.index("mass_1")]
    np.testing.assert_allclose(m1, 50.0, rtol=1e-6)
    # mass_2 filled from the constant mass ratio
    np.testing.assert_allclose(arr.data[0, params.index("mass_2")], 40.0, rtol=1e-6)
    z = arr.data[0, params.index("redshift")]
    assert (z > 0.0).all() and (z < 1.0).all()


def test_prior_row_per_kind(catalog_files):
    """The appended fiducial prior row must equal
    p(z|kind) (1+z)^2 m1 / 4 recomputed from the output rows -- for the
    euclidean events AND the comoving one."""
    meta_file, _ = catalog_files
    ds = load_posterior_dataset(metadata_file=meta_file, mmax=MMAX)
    arr = ds["posteriors"]
    params = [str(p) for p in arr.coords["param"]]
    z = arr.data[:, params.index("redshift")]
    m1 = arr.data[:, params.index("mass_1")]
    prior = arr.data[:, params.index("prior")]
    assert (prior > 0).all()
    for i, kind in enumerate(["euclidean", "euclidean", "comoving"]):
        want = dl_2_prior_on_z(z[i], kind=kind) * (1 + z[i]) ** 2 * m1[i] * 0.25
        np.testing.assert_allclose(prior[i], want, rtol=1e-12)
    # the two kinds genuinely differ (regression guard for the kind plumbing)
    euclid_for_ev3 = dl_2_prior_on_z(z[2], kind="euclidean") * (1 + z[2]) ** 2 * m1[2] * 0.25
    assert not np.allclose(prior[2], euclid_for_ev3)


def test_append_prior_is_idempotent_layerwise(catalog_files):
    """append_prior_to_processed_catalog only adds the one prior row."""
    meta_file, meta = catalog_files
    ds = load_posterior_dataset(metadata_file=meta_file, mmax=MMAX)
    base_params = [str(p) for p in ds["posteriors"].coords["param"]]
    again = append_prior_to_processed_catalog(ds)
    params2 = [str(p) for p in again["posteriors"].coords["param"]]
    assert len(params2) == len(base_params) + 1


def test_idata_roundtrip_to_pipeline(catalog_files, injections_file, tmp_path):
    """metadata -> posterior dataset + O3 injection loader -> idata h5 ->
    load_pe_and_injections_as_dict (the artifact the likelihood consumes)."""
    from gwinferno_tpu.pipeline.utils import load_pe_and_injections_as_dict

    meta_file, _ = catalog_files
    pe_ds = load_posterior_dataset(metadata_file=meta_file, mmax=MMAX)
    inj_arr = load_injection_dataset(
        injections_file, ["mass_1", "mass_ratio", "redshift", "a_1", "a_2", "cos_tilt_1", "cos_tilt_2"]
    )
    idata = os.path.join(tmp_path, "idata.h5")
    save_posterior_samples_and_injection_datasets_as_idata(pe_ds, Dataset({"injections": inj_arr}), idata)

    pedict, injdict, constants, param_names = load_pe_and_injections_as_dict(idata)
    assert constants["nObs"] == 3
    assert constants["total_inj"] > 0 and constants["obs_time"] > 0
    assert pedict["mass_1"].shape == (3, N_RAW - 20)
    for k in ("mass_1", "mass_ratio", "redshift", "prior"):
        assert k in pedict and k in injdict
        assert np.isfinite(pedict[k]).all() and np.isfinite(injdict[k]).all()
    assert injdict["mass_1"].ndim == 1
