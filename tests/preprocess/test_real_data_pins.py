"""Skip-if-absent pins against REAL release files (VERDICT r4 missing #1).

This environment has no network, so the O3/O4a injection loaders are
normally validated against schema-replica files the repo's own generator
writes (test_injection_schema_variants.py) -- a self-consistent schema
misunderstanding would be invisible there.  These tests consume the REAL
files whenever a path is provided, so any environment WITH the data (CI
with network, a laptop with the zenodo sets downloaded) immediately
validates the loaders against ground truth:

    GWINF_REAL_O3_INJECTIONS=/path/to/endo3_bbhpop-LIGO-T2100113-v12.h5 \\
    GWINF_REAL_O4A_INJECTIONS=/path/to/o4a...h5 \\
    GWINF_REAL_GWTC_PE_DIR=/path/to/pe_release_dir \\
        python -m pytest tests/preprocess/test_real_data_pins.py -v

Reference anchor: tests/download_test_data.sh + inference_test.py:75-82
(the reference CI downloads the zenodo O3 set and drives its loaders on it).
The real GWTC-3 69-event PE catalog (checked into the reference tree) is
always exercised when readable.
"""

import os

import numpy as np
import pytest

O3_PATH = os.environ.get("GWINF_REAL_O3_INJECTIONS")
O4A_PATH = os.environ.get("GWINF_REAL_O4A_INJECTIONS")
CATALOG = "/root/reference/tests/data/xarray_GWTC3_BBH_69evs_downsampled_1000samps_nospin.h5"

PARAMS = ["mass_1", "mass_ratio", "redshift", "a_1", "a_2", "cos_tilt_1", "cos_tilt_2"]


@pytest.mark.skipif(not (O3_PATH and os.path.exists(O3_PATH)), reason="set GWINF_REAL_O3_INJECTIONS to the zenodo O3 file")
def test_real_o3_injection_loader():
    from gwinferno_tpu.preprocess.selection import get_o3_cumulative_injection_dict

    arr = get_o3_cumulative_injection_dict(O3_PATH, PARAMS, ifar_threshold=1)
    names = [str(p) for p in arr.coords["param"]]
    for p in PARAMS + ["prior"]:
        assert p in names, f"missing {p}"
    data = np.asarray(arr.data)
    assert np.isfinite(data).all()
    i = names.index("mass_ratio")
    assert (data[i] > 0).all() and (data[i] <= 1.0 + 1e-12).all()
    assert (data[names.index("prior")] > 0).all()
    assert float(arr.attrs["total_generated"]) > data.shape[1]
    assert 0.0 < float(arr.attrs["analysis_time"]) < 10.0  # years


@pytest.mark.skipif(not (O4A_PATH and os.path.exists(O4A_PATH)), reason="set GWINF_REAL_O4A_INJECTIONS to the O4a cumulative file")
def test_real_o4a_injection_loader():
    from gwinferno_tpu.preprocess.selection import get_o4a_cumulative_injection_dict

    arr = get_o4a_cumulative_injection_dict(O4A_PATH, PARAMS)
    data = np.asarray(arr.data)
    assert np.isfinite(data).all()
    assert float(arr.attrs["total_generated"]) > data.shape[1]


@pytest.mark.skipif(not os.path.exists(CATALOG), reason="real GWTC-3 catalog not present")
def test_real_gwtc3_catalog_loads_and_is_sane():
    from gwinferno_tpu.preprocess.data_collection import load_catalog_netcdf3

    ds = load_catalog_netcdf3(CATALOG)
    arr = ds["posteriors"]
    params = [str(p) for p in arr.coords["param"]]
    assert "mass_1" in params and "prior" in params
    data = np.asarray(arr.data)
    n_ev, n_par, n_samp = data.shape
    assert n_ev == 69 and n_samp == 1000
    m1 = data[:, params.index("mass_1")]
    z = data[:, params.index("redshift")]
    pr = data[:, params.index("prior")]
    assert (m1 > 1.0).all() and (m1 < 300.0).all()
    assert (z > 0).all() and (z < 3.0).all()
    assert (pr > 0).all() and np.isfinite(pr).all()
