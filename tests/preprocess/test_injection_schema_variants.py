"""Real-file O3 injection-schema variants against the production loader.

The LVK O3 release (zenodo 5546676) and its derivatives ship several layouts
(reference download script tests/download_test_data.sh is unavailable here,
zero egress): multiple ifar_* search columns, an optional ``name`` column
with o1/o2 SNR cuts, ``total_generated`` as a group attr OR a scalar
dataset, and ``analysis_time`` under different names/locations.  These tests
build tiny variant files directly (NOT via the repo's own generator, which
was the round-1 'loader validates against its own mirror' gap)."""

import h5py
import numpy as np
import pytest

from gwinferno_tpu.preprocess.selection import get_o3_cumulative_injection_dict

PARAMS = ["mass_1", "mass_ratio", "redshift", "a_1", "a_2", "cos_tilt_1", "cos_tilt_2"]


def _write_variant(
    path,
    n=50,
    ifar_cols=("ifar_gstlal", "ifar_pycbc_bbh", "ifar_pycbc_full"),
    name_col=False,
    tg_as_dataset=False,
    analysis_time_key="analysis_time",
    analysis_time_on_group=False,
):
    rng = np.random.default_rng(42)
    m1 = rng.uniform(5, 80, n)
    q = rng.uniform(0.2, 1.0, n)
    z = rng.uniform(0.01, 1.5, n)
    a1, a2 = rng.uniform(0, 1, n), rng.uniform(0, 1, n)
    ct1, ct2 = rng.uniform(-1, 1, n), rng.uniform(-1, 1, n)
    st1, st2 = np.sqrt(1 - ct1**2), np.sqrt(1 - ct2**2)
    # each search finds a different, partially-overlapping subset
    ifar_values = {}
    found_mask = np.zeros(n, dtype=bool)
    for i, col in enumerate(ifar_cols):
        vals = np.where(rng.uniform(size=n) < 0.4, 10.0 + i, 0.01)
        ifar_values[col] = vals
        found_mask |= vals > 1.0
    snr = rng.uniform(5, 20, n)
    names = None
    if name_col:
        names = np.where(rng.uniform(size=n) < 0.3, b"o1", b"o3")
        found_mask |= (names == b"o1") & (snr > 10)

    with h5py.File(path, "w") as f:
        g = f.create_group("injections")
        g.create_dataset("mass1_source", data=m1)
        g.create_dataset("mass2_source", data=q * m1)
        g.create_dataset("redshift", data=z)
        g.create_dataset("sampling_pdf", data=rng.uniform(0.5, 2.0, n))
        g.create_dataset("spin1x", data=a1 * st1)
        g.create_dataset("spin1y", data=np.zeros(n))
        g.create_dataset("spin1z", data=a1 * ct1)
        g.create_dataset("spin2x", data=a2 * st2)
        g.create_dataset("spin2y", data=np.zeros(n))
        g.create_dataset("spin2z", data=a2 * ct2)
        g.create_dataset("optimal_snr_net", data=snr)
        for col, vals in ifar_values.items():
            g.create_dataset(col, data=vals)
        if names is not None:
            g.create_dataset("name", data=names)
        if tg_as_dataset:
            g.create_dataset("total_generated", data=np.int64(12345))
        else:
            g.attrs["total_generated"] = 12345
        at_target = g.attrs if analysis_time_on_group else f.attrs
        at_target[analysis_time_key] = 2.0 * 365.25 * 24 * 3600
    return found_mask


@pytest.mark.parametrize(
    "kw",
    [
        dict(),  # canonical: 3 LVK ifar columns, attrs total_generated
        dict(ifar_cols=("ifar_cwb", "ifar_mbta")),  # different search names
        dict(name_col=True),  # o1/o2 rows + SNR cut
        dict(tg_as_dataset=True),  # total_generated as a scalar dataset
        dict(analysis_time_key="total_analysis_time"),
        dict(analysis_time_key="analysis_time_s", analysis_time_on_group=True),
    ],
)
def test_o3_loader_schema_variants(tmp_path, kw):
    path = str(tmp_path / "inj.h5")
    found = _write_variant(path, **kw)
    arr = get_o3_cumulative_injection_dict(path, PARAMS, ifar_threshold=1, snr_threshold=10)
    data = np.asarray(arr.data)
    params = list(arr.coords["param"])
    assert data.shape == (len(params), found.sum())
    assert float(arr.attrs["total_generated"]) == 12345
    np.testing.assert_allclose(float(arr.attrs["analysis_time"]), 2.0, rtol=1e-10)
    # found selection matches the union-of-searches (+ o1/o2 SNR) rule
    with h5py.File(path, "r") as f:
        m1 = f["injections"]["mass1_source"][()]
    np.testing.assert_allclose(np.sort(data[params.index("mass_1")]), np.sort(m1[found]))
    # spin conversion: magnitudes in [0,1], tilts in [-1,1]
    a1 = data[params.index("a_1")]
    ct1 = data[params.index("cos_tilt_1")]
    assert ((a1 >= 0) & (a1 <= 1)).all() and ((ct1 >= -1) & (ct1 <= 1)).all()


def test_o3_loader_missing_total_generated_raises(tmp_path):
    path = str(tmp_path / "inj.h5")
    _write_variant(path)
    with h5py.File(path, "a") as f:
        del f["injections"].attrs["total_generated"]
    with pytest.raises(KeyError, match="total_generated"):
        get_o3_cumulative_injection_dict(path, PARAMS)
