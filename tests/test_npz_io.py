"""io/npz.py: selectable-compression chunk writing.

Guards that all three modes produce archives np.load reads back bit-exact
(the chunk readers never change), that 'none' really is STORED and 'fast'
really deflates, and that the mode names are validated. The reference
persists chunks uncompressed via torch.save (slam/offline_chunk_creator.py
:318-331); 'none' is that behavior's npz analog.
"""

import zipfile

import numpy as np
import pytest

from pi3_slam_tpu.io.npz import save_npz


def _chunk_like(rng):
    return {
        "points": rng.standard_normal((4, 24, 32, 3)).astype(np.float16),
        "conf": rng.random((4, 24, 32, 1)).astype(np.float16),
        "poses": rng.standard_normal((4, 4, 4)).astype(np.float64),
        "kp_idx": rng.integers(0, 1000, (4, 50)).astype(np.int32),
        "flag": np.asarray(True),
    }


@pytest.mark.parametrize("mode", ["default", "fast", "none"])
def test_save_npz_round_trip(tmp_path, rng, mode):
    arrays = _chunk_like(rng)
    path = str(tmp_path / f"chunk_{mode}.npz")
    save_npz(path, mode, **arrays)
    loaded = np.load(path)
    assert set(loaded.files) == set(arrays)
    for k, v in arrays.items():
        got = loaded[k]
        assert got.dtype == np.asanyarray(v).dtype
        np.testing.assert_array_equal(got, v)


def test_save_npz_compression_methods(tmp_path, rng):
    arrays = _chunk_like(rng)
    sizes = {}
    for mode in ("default", "fast", "none"):
        path = str(tmp_path / f"c_{mode}.npz")
        save_npz(path, mode, **arrays)
        with zipfile.ZipFile(path) as zf:
            methods = {info.compress_type for info in zf.infolist()}
        expected = zipfile.ZIP_STORED if mode == "none" else zipfile.ZIP_DEFLATED
        assert methods == {expected}, (mode, methods)
        sizes[mode] = sum(info.compress_size for info in zf.infolist())
    # random float16 barely deflates, but STORED must be >= either deflate
    assert sizes["none"] >= sizes["fast"] >= sizes["default"] * 0.95


def test_save_npz_rejects_unknown_mode(tmp_path, rng):
    with pytest.raises(ValueError):
        save_npz(str(tmp_path / "x.npz"), "max", a=np.zeros(3))
