"""Native host-IO kernel tests (C++ pool gather / bf16 vs numpy)."""

import numpy as np
import pytest

from crossclr_tpu.data.native_io import f32_to_bf16, gather_rows, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable (no compiler?)"
)


def test_gather_matches_numpy(rng):
    src = rng.standard_normal((500, 64)).astype(np.float32)
    idx = rng.integers(0, 500, size=128)
    np.testing.assert_array_equal(gather_rows(src, idx), src[idx])


def test_gather_empty_and_single(rng):
    src = rng.standard_normal((10, 8)).astype(np.float32)
    np.testing.assert_array_equal(
        gather_rows(src, np.asarray([], np.int64)), src[[]]
    )
    np.testing.assert_array_equal(gather_rows(src, np.asarray([3])), src[[3]])


def test_gather_non_f32_dtype(rng):
    src = (rng.standard_normal((100, 16)) * 100).astype(np.int16)
    idx = rng.integers(0, 100, size=32)
    np.testing.assert_array_equal(gather_rows(src, idx), src[idx])


def test_gather_memmap(tmp_path, rng):
    src = rng.standard_normal((200, 32)).astype(np.float32)
    path = tmp_path / "feat.npy"
    np.save(path, src)
    mm = np.load(path, mmap_mode="r")
    idx = rng.integers(0, 200, size=64)
    np.testing.assert_array_equal(gather_rows(mm, idx), src[idx])


def test_gather_3d_falls_back(rng):
    src = rng.standard_normal((50, 4, 8)).astype(np.float32)
    idx = rng.integers(0, 50, size=16)
    np.testing.assert_array_equal(gather_rows(src, idx), src[idx])


def test_bf16_matches_mldtypes(rng):
    import ml_dtypes

    x = rng.standard_normal(70000).astype(np.float32)
    # include specials
    x[:4] = [0.0, -0.0, np.inf, -np.inf]
    got = np.asarray(f32_to_bf16(x))
    want = x.astype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(got, want)


def test_gather_repeated_calls_stable(rng):
    """Thread pool survives many dispatches without deadlock/corruption."""
    src = rng.standard_normal((1000, 128)).astype(np.float32)
    for _ in range(50):
        idx = rng.integers(0, 1000, size=256)
        np.testing.assert_array_equal(gather_rows(src, idx), src[idx])
