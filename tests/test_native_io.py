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


def test_gather_3d_sequences_native(rng):
    """[N, S, D] sequence stores take the native path (rows contiguous)."""
    src = rng.standard_normal((50, 4, 8)).astype(np.float32)
    idx = rng.integers(0, 50, size=16)
    np.testing.assert_array_equal(gather_rows(src, idx), src[idx])
    # strided 3D view still correct (falls back or translates)
    view = src[1::3]
    idx2 = rng.integers(0, view.shape[0], size=8)
    np.testing.assert_array_equal(gather_rows(view, idx2), view[idx2])


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


def test_gather_strided_host_shard_view(rng):
    """[p::P] row views (inner-contiguous, strided rows) take the native
    path and match numpy."""
    src = rng.standard_normal((256, 32)).astype(np.float32)
    view = src[1::4]
    assert not view.flags["C_CONTIGUOUS"]
    idx = rng.integers(0, view.shape[0], size=48)
    np.testing.assert_array_equal(gather_rows(view, idx), view[idx])


def test_gather_concurrent_callers(rng):
    """Pool epochs are serialized: concurrent gathers from two threads
    never corrupt each other."""
    import threading

    src = rng.standard_normal((2000, 64)).astype(np.float32)
    errs = []

    def worker(seed):
        r = np.random.default_rng(seed)
        try:
            for _ in range(60):
                idx = r.integers(0, 2000, size=512)
                np.testing.assert_array_equal(gather_rows(src, idx), src[idx])
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(s,)) for s in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
