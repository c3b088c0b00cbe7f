"""Utils tests: metrics writer, profiling hooks, multihost helpers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crossclr_tpu.utils import MetricsWriter, StepTimer, nan_debug
from crossclr_tpu.parallel import (
    host_local_batch_size,
    initialize_multihost,
    is_multihost,
)


def test_metrics_writer_csv(tmp_path):
    path = tmp_path / "m.csv"
    w = MetricsWriter(path, echo=False)
    w({"loss": 1.5, "step": 1})
    w({"loss": 1.2, "step": 2})
    w.close()
    rows = path.read_text().strip().splitlines()
    assert rows[0] == "loss,step"
    assert rows[1].startswith("1.5")
    assert len(rows) == 3


def test_metrics_writer_no_path():
    w = MetricsWriter(None, echo=False)
    w({"loss": 1.0})  # must not raise
    w.close()


def test_step_timer():
    import time

    t = StepTimer(batch_size=32)
    t.tick(10)
    time.sleep(0.05)  # make elapsed time >> clock-read jitter
    assert t.steps_per_sec > 0
    assert abs(t.pairs_per_sec / t.steps_per_sec - 32) < 0.5


def test_nan_debug_restores_flag():
    prev = jax.config.jax_debug_nans
    with nan_debug(True):
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == prev


def test_nan_debug_catches_nan():
    with nan_debug(True):
        with pytest.raises(Exception):
            jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()


def test_multihost_noop_single_host():
    assert initialize_multihost() is False  # no coordinator configured
    assert is_multihost() is False
    assert host_local_batch_size(64) == 64
    # single host: any batch size divides evenly
    assert host_local_batch_size(63) == 63


def test_prefetch_to_device_preserves_order_and_values(rng):
    from crossclr_tpu.data import prefetch_to_device

    batches = [{"video": np.full((2, 3), i, np.float32)} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["video"]), batches[i]["video"])


def test_prefetch_handles_short_iterators():
    from crossclr_tpu.data import prefetch_to_device

    assert list(prefetch_to_device(iter([]), size=2)) == []
    one = [{"x": np.ones(2, np.float32)}]
    assert len(list(prefetch_to_device(iter(one), size=4))) == 1


def test_prefetch_threaded_safe_with_ring_buffer_reuse():
    """The worker fences each transfer before drawing the next batch, so a
    producer that OVERWRITES its buffers (stacked_chunks' destination
    ring) must still deliver every chunk's original values."""
    from crossclr_tpu.data import prefetch_to_device

    buf = np.empty((4, 3), np.float32)  # single reused buffer: worst case

    def producer():
        for i in range(8):
            buf[...] = i
            yield {"x": buf}

    out = list(prefetch_to_device(producer(), size=2))
    assert [int(np.asarray(b["x"])[0, 0]) for b in out] == list(range(8))


def test_prefetch_threaded_matches_unthreaded(rng):
    from crossclr_tpu.data import prefetch_to_device

    batches = [{"x": rng.standard_normal((2, 3)).astype(np.float32)}
               for _ in range(6)]
    threaded = list(prefetch_to_device(iter(batches), size=2))
    plain = list(prefetch_to_device(iter(batches), size=2, threaded=False))
    for a, b in zip(threaded, plain, strict=True):
        np.testing.assert_array_equal(np.asarray(a["x"]), np.asarray(b["x"]))


def test_prefetch_propagates_producer_exceptions():
    from crossclr_tpu.data import prefetch_to_device

    def producer():
        yield {"x": np.ones(2, np.float32)}
        raise RuntimeError("disk gone")

    it = prefetch_to_device(producer(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="disk gone"):
        list(it)


def test_prefetch_early_close_does_not_hang():
    """Closing the consumer mid-stream must stop the worker thread (no
    deadlock on the bounded queue)."""
    import threading
    import time

    from crossclr_tpu.data import prefetch_to_device

    def producer():
        i = 0
        while True:  # infinite stream, as in training
            yield {"x": np.full(2, i, np.float32)}
            i += 1

    before = threading.active_count()
    it = prefetch_to_device(producer(), size=1)
    next(it)
    it.close()
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.01)
    assert threading.active_count() <= before


def test_infinite_batches_resume_continues_sequence():
    """start_step=k must reproduce the same stream as consuming k batches."""
    from crossclr_tpu.data import SyntheticPairs, infinite_batches
    import itertools

    data = SyntheticPairs(num_pairs=64, video_dim=8, text_dim=8, seed=1)
    full = list(itertools.islice(infinite_batches(data, 16, seed=3), 12))
    resumed = list(
        itertools.islice(infinite_batches(data, 16, seed=3, start_step=7), 5)
    )
    for want, got in zip(full[7:], resumed):
        np.testing.assert_array_equal(want["video"], got["video"])
        np.testing.assert_array_equal(want["text"], got["text"])


def test_metrics_writer_union_schema(tmp_path):
    """Late-appearing keys (eval metrics) must not be dropped."""
    path = tmp_path / "m.csv"
    w = MetricsWriter(path, echo=False)
    w({"loss": 1.5, "step": 1})
    w({"eval/R@1": 50.0, "step": 2})
    w.close()
    import csv as _csv

    rows = list(_csv.DictReader(open(path)))
    assert rows[0]["loss"] == "1.5" and rows[1]["eval/R@1"] == "50.0"
    assert rows[1]["loss"] == ""


def test_native_bf16_preserves_nan():
    from crossclr_tpu.data.native_io import f32_to_bf16, native_available

    if not native_available():
        pytest.skip("no native lib")
    x = np.zeros(8, np.float32)
    x.view(np.uint32)[0] = 0x7F800001  # NaN with low-mantissa-only payload
    x.view(np.uint32)[1] = 0x7F800000  # +Inf stays Inf
    out = np.asarray(f32_to_bf16(x)).astype(np.float32)
    assert np.isnan(out[0])
    assert np.isposinf(out[1])


def test_infinite_batches_resume_no_drop_remainder():
    """start_step alignment must account for the partial last batch when
    drop_remainder=False."""
    from crossclr_tpu.data import SyntheticPairs, infinite_batches
    import itertools

    data = SyntheticPairs(num_pairs=50, video_dim=4, text_dim=4, seed=2)
    kw = dict(seed=5, drop_remainder=False)
    full = list(itertools.islice(infinite_batches(data, 16, **kw), 10))
    resumed = list(
        itertools.islice(infinite_batches(data, 16, start_step=5, **kw), 5)
    )
    for want, got in zip(full[5:], resumed):
        np.testing.assert_array_equal(want["video"], got["video"])


def test_host_shard_equal_lengths():
    from crossclr_tpu.data import HostShard, SyntheticPairs

    data = SyntheticPairs(num_pairs=101, video_dim=4, text_dim=4)
    shards = [HostShard(data, p, 4) for p in range(4)]
    assert {len(s) for s in shards} == {25}


def test_checked_catches_nan():
    from crossclr_tpu.utils.profiling import checked

    def bad(x):
        return jnp.log(x) * 2.0

    good_out = checked(bad)(jnp.asarray(2.0))
    np.testing.assert_allclose(float(good_out), 2 * np.log(2.0), rtol=1e-6)
    with pytest.raises(Exception):
        checked(bad)(jnp.asarray(-1.0))


def test_checked_catches_oob():
    from crossclr_tpu.utils.profiling import checked

    def gather(x, i):
        return x[i]

    assert float(checked(gather)(jnp.arange(4.0), jnp.asarray(2))) == 2.0
    with pytest.raises(Exception):
        checked(gather)(jnp.arange(4.0), jnp.asarray(9))


def test_metrics_writer_resume_appends(tmp_path):
    """Reopening the same CSV path (resume-from-checkpoint) must extend the
    log, not truncate pre-resume history (ADVICE round 1)."""
    import csv as _csv

    path = tmp_path / "m.csv"
    w = MetricsWriter(path, echo=False)
    w({"loss": 1.5, "step": 1})
    w({"loss": 1.2, "step": 2})
    w.close()

    w2 = MetricsWriter(path, echo=False)  # simulated resumed process
    w2({"loss": 0.9, "step": 3})
    w2({"loss": 0.8, "step": 4, "eval/R@1": 75.0})  # widened schema
    w2.close()

    rows = list(_csv.DictReader(open(path)))
    assert [r["step"] for r in rows] == ["1", "2", "3", "4"]
    assert rows[0]["loss"] == "1.5"  # pre-resume history intact
    assert rows[3]["eval/R@1"] == "75.0"


def test_train_eval_split_disjoint_and_complete():
    from crossclr_tpu.data import SyntheticPairs, train_eval_split

    data = SyntheticPairs(num_pairs=100, video_dim=8, text_dim=8, seed=0)
    train, ev = train_eval_split(data, 10)
    assert len(train) == 90 and len(ev) == 10
    # disjoint by value (synthetic rows are unique) and complete
    np.testing.assert_array_equal(
        np.concatenate([ev.video, train.video]), data.video
    )
    train_rows = {r.tobytes() for r in np.asarray(train.video)}
    eval_rows = {r.tobytes() for r in np.asarray(ev.video)}
    assert not train_rows & eval_rows

    with pytest.raises(ValueError):
        train_eval_split(data, 0)
    with pytest.raises(ValueError):
        train_eval_split(data, 100)


def test_train_stream_never_yields_eval_rows():
    """The CLI's train stream (epoch_batches over the train view) must not
    contain any held-out eval row (VERDICT r1: eval leakage)."""
    import itertools

    from crossclr_tpu.data import (
        SyntheticPairs,
        infinite_batches,
        train_eval_split,
    )

    data = SyntheticPairs(num_pairs=64, video_dim=8, text_dim=8, seed=0)
    train, ev = train_eval_split(data, 8)
    eval_rows = {r.tobytes() for r in np.asarray(ev.video)}
    for batch in itertools.islice(infinite_batches(train, 16, seed=0), 12):
        for row in batch["video"]:
            assert row.tobytes() not in eval_rows


def test_process_local_rows_blocks():
    from crossclr_tpu.training.trainer import process_local_rows

    blocks = [process_local_rows(64, p, 4) for p in range(4)]
    assert blocks == [(0, 16), (16, 32), (32, 48), (48, 64)]
    with pytest.raises(ValueError):
        process_local_rows(63, 0, 4)


def test_metrics_writer_tensorboard(tmp_path):
    """tensorboard_dir streams scalars to event files alongside the CSV."""
    from crossclr_tpu.utils import MetricsWriter

    w = MetricsWriter(
        tmp_path / "m.csv", echo=False, tensorboard_dir=tmp_path / "tb"
    )
    w({"loss": 1.5, "step": 1})
    w({"loss": 1.25, "grad_norm": 3.0, "step": 2})
    w.close()

    events = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert events, "no TensorBoard event file written"
    assert events[0].stat().st_size > 0
    # CSV side unaffected
    rows = (tmp_path / "m.csv").read_text().strip().splitlines()
    assert len(rows) == 3
