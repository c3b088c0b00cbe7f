"""Host input pipeline: one-gather chunk assembly and bf16 feature stores.

The reference pays two host→device boundaries per step (numpy-eye masks,
loss.py:66,102-104); this framework's host path instead assembles
``[n, B, ...]`` chunks with one multithreaded gather per modality
(``stacked_chunks``) and can store features as bf16 (half the disk,
gather, and H2D bytes — value-identical for bf16-matmul towers).
"""

import numpy as np
import pytest

from crossclr_tpu.data import (
    FeaturePairDataset,
    SyntheticPairs,
    infinite_batches,
    stack_batches,
    stacked_chunks,
)


def test_stacked_chunks_equal_stack_of_batches():
    """stacked_chunks must yield EXACTLY the stream of
    stack_batches(infinite_batches(...)) — same shuffle, same per-batch
    sorted indices, same epoch wrap — or a resumed run would train on
    different data depending on which assembler built the chunk."""
    data = SyntheticPairs(num_pairs=50, video_dim=8, text_dim=6, seed=3)
    b, n = 8, 4  # 6 batches/epoch: a 4-batch chunk wraps epochs
    want_it = stack_batches(infinite_batches(data, b, seed=7), n)
    got_it = stacked_chunks(data, b, n, seed=7)
    for _ in range(5):
        want, got = next(want_it), next(got_it)
        assert set(want) == set(got)
        for k in want:
            np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_stacked_chunks_resume_matches_fast_forward():
    data = SyntheticPairs(num_pairs=64, video_dim=8, text_dim=6, seed=0)
    b, n = 8, 3
    full = stacked_chunks(data, b, n, seed=5)
    chunks = [next(full) for _ in range(4)]
    # resume after 2 chunks = start_step 6 (per-batch steps)
    resumed = stacked_chunks(data, b, n, seed=5, start_step=2 * n)
    for want in chunks[2:]:
        got = next(resumed)
        for k in want:
            np.testing.assert_array_equal(got[k], want[k])


def test_stacked_chunks_carries_masks():
    data = SyntheticPairs(
        num_pairs=32, video_dim=8, text_dim=6, video_seq_len=4,
        text_seq_len=3, variable_lengths=True, seed=1,
    )
    chunk = next(stacked_chunks(data, 8, 2, seed=0))
    assert chunk["video"].shape == (2, 8, 4, 8)
    assert chunk["video_mask"].shape == (2, 8, 4)
    assert chunk["text_mask"].shape == (2, 8, 3)
    want = next(stack_batches(infinite_batches(data, 8, seed=0), 2))
    np.testing.assert_array_equal(chunk["video_mask"], want["video_mask"])


def test_stacked_chunks_ring_matches_fresh_mode():
    """reuse_buffers must not change the stream — each ring chunk, copied
    before the next draw (the documented validity window), equals the
    fresh-allocation stream's chunk."""
    data = SyntheticPairs(num_pairs=50, video_dim=8, text_dim=6, seed=3)
    fresh = stacked_chunks(data, 8, 4, seed=7)
    ring = stacked_chunks(data, 8, 4, seed=7, reuse_buffers=2)
    ring_bufs = []
    for _ in range(5):
        got = next(ring)
        ring_bufs.append({k: v.base for k, v in got.items()})
        want = next(fresh)
        for k in want:
            np.testing.assert_array_equal(got[k], want[k], err_msg=k)
    # the ring actually reuses: draws i and i+2 share their buffers
    assert ring_bufs[0]["video"] is ring_bufs[2]["video"]
    assert ring_bufs[1]["text"] is ring_bufs[3]["text"]
    with pytest.raises(ValueError, match="reuse_buffers=1"):
        next(stacked_chunks(data, 8, 4, reuse_buffers=1))


def test_gather_rows_out_parameter():
    from crossclr_tpu.data.native_io import gather_rows

    rng = np.random.default_rng(0)
    src = rng.standard_normal((30, 5)).astype(np.float32)
    idx = np.array([3, 3, 7, 29, 0])
    out = np.empty((5, 5), dtype=np.float32)
    got = gather_rows(src, idx, out=out)
    assert got is out
    np.testing.assert_array_equal(out, src[idx])
    with pytest.raises(ValueError, match="out must be"):
        gather_rows(src, idx, out=np.empty((4, 5), dtype=np.float32))
    with pytest.raises(ValueError, match="out must be"):
        gather_rows(src, idx, out=np.empty((5, 5), dtype=np.float64))


def test_bf16_feature_store_roundtrip(tmp_path):
    """A bf16 store mmaps back (numpy round-trips bf16 .npy as raw
    2-byte records) and gathers bit-identically to the host-converted
    fp32 source."""
    import ml_dtypes

    from crossclr_tpu.data.native_io import f32_to_bf16

    rng = np.random.default_rng(0)
    v = rng.standard_normal((20, 8)).astype(np.float32)
    t = rng.standard_normal((20, 6)).astype(np.float32)
    vb, tb = f32_to_bf16(v), f32_to_bf16(t)
    vp, tp = tmp_path / "v.npy", tmp_path / "t.npy"
    np.save(vp, vb)
    np.save(tp, tb)

    ds = FeaturePairDataset(vp, tp, dtype="bfloat16")
    assert ds.video.dtype == ml_dtypes.bfloat16
    batch = next(infinite_batches(ds, 4, seed=0, shuffle=False))
    assert batch["video"].dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(
        batch["video"].view(np.uint16), vb[:4].view(np.uint16)
    )
    chunk = next(stacked_chunks(ds, 4, 2, seed=0, shuffle=False))
    np.testing.assert_array_equal(
        chunk["text"].view(np.uint16), tb[:8].view(np.uint16).reshape(2, 4, 6)
    )


def test_bf16_store_dtype_mismatches_are_loud(tmp_path):
    rng = np.random.default_rng(0)
    f32 = rng.standard_normal((8, 4)).astype(np.float32)
    p32 = tmp_path / "f32.npy"
    np.save(p32, f32)
    pbf = tmp_path / "bf.npy"
    np.save(pbf, f32.astype(np.float16).view(np.uint16))  # any 2-byte store

    with pytest.raises(ValueError, match="not a 2-byte"):
        FeaturePairDataset(p32, p32, dtype="bfloat16")
    with pytest.raises(ValueError, match="bfloat16"):
        FeaturePairDataset(pbf, pbf)  # 2-byte store without the flag
    with pytest.raises(ValueError, match="unsupported"):
        FeaturePairDataset(p32, p32, dtype="float16")


def test_features_dtype_flows_from_config(tmp_path):
    from crossclr_tpu.data import dataset_from_config
    from crossclr_tpu.data.native_io import f32_to_bf16
    from crossclr_tpu.utils.config import DataConfig

    rng = np.random.default_rng(0)
    v = f32_to_bf16(rng.standard_normal((10, 4)).astype(np.float32))
    t = f32_to_bf16(rng.standard_normal((10, 3)).astype(np.float32))
    np.save(tmp_path / "v.npy", v)
    np.save(tmp_path / "t.npy", t)
    ds, ids = dataset_from_config(DataConfig(
        source="files",
        video_path=str(tmp_path / "v.npy"),
        text_path=str(tmp_path / "t.npy"),
        features_dtype="bfloat16",
    ))
    assert ids is None and len(ds) == 10
    assert str(ds.video.dtype) == "bfloat16"


def test_bf16_inputs_train_identically_to_fp32_for_bf16_towers():
    """The bf16 store claim: for towers whose first matmul casts inputs
    to bf16, feeding pre-rounded bf16 features changes NOTHING — same
    loss, same params after a step."""
    import jax.numpy as jnp

    from crossclr_tpu.data.native_io import f32_to_bf16
    from crossclr_tpu.models import TowerConfig
    from crossclr_tpu.training import TrainConfig, Trainer

    data = SyntheticPairs(num_pairs=32, video_dim=12, text_dim=8, seed=0)
    vc = TowerConfig(kind="mlp", input_dim=12, embed_dim=8, hidden_dim=16,
                     dtype=jnp.bfloat16)
    tc = TowerConfig(kind="mlp", input_dim=8, embed_dim=8, hidden_dim=16,
                     dtype=jnp.bfloat16)
    cfg = TrainConfig(total_steps=10, warmup_steps=2)

    losses = []
    for cast in (False, True):
        trainer = Trainer(vc, tc, cfg, mesh=None)
        batch = {
            "video": np.asarray(data.video[:16]),
            "text": np.asarray(data.text[:16]),
        }
        if cast:
            batch = {k: f32_to_bf16(v) for k, v in batch.items()}
        state = trainer.init_state(batch["video"][:2], batch["text"][:2])
        state, m = trainer.train_step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[0] == losses[1], losses


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_input_pipeline_bench_script(tmp_path, capsys, dtype):
    """The file-fed throughput harness (scripts/bench_input_pipeline.py)
    runs end-to-end at toy shapes and reports every decomposition tier —
    assembly, raw H2D, device-resident, and file-fed — so the BASELINE.md
    accounting stays reproducible.  int8 exercises the scale-carrying
    stacked chunks through prefetch + the scanned step."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    import bench_input_pipeline

    rc = bench_input_pipeline.main(
        [
            "--rows", "256", "--batch", "32", "--spc", "2", "--chunks", "2",
            "--video-dim", "16", "--text-dim", "12", "--dtype", dtype,
            "--data-dir", str(tmp_path),
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for key in (
        "assembly_pairs_per_sec",
        "h2d_gb_per_sec",
        "resident_pairs_per_sec",
        "file_fed_pairs_per_sec",
        "file_fed_vs_resident",
    ):
        assert out[key] > 0, (key, out)


def test_threaded_prefetch_with_sharded_collective_step():
    """Regression: XLA:CPU intra-process collectives rendezvous on the
    compute thread pool — driving jax from the prefetch worker thread
    while the consumer executes a sharded (all-gather) step starved one
    rendezvous participant and ABORTED the process after a 40 s timeout
    (rendezvous.cc 'Termination timeout ... Exiting').  On CPU
    destinations the worker must therefore stay off jax entirely (host
    copies only; the zero-copy device_put happens consumer-side).  This
    pins the pattern in isolation; the deterministic repro of the abort
    was test_config_cli.py::test_cli_heldout_retrieval_gate (300 CLI
    steps), which now doubles as the regression gate."""
    import jax

    from crossclr_tpu.data import SyntheticPairs, infinite_batches, prefetch_to_device
    from crossclr_tpu.models import TowerConfig
    from crossclr_tpu.parallel import data_sharding, make_mesh
    from crossclr_tpu.training import TrainConfig, Trainer

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device mesh")

    mesh = make_mesh(n_data=8, n_model=1)
    data = SyntheticPairs(num_pairs=128, video_dim=16, text_dim=12, seed=0)
    vc = TowerConfig(kind="mlp", input_dim=16, embed_dim=8, hidden_dim=16,
                     dtype="float32")
    tc = TowerConfig(kind="mlp", input_dim=12, embed_dim=8, hidden_dim=16,
                     dtype="float32")
    trainer = Trainer(
        vc, tc,
        TrainConfig(loss="crossclr_intra", global_negatives=True,
                    total_steps=40, warmup_steps=4),
        mesh=mesh,
    )
    it = prefetch_to_device(
        infinite_batches(data, 32, seed=0), size=2,
        sharding=data_sharding(mesh), threaded=True,
    )
    batch = next(it)
    state = trainer.init_state(batch["video"][:4], batch["text"][:4])
    for _ in range(30):
        state, m = trainer.train_step(state, batch)
        batch = next(it)
    it.close()
    assert np.isfinite(float(m["loss"]))


# -- int8 feature stores (per-row scales, device-side dequant) --------------


def test_quantize_roundtrip_error_bound():
    """Per-row symmetric int8: worst-case element error is scale/2 =
    max|row|/254; all-zero rows get scale 1.0 (no zero divides)."""
    from crossclr_tpu.data import quantize_features
    from crossclr_tpu.data.quantize import dequantize

    rng = np.random.default_rng(0)
    x = (rng.standard_normal((16, 10)) * rng.uniform(0.1, 50, (16, 1))).astype(
        np.float32
    )
    x[3] = 0.0
    q, scale = quantize_features(x)
    assert q.dtype == np.int8 and scale.dtype == np.float32
    assert scale.shape == (16,) and scale[3] == 1.0
    back = np.asarray(dequantize(q, scale))
    bound = np.abs(x).max(axis=1, keepdims=True) / 254.0 + 1e-7
    assert (np.abs(back - x) <= bound).all()

    # sequences quantize per ROW (over S·D), not per step
    seq = rng.standard_normal((4, 3, 5)).astype(np.float32)
    qs, ss = quantize_features(seq)
    assert qs.shape == seq.shape and ss.shape == (4,)
    back = np.asarray(dequantize(qs, ss))
    assert np.abs(back - seq).max() <= np.abs(seq).max() / 254.0 + 1e-7


def test_quantize_fuzz_shapes_and_distributions():
    """Property fuzz over shapes/scales/degeneracies: payload stays in
    [-127, 127] (never -128), scales positive fp32, reconstruction within
    scale/2 per element, zero rows exactly preserved, and dequant is
    dtype/shape-stable."""
    from crossclr_tpu.data import quantize_features
    from crossclr_tpu.data.quantize import dequantize

    rng = np.random.default_rng(123)
    for trial in range(20):
        ndim = int(rng.integers(2, 4))
        shape = tuple(int(rng.integers(1, 9)) for _ in range(ndim))
        scale_mag = 10.0 ** rng.uniform(-6, 6)
        x = (rng.standard_normal(shape) * scale_mag).astype(np.float32)
        if trial % 4 == 0:
            x[0] = 0.0  # degenerate all-zero row
        if trial % 5 == 0:
            x = np.round(x)  # ties / exact zeros inside rows
        q, s = quantize_features(x)
        assert q.shape == x.shape and q.dtype == np.int8
        assert s.shape == (shape[0],) and s.dtype == np.float32
        assert q.min() >= -127 and q.max() <= 127  # symmetric: no -128
        assert (s > 0).all()
        back = np.asarray(dequantize(q, s))
        assert back.dtype == np.float32 and back.shape == x.shape
        # 0.5 quanta + slack for the fp32 quotient's ulp at rint boundaries
        bound = s.reshape((-1,) + (1,) * (ndim - 1)) * (0.5 + 1e-4) + 1e-30
        assert (np.abs(back - x) <= bound).all(), (trial, shape, scale_mag)
        zero_rows = np.abs(x).reshape(shape[0], -1).max(axis=1) == 0
        assert (back.reshape(shape[0], -1)[zero_rows] == 0).all()

    with pytest.raises(ValueError, match="expected"):
        quantize_features(np.ones(5, np.float32))  # 1-D rejected

    # denormal rows: amax/127 underflows fp32 to 0.0 — the scale floor
    # must prevent divide-by-zero / invalid int8 casts
    denorm = np.full((2, 4), 1.4e-45, np.float32)
    with np.errstate(divide="raise", invalid="raise"):
        q, s = quantize_features(denorm)
    assert (s > 0).all() and np.isfinite(s).all()
    assert np.isfinite(np.asarray(dequantize(q, s))).all()

    # NaN rows refuse loudly instead of silently poisoning the payload
    bad = np.ones((3, 4), np.float32)
    bad[1, 2] = np.nan
    with pytest.raises(ValueError, match="non-finite"):
        quantize_features(bad)


def test_int8_feature_store_roundtrip(tmp_path):
    """int8 stores load with sibling scales; batches and stacked chunks
    carry [B] / [n, B] scale entries; views (RowSubset/HostShard) slice
    the scales alongside the payload."""
    from crossclr_tpu.data import (
        HostShard,
        quantize_features,
        train_eval_split,
    )

    rng = np.random.default_rng(1)
    v = rng.standard_normal((24, 8)).astype(np.float32)
    t = rng.standard_normal((24, 6)).astype(np.float32)
    for arr, name in ((v, "v"), (t, "t")):
        q, s = quantize_features(arr)
        np.save(tmp_path / f"{name}.npy", q)
        np.save(tmp_path / f"{name}_scale.npy", s)

    ds = FeaturePairDataset(tmp_path / "v.npy", tmp_path / "t.npy", dtype="int8")
    assert ds.video.dtype == np.int8 and ds.video_scale.shape == (24,)

    batch = next(infinite_batches(ds, 4, seed=0, shuffle=False))
    assert batch["video"].dtype == np.int8
    assert batch["video_scale"].shape == (4,)
    assert batch["text_scale"].shape == (4,)
    np.testing.assert_array_equal(
        batch["video_scale"], np.asarray(ds.video_scale[:4])
    )

    chunk = next(stacked_chunks(ds, 4, 2, seed=0, shuffle=False,
                                reuse_buffers=2))
    assert chunk["video"].shape == (2, 4, 8)
    assert chunk["video_scale"].shape == (2, 4)

    train, evald = train_eval_split(ds, 8)
    assert train.video_scale.shape == (16,) and evald.video_scale.shape == (8,)
    shard = HostShard(ds, 1, 2)
    np.testing.assert_array_equal(
        np.asarray(shard.video_scale), np.asarray(ds.video_scale[1::2][:12])
    )


def test_float16_store_not_relabeled_as_bf16(tmp_path):
    """A genuine float16 .npy must be REJECTED under dtype='bfloat16' —
    viewing fp16 bits as bf16 silently produces garbage features
    (fp16 1.0 = 0x3C00 reads as bf16 ~0.0078)."""
    rng = np.random.default_rng(9)
    np.save(tmp_path / "h.npy", rng.standard_normal((4, 6)).astype(np.float16))
    with pytest.raises(ValueError, match="CONVERTED"):
        FeaturePairDataset(tmp_path / "h.npy", tmp_path / "h.npy",
                           dtype="bfloat16")


def test_int8_store_errors_are_loud(tmp_path):
    from crossclr_tpu.data import quantize_features

    rng = np.random.default_rng(2)
    x = rng.standard_normal((8, 4)).astype(np.float32)
    q, s = quantize_features(x)
    np.save(tmp_path / "q.npy", q)
    np.save(tmp_path / "f.npy", x)

    # int8 payload without the flag
    with pytest.raises(ValueError, match="int8"):
        FeaturePairDataset(tmp_path / "q.npy", tmp_path / "q.npy")
    # flag without the scale file
    with pytest.raises(ValueError, match="scale"):
        FeaturePairDataset(tmp_path / "q.npy", tmp_path / "q.npy", dtype="int8")
    # flag on a float store
    with pytest.raises(ValueError, match="not int8"):
        FeaturePairDataset(tmp_path / "f.npy", tmp_path / "f.npy", dtype="int8")
    # wrong scale shape
    np.save(tmp_path / "q_scale.npy", s[:4])
    with pytest.raises(ValueError, match="float32"):
        FeaturePairDataset(tmp_path / "q.npy", tmp_path / "q.npy", dtype="int8")


def test_int8_training_matches_host_dequantized_floats():
    """The device-side dequant contract: a train step (and encode) fed the
    int8 payload + scales equals the same step fed host-dequantized fp32
    features — the quantization error is in the STORE, never in where the
    dequant runs."""
    import jax.numpy as jnp

    from crossclr_tpu.data import quantize_features
    from crossclr_tpu.data.quantize import dequantize
    from crossclr_tpu.models import TowerConfig
    from crossclr_tpu.training import TrainConfig, Trainer

    rng = np.random.default_rng(3)
    v = rng.standard_normal((16, 12)).astype(np.float32)
    t = rng.standard_normal((16, 8)).astype(np.float32)
    qv, sv = quantize_features(v)
    qt, st = quantize_features(t)

    vc = TowerConfig(kind="mlp", input_dim=12, embed_dim=8, hidden_dim=16)
    tc = TowerConfig(kind="mlp", input_dim=8, embed_dim=8, hidden_dim=16)
    # full CrossCLR so the connectivity inputs ALSO flow through dequant
    cfg = TrainConfig(loss="crossclr", total_steps=10, warmup_steps=2)

    results = []
    for quantized in (True, False):
        trainer = Trainer(vc, tc, cfg, mesh=None)
        if quantized:
            batch = {"video": qv, "text": qt,
                     "video_scale": sv, "text_scale": st}
        else:
            batch = {
                "video": np.asarray(dequantize(qv, sv)),
                "text": np.asarray(dequantize(qt, st)),
            }
        state = trainer.init_state(batch["video"][:2], batch["text"][:2])
        state, m = trainer.train_step(state, batch)
        ve, te = trainer.encode(state, batch)
        results.append((float(m["loss"]), np.asarray(ve), np.asarray(te)))

    assert results[0][0] == results[1][0], (results[0][0], results[1][0])
    np.testing.assert_array_equal(results[0][1], results[1][1])
    np.testing.assert_array_equal(results[0][2], results[1][2])


def test_int8_training_under_mesh_global_negatives():
    """int8 batches shard like float ones: the [B] scale fields take the
    same data-axis spec as the [B, D] payloads (and [n, B] under stacked
    chunks — P(None, data) is rank-compatible with both), and the
    shard_map global-negative step dequantizes inside jit.  The sharded
    int8 step must equal the single-device step fed the same payload."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    from crossclr_tpu.data import quantize_features
    from crossclr_tpu.models import TowerConfig
    from crossclr_tpu.parallel import data_sharding, make_mesh
    from crossclr_tpu.training import TrainConfig, Trainer

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device mesh")

    rng = np.random.default_rng(7)
    v = rng.standard_normal((32, 12)).astype(np.float32)
    t = rng.standard_normal((32, 8)).astype(np.float32)
    qv, sv = quantize_features(v)
    qt, st = quantize_features(t)
    batch = {"video": qv, "text": qt, "video_scale": sv, "text_scale": st}

    vc = TowerConfig(kind="mlp", input_dim=12, embed_dim=8, hidden_dim=16,
                     dtype="float32")
    tc = TowerConfig(kind="mlp", input_dim=8, embed_dim=8, hidden_dim=16,
                     dtype="float32")
    cfg = TrainConfig(loss="crossclr_intra", global_negatives=True,
                      total_steps=10, warmup_steps=2)

    losses = []
    for mesh in (make_mesh(n_data=8, n_model=1), None):
        trainer = Trainer(vc, tc, TrainConfig(**{
            **cfg.__dict__, "global_negatives": mesh is not None}), mesh=mesh)
        state = trainer.init_state(batch["video"][:4], batch["text"][:4])
        b = batch
        if mesh is not None:
            sh = data_sharding(mesh)
            b = {k: jax.device_put(np.asarray(x), sh) for k, x in batch.items()}
        state, m = trainer.train_step(state, b)
        losses.append(float(m["loss"]))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)

    # stacked chunks under the mesh: [n, B] scales take P(None, data)
    mesh = make_mesh(n_data=8, n_model=1)
    trainer = Trainer(vc, tc, TrainConfig(**{
        **cfg.__dict__, "steps_per_call": 2}), mesh=mesh)
    state = trainer.init_state(batch["video"][:4], batch["text"][:4])
    stacked_sh = NamedSharding(mesh, PartitionSpec(None, "data"))
    stacked = {
        k: jax.device_put(np.stack([np.asarray(x)] * 2), stacked_sh)
        for k, x in batch.items()
    }
    state, ms = trainer.train_steps(state, stacked)
    assert np.isfinite(np.asarray(ms["loss"])).all()


def test_int8_features_dtype_flows_from_config(tmp_path):
    from crossclr_tpu.data import dataset_from_config, quantize_features
    from crossclr_tpu.utils.config import DataConfig

    rng = np.random.default_rng(4)
    for name, d in (("v", 4), ("t", 3)):
        q, s = quantize_features(rng.standard_normal((10, d)).astype(np.float32))
        np.save(tmp_path / f"{name}.npy", q)
        np.save(tmp_path / f"{name}_scale.npy", s)
    ds, ids = dataset_from_config(DataConfig(
        source="files",
        video_path=str(tmp_path / "v.npy"),
        text_path=str(tmp_path / "t.npy"),
        features_dtype="int8",
    ))
    assert ids is None and len(ds) == 10
    assert ds.video.dtype == np.int8 and ds.text_scale.shape == (10,)
