"""Feature-preparation tool tests."""

import json
import pickle

import numpy as np
import pytest

import importlib.util
from pathlib import Path

_spec = importlib.util.spec_from_file_location(
    "prepare_features", Path(__file__).parent.parent / "scripts/prepare_features.py"
)
prepare_features = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(prepare_features)


def test_npz_roundtrip(tmp_path, rng):
    v = rng.standard_normal((10, 4, 8)).astype(np.float32)  # sequence: pooled
    t = rng.standard_normal((10, 6)).astype(np.float32)
    np.savez(tmp_path / "f.npz", video=v, text=t)
    out = tmp_path / "out"
    prepare_features.main(["--npz", str(tmp_path / "f.npz"),
                           "--dtype", "float32", "--out", str(out)])
    got_v = np.load(out / "video_feats.npy")
    got_t = np.load(out / "text_feats.npy")
    np.testing.assert_allclose(got_v, v.mean(axis=1), rtol=1e-6)
    np.testing.assert_array_equal(got_t, t)
    assert len(json.loads((out / "ids.json").read_text())) == 10


def test_pickle_dict_alignment(tmp_path, rng):
    ids = ["clip_b", "clip_a", "clip_c"]
    video = {i: rng.standard_normal(8).astype(np.float32) for i in ids}
    text = {i: rng.standard_normal(5).astype(np.float32) for i in ids[:2]}
    with open(tmp_path / "f.pkl", "wb") as fh:
        pickle.dump({"video": video, "text": text}, fh)
    out = tmp_path / "out"
    prepare_features.main(["--pickle", str(tmp_path / "f.pkl"),
                           "--dtype", "float32", "--out", str(out)])
    got_ids = json.loads((out / "ids.json").read_text())
    assert got_ids == ["clip_a", "clip_b"]  # intersection, sorted
    got_v = np.load(out / "video_feats.npy")
    np.testing.assert_array_equal(got_v[0], video["clip_a"])


def test_dir_pairing_feeds_dataset(tmp_path, rng):
    vd, td = tmp_path / "v", tmp_path / "t"
    vd.mkdir(), td.mkdir()
    for i in range(5):
        np.save(vd / f"clip{i}.npy", rng.standard_normal(8).astype(np.float32))
        np.save(td / f"clip{i}.npy", rng.standard_normal(6).astype(np.float32))
    out = tmp_path / "out"
    prepare_features.main(
        ["--video-dir", str(vd), "--text-dir", str(td),
         "--dtype", "float32", "--out", str(out)]
    )
    from crossclr_tpu.data import FeaturePairDataset

    ds = FeaturePairDataset(out / "video_feats.npy", out / "text_feats.npy")
    assert len(ds) == 5
    assert ds.video.shape == (5, 8) and ds.text.shape == (5, 6)


def test_ragged_sequences_padded_with_masks(tmp_path, rng):
    """--keep-sequence with ragged per-clip lengths: sequences zero-padded
    to the max length, [N, S] masks emitted, and FeaturePairDataset +
    epoch_batches carry them end to end."""
    from crossclr_tpu.data import FeaturePairDataset, epoch_batches

    vd, td = tmp_path / "v", tmp_path / "t"
    vd.mkdir(), td.mkdir()
    lengths = [3, 5, 2, 5]
    for i, s in enumerate(lengths):
        np.save(vd / f"clip{i}.npy", rng.standard_normal((s, 8)).astype(np.float32))
        np.save(td / f"clip{i}.npy", rng.standard_normal((4, 6)).astype(np.float32))
    out = tmp_path / "out"
    prepare_features.main([
        "--video-dir", str(vd), "--text-dir", str(td),
        "--keep-sequence", "--dtype", "float32", "--out", str(out),
    ])

    v = np.load(out / "video_mask.npy")
    assert v.shape == (4, 5)
    np.testing.assert_array_equal(v.sum(axis=1), lengths)
    assert not (out / "text_mask.npy").exists()  # uniform lengths: no mask

    feats = np.load(out / "video_feats.npy")
    assert feats.shape == (4, 5, 8)
    assert np.all(feats[v == 0.0] == 0.0)  # padding is zeros

    ds = FeaturePairDataset(
        out / "video_feats.npy", out / "text_feats.npy",
        video_mask_path=out / "video_mask.npy",
    )
    batch = next(epoch_batches(ds, 4, shuffle=False))
    assert batch["video_mask"].shape == (4, 5)
    assert "text_mask" not in batch


def test_mask_shape_validation(tmp_path, rng):
    from crossclr_tpu.data import FeaturePairDataset

    np.save(tmp_path / "v.npy", rng.standard_normal((4, 5, 8)).astype(np.float32))
    np.save(tmp_path / "t.npy", rng.standard_normal((4, 6)).astype(np.float32))
    np.save(tmp_path / "bad.npy", np.ones((4, 3), np.float32))
    import pytest

    with pytest.raises(ValueError, match="does not match"):
        FeaturePairDataset(
            tmp_path / "v.npy", tmp_path / "t.npy",
            video_mask_path=tmp_path / "bad.npy",
        )
    with pytest.raises(ValueError, match="pooled"):
        FeaturePairDataset(
            tmp_path / "v.npy", tmp_path / "t.npy",
            text_mask_path=np.save(tmp_path / "tm.npy", np.ones((4, 6), np.float32))
            or tmp_path / "tm.npy",
        )


def test_realistic_archive_through_cli_train_eval(tmp_path, rng):
    """The real-data on-ramp end to end (SURVEY.md §7 step 5): a realistic
    archive fixture — ragged per-clip video dir + caption dir with
    MISMATCHED id sets — through prepare_features, then the ``files`` data
    source through one full CLI train+eval+checkpoint cycle."""
    from crossclr_tpu.train import main as train_main

    vd, td = tmp_path / "clips", tmp_path / "caps"
    vd.mkdir(), td.mkdir()
    lengths = {}
    for i in range(40):  # video features for clips 0..39, ragged lengths
        s = int(rng.integers(2, 7))
        lengths[f"clip{i:03d}"] = s
        np.save(vd / f"clip{i:03d}.npy", rng.standard_normal((s, 8)).astype(np.float32))
    for i in range(4, 42):  # captions for clips 4..41: intersection = 4..39
        np.save(td / f"clip{i:03d}.npy", rng.standard_normal(6).astype(np.float32))
    out = tmp_path / "prepared"
    prepare_features.main([
        "--video-dir", str(vd), "--text-dir", str(td),
        "--keep-sequence", "--dtype", "float32", "--out", str(out),
    ])

    ids = json.loads((out / "ids.json").read_text())
    assert len(ids) == 36 and ids[0] == "clip004" and ids[-1] == "clip039"
    v = np.load(out / "video_feats.npy")
    mask = np.load(out / "video_mask.npy")
    s_max = max(lengths[i] for i in ids)
    assert v.shape == (36, s_max, 8) and mask.shape == (36, s_max)
    np.testing.assert_array_equal(mask.sum(1), [lengths[i] for i in ids])

    # one CLI train+eval cycle on the prepared store: sequence video tower
    # (transformer, consumes the ragged masks) + pooled text tower
    ckpt = tmp_path / "ckpt"
    csv = tmp_path / "metrics.csv"
    rc = train_main([
        "--steps", "2", "--metrics-csv", str(csv),
        "data.source=files",
        f"data.video_path={out / 'video_feats.npy'}",
        f"data.text_path={out / 'text_feats.npy'}",
        f"data.video_mask_path={out / 'video_mask.npy'}",
        "data.batch_size=16", "data.eval_fraction=0.25",
        "video_tower.kind=transformer", "video_tower.input_dim=8",
        "video_tower.embed_dim=16", "video_tower.hidden_dim=32",
        "video_tower.num_layers=1", "video_tower.num_heads=2",
        f"video_tower.max_seq_len={s_max}", "video_tower.dtype=float32",
        "text_tower.input_dim=6", "text_tower.embed_dim=16",
        "text_tower.hidden_dim=32", "text_tower.dtype=float32",
        "train.loss=crossclr_intra", "train.warmup_steps=1",
        f"checkpoint_dir={ckpt}", "eval_every=2", "log_every=1",
    ])
    assert rc == 0
    rows = csv.read_text().strip().splitlines()
    header = rows[0].split(",")
    assert "eval/v2t/R@1" in header and "loss" in header
    assert len(rows) >= 3  # header + 2 train steps + eval row
    assert (ckpt / "2").exists()


def test_h5_aligned_datasets(tmp_path, rng):
    """--h5 with keys resolving to aligned datasets: pooled like --npz."""
    h5py = pytest.importorskip("h5py")
    v = rng.standard_normal((10, 4, 8)).astype(np.float32)
    t = rng.standard_normal((10, 6)).astype(np.float32)
    with h5py.File(tmp_path / "f.h5", "w") as fh:
        fh["video"], fh["text"] = v, t
    out = tmp_path / "out"
    prepare_features.main(["--h5", str(tmp_path / "f.h5"),
                           "--dtype", "float32", "--out", str(out)])
    np.testing.assert_allclose(
        np.load(out / "video_feats.npy"), v.mean(axis=1), rtol=1e-6
    )
    np.testing.assert_array_equal(np.load(out / "text_feats.npy"), t)
    assert len(json.loads((out / "ids.json").read_text())) == 10


def test_h5_ragged_groups_through_cli_train(tmp_path, rng):
    """The COOT-era release layout: per-clip datasets keyed by clip id in
    two h5 FILES (--h5 + --text-h5, root groups), MISMATCHED id sets and
    ragged video lengths — through prepare_features --keep-sequence, then
    the ``files`` source through a CLI train+eval cycle."""
    h5py = pytest.importorskip("h5py")
    from crossclr_tpu.train import main as train_main

    lengths = {}
    with h5py.File(tmp_path / "vid.h5", "w") as fv:
        for i in range(24):  # video for clips 0..23
            s = int(rng.integers(2, 7))
            lengths[f"clip{i:03d}"] = s
            fv[f"clip{i:03d}"] = rng.standard_normal((s, 8)).astype(np.float32)
    with h5py.File(tmp_path / "txt.h5", "w") as ft:
        for i in range(4, 28):  # captions for clips 4..27: shared = 4..23
            ft[f"clip{i:03d}"] = rng.standard_normal(6).astype(np.float32)

    out = tmp_path / "prepared"
    prepare_features.main([
        "--h5", str(tmp_path / "vid.h5"), "--text-h5", str(tmp_path / "txt.h5"),
        "--video-key", "/", "--text-key", "/",
        "--keep-sequence", "--dtype", "float32", "--out", str(out),
    ])

    ids = json.loads((out / "ids.json").read_text())
    assert len(ids) == 20 and ids[0] == "clip004" and ids[-1] == "clip023"
    v = np.load(out / "video_feats.npy")
    mask = np.load(out / "video_mask.npy")
    s_max = max(lengths[i] for i in ids)
    assert v.shape == (20, s_max, 8) and mask.shape == (20, s_max)
    np.testing.assert_array_equal(mask.sum(1), [lengths[i] for i in ids])
    assert not (out / "text_mask.npy").exists()  # pooled 1-D text rows

    rc = train_main([
        "--steps", "2",
        "data.source=files",
        f"data.video_path={out / 'video_feats.npy'}",
        f"data.text_path={out / 'text_feats.npy'}",
        f"data.video_mask_path={out / 'video_mask.npy'}",
        "data.batch_size=8", "data.eval_fraction=0.25",
        "video_tower.kind=transformer", "video_tower.input_dim=8",
        "video_tower.embed_dim=16", "video_tower.hidden_dim=32",
        "video_tower.num_layers=1", "video_tower.num_heads=2",
        f"video_tower.max_seq_len={s_max}", "video_tower.dtype=float32",
        "text_tower.input_dim=6", "text_tower.embed_dim=16",
        "text_tower.hidden_dim=32", "text_tower.dtype=float32",
        "train.loss=crossclr_intra", "train.warmup_steps=1",
        "eval_every=2", "log_every=1",
    ])
    assert rc == 0


def test_default_store_dtype_is_bf16(tmp_path, rng):
    """r5: bfloat16 is the prepared-store default — on the measured 1-core
    host an fp32 store assembles at 723k pairs/s vs ~2M delivered compute
    and starves the chip (BASELINE.md); a user following the README must
    not build a starving store by accident.  The bf16 store must round-trip
    through the train CLI with data.features_dtype=bfloat16."""
    v = rng.standard_normal((10, 8)).astype(np.float32)
    t = rng.standard_normal((10, 6)).astype(np.float32)
    np.savez(tmp_path / "f.npz", video=v, text=t)
    out = tmp_path / "out"
    prepare_features.main(["--npz", str(tmp_path / "f.npz"), "--out", str(out)])
    got = np.load(out / "video_feats.npy")
    # bf16 payloads round-trip through np.save as raw 2-byte records
    assert got.dtype.itemsize == 2 and got.dtype.kind in ("V", "u")
    import ml_dtypes

    np.testing.assert_allclose(
        got.view(ml_dtypes.bfloat16).astype(np.float32), v,
        rtol=8e-3, atol=8e-3,
    )


def test_h5_mixed_layout_and_missing_key_rejected(tmp_path, rng):
    h5py = pytest.importorskip("h5py")
    with h5py.File(tmp_path / "f.h5", "w") as fh:
        fh["video"] = rng.standard_normal((4, 8)).astype(np.float32)
        fh["text/clip0"] = rng.standard_normal(6).astype(np.float32)
    with pytest.raises(SystemExit, match="mixed HDF5 layouts"):
        prepare_features.main(
            ["--h5", str(tmp_path / "f.h5"), "--out", str(tmp_path / "o")]
        )
    with pytest.raises(SystemExit, match="not in"):
        prepare_features.main([
            "--h5", str(tmp_path / "f.h5"), "--video-key", "nope",
            "--out", str(tmp_path / "o"),
        ])
    with pytest.raises(SystemExit, match="--text-h5 requires --h5"):
        prepare_features.main([
            "--npz", "x.npz", "--text-h5", "y.h5", "--out", str(tmp_path / "o"),
        ])


def test_int8_export_through_cli_train(tmp_path, rng):
    """prepare_features --dtype int8 → sibling *_scale.npy files → the
    ``files`` source with data.features_dtype=int8 through a CLI train+eval
    cycle (device-side dequant inside the jitted step)."""
    from crossclr_tpu.train import main as train_main

    v = rng.standard_normal((32, 8)).astype(np.float32)
    t = rng.standard_normal((32, 6)).astype(np.float32)
    np.savez(tmp_path / "f.npz", video=v, text=t)
    out = tmp_path / "out"
    prepare_features.main([
        "--npz", str(tmp_path / "f.npz"), "--dtype", "int8", "--out", str(out),
    ])

    q = np.load(out / "video_feats.npy")
    s = np.load(out / "video_feats_scale.npy")
    assert q.dtype == np.int8 and s.shape == (32,) and s.dtype == np.float32
    # dequantized payload within the per-row error bound of the source
    assert np.abs(q * s[:, None] - v).max() <= np.abs(v).max() / 254.0 + 1e-7

    rc = train_main([
        "--steps", "2",
        "data.source=files",
        f"data.video_path={out / 'video_feats.npy'}",
        f"data.text_path={out / 'text_feats.npy'}",
        "data.features_dtype=int8",
        "data.batch_size=8", "data.eval_fraction=0.25",
        "video_tower.input_dim=8", "video_tower.embed_dim=16",
        "video_tower.hidden_dim=32", "video_tower.dtype=float32",
        "text_tower.input_dim=6", "text_tower.embed_dim=16",
        "text_tower.hidden_dim=32", "text_tower.dtype=float32",
        "train.loss=crossclr_intra", "train.warmup_steps=1",
        "eval_every=2", "log_every=1",
    ])
    assert rc == 0


def test_int8_sequence_store_with_masks_through_cli(tmp_path, rng):
    """--dtype int8 composes with --keep-sequence: per-row scales cover
    the whole [S, D] row (padding zeros stay exactly zero through
    quantize/dequant), masks ride alongside, and a masked transformer
    tower trains from the int8 store via the CLI."""
    from crossclr_tpu.train import main as train_main

    vd, td = tmp_path / "v", tmp_path / "t"
    vd.mkdir(), td.mkdir()
    lengths = [3, 5, 2, 5] * 6
    for i, s_len in enumerate(lengths):
        np.save(vd / f"c{i:02d}.npy",
                rng.standard_normal((s_len, 8)).astype(np.float32))
        np.save(td / f"c{i:02d}.npy", rng.standard_normal(6).astype(np.float32))
    out = tmp_path / "out"
    prepare_features.main([
        "--video-dir", str(vd), "--text-dir", str(td),
        "--keep-sequence", "--dtype", "int8", "--out", str(out),
    ])

    q = np.load(out / "video_feats.npy")
    mask = np.load(out / "video_mask.npy")
    assert q.dtype == np.int8 and q.shape == (24, 5, 8)
    assert np.all(q[mask == 0.0] == 0)  # padding exactly zero in int8 too
    assert np.load(out / "video_feats_scale.npy").shape == (24,)

    rc = train_main([
        "--steps", "2",
        "data.source=files",
        f"data.video_path={out / 'video_feats.npy'}",
        f"data.text_path={out / 'text_feats.npy'}",
        f"data.video_mask_path={out / 'video_mask.npy'}",
        "data.features_dtype=int8",
        "data.batch_size=8", "data.eval_fraction=0.25",
        "video_tower.kind=transformer", "video_tower.input_dim=8",
        "video_tower.embed_dim=16", "video_tower.hidden_dim=32",
        "video_tower.num_layers=1", "video_tower.num_heads=2",
        "video_tower.max_seq_len=5", "video_tower.dtype=float32",
        "text_tower.input_dim=6", "text_tower.embed_dim=16",
        "text_tower.hidden_dim=32", "text_tower.dtype=float32",
        "train.loss=crossclr_intra", "train.warmup_steps=1",
        "eval_every=2", "log_every=1",
    ])
    assert rc == 0


def test_stale_ids_manifest_rejected(tmp_path, rng):
    """dataset_from_config fails at startup when ids.json disagrees with
    the feature store row count (stale manifest would otherwise cause
    IndexErrors mid-request in the serving path)."""
    import dataclasses

    import pytest

    from crossclr_tpu.data import dataset_from_config
    from crossclr_tpu.utils.config import DataConfig

    np.save(tmp_path / "video_feats.npy", rng.standard_normal((4, 8)).astype(np.float32))
    np.save(tmp_path / "text_feats.npy", rng.standard_normal((4, 6)).astype(np.float32))
    (tmp_path / "ids.json").write_text(json.dumps(["a", "b"]))  # wrong length

    cfg = DataConfig(
        source="files",
        video_path=str(tmp_path / "video_feats.npy"),
        text_path=str(tmp_path / "text_feats.npy"),
    )
    with pytest.raises(SystemExit, match="stale manifest"):
        dataset_from_config(cfg)

    (tmp_path / "ids.json").write_text(json.dumps(["a", "b", "c", "d"]))
    ds, ids = dataset_from_config(cfg)
    assert len(ds) == 4 and ids == ["a", "b", "c", "d"]
    assert dataclasses.is_dataclass(cfg)
