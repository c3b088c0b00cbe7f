"""Feature-preparation tool tests."""

import json
import pickle

import numpy as np

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
    prepare_features.main(["--npz", str(tmp_path / "f.npz"), "--out", str(out)])
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
    prepare_features.main(["--pickle", str(tmp_path / "f.pkl"), "--out", str(out)])
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
        ["--video-dir", str(vd), "--text-dir", str(td), "--out", str(out)]
    )
    from crossclr_tpu.data import FeaturePairDataset

    ds = FeaturePairDataset(out / "video_feats.npy", out / "text_feats.npy")
    assert len(ds) == 5
    assert ds.video.shape == (5, 8) and ds.text.shape == (5, 6)
