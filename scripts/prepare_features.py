"""Convert pre-extracted clip/caption feature archives into the framework's
aligned ``.npy`` pair format (see crossclr_tpu.data.FeaturePairDataset).

The CrossCLR paper trains on pre-extracted features (YouCook2, LSMDC);
distribution of those archives varies (npz bundles, per-clip .npy dirs,
pickled dicts).  This tool normalizes any of them into two row-aligned
arrays plus an id manifest:

    <out>/video_feats.npy   [N, Dv] float32
    <out>/text_feats.npy    [N, Dt] float32
    <out>/ids.json          N clip ids, row-aligned

Usage:
  python scripts/prepare_features.py --npz feats.npz \\
      --video-key video --text-key text --out data/youcook2
  python scripts/prepare_features.py --video-dir vids/ --text-dir caps/ \\
      --out data/lsmdc       # matches basenames, sorts, aligns
  python scripts/prepare_features.py --pickle feats.pkl \\
      --video-key vid_feats --text-key txt_feats --out data/x
  python scripts/prepare_features.py --h5 feats.h5 \\
      --video-key video --text-key text --out data/youcook2
  python scripts/prepare_features.py --h5 video.h5 --text-h5 text.h5 \\
      --video-key / --text-key / --out data/lsmdc

HDF5 keys may point at an aligned dataset ([N, D] / [N, S, D]) or at a
GROUP of per-clip datasets keyed by clip id (the COOT-era YouCook2/LSMDC
release layout); per-clip groups in the two modalities are intersected
on id and sorted, exactly like --pickle dicts and --video-dir pairing.
Pass ``/`` as the key to use a file's root group.

Sequence features ([N, S, D]) are mean-pooled unless --keep-sequence.
"""

from __future__ import annotations

import argparse
import json
import pickle
from pathlib import Path

import numpy as np


def _pool(x: np.ndarray, keep_sequence: bool) -> np.ndarray:
    x = np.asarray(x, dtype=np.float32)
    if x.ndim == 3 and not keep_sequence:
        return x.mean(axis=1)
    return x


def _pad_stack(arrs, keep_sequence):
    """Stack per-clip features; ragged ``[S_i, D]`` sequences under
    --keep-sequence are zero-padded to the max length with a ``[N, S]``
    key-padding mask (1 = valid) emitted alongside.  Returns
    ``(array, mask_or_None)`` — the mask is None for pooled features and
    for uniform-length sequences (all-ones would be redundant)."""
    arrs = [np.asarray(a, dtype=np.float32) for a in arrs]
    if not keep_sequence or arrs[0].ndim == 1:
        return (
            np.stack([_pool(a, keep_sequence) for a in arrs]).astype(np.float32),
            None,
        )
    s_max = max(a.shape[0] for a in arrs)
    d = arrs[0].shape[1]
    out = np.zeros((len(arrs), s_max, d), np.float32)
    mask = np.zeros((len(arrs), s_max), np.float32)
    for i, a in enumerate(arrs):
        out[i, : a.shape[0]] = a
        mask[i, : a.shape[0]] = 1.0
    return out, (None if bool((mask == 1.0).all()) else mask)


def _from_npz(path, video_key, text_key, keep_sequence):
    with np.load(path, allow_pickle=True) as z:
        return (
            _pool(z[video_key], keep_sequence),
            None,
            _pool(z[text_key], keep_sequence),
            None,
            [str(i) for i in range(z[video_key].shape[0])],
        )


def _from_pickle(path, video_key, text_key, keep_sequence):
    with open(path, "rb") as fh:
        obj = pickle.load(fh)
    video, text = obj[video_key], obj[text_key]
    if isinstance(video, dict):
        ids = sorted(set(video) & set(text))
        v, vm = _pad_stack([video[i] for i in ids], keep_sequence)
        t, tm = _pad_stack([text[i] for i in ids], keep_sequence)
        return v, vm, t, tm, list(map(str, ids))
    return (
        _pool(video, keep_sequence),
        None,
        _pool(text, keep_sequence),
        None,
        [str(i) for i in range(len(video))],
    )


def _h5_node(fh, key, path):
    """Resolve ``key`` inside an open h5py file; '/' means the root."""
    if key in ("/", ""):
        return fh
    try:
        return fh[key]
    except KeyError:
        raise SystemExit(
            f"key {key!r} not in {path} (top-level keys: "
            f"{sorted(fh.keys())})"
        ) from None


def _from_h5(video_path, text_path, video_key, text_key, keep_sequence):
    """HDF5 archives: one file with two keys, or two files (--text-h5).

    Each key may resolve to a Dataset (row-aligned arrays) or a Group of
    per-clip datasets keyed by clip id (ids intersected + sorted across
    the modalities, like --pickle dict stores).
    """
    try:
        import h5py
    except ImportError:
        raise SystemExit(
            "--h5 requires the h5py package, which is not installed"
        ) from None

    with h5py.File(video_path, "r") as fv:
        ft_ctx = h5py.File(text_path, "r") if text_path else fv
        try:
            v_node = _h5_node(fv, video_key, video_path)
            t_node = _h5_node(ft_ctx, text_key, text_path or video_path)
            v_group = isinstance(v_node, (h5py.Group, h5py.File))
            t_group = isinstance(t_node, (h5py.Group, h5py.File))
            if v_group != t_group:
                raise SystemExit(
                    f"mixed HDF5 layouts: {video_key!r} is a "
                    f"{'group' if v_group else 'dataset'} but {text_key!r} "
                    f"is a {'group' if t_group else 'dataset'} — both keys "
                    "must be per-clip groups or both aligned datasets"
                )
            if v_group:
                ids = sorted(set(v_node) & set(t_node))
                if not ids:
                    raise SystemExit(
                        f"no clip ids shared between {video_key!r} and "
                        f"{text_key!r}"
                    )
                v, vm = _pad_stack([v_node[i][()] for i in ids], keep_sequence)
                t, tm = _pad_stack([t_node[i][()] for i in ids], keep_sequence)
                return v, vm, t, tm, list(map(str, ids))
            v = _pool(v_node[()], keep_sequence)
            t = _pool(t_node[()], keep_sequence)
            return v, None, t, None, [str(i) for i in range(v.shape[0])]
        finally:
            if ft_ctx is not fv:
                ft_ctx.close()


def _from_dirs(video_dir, text_dir, keep_sequence):
    vd, td = Path(video_dir), Path(text_dir)
    v_files = {p.stem: p for p in vd.glob("*.npy")}
    t_files = {p.stem: p for p in td.glob("*.npy")}
    ids = sorted(set(v_files) & set(t_files))
    if not ids:
        raise SystemExit("no matching basenames between the two directories")
    v, vm = _pad_stack([np.load(v_files[i]) for i in ids], keep_sequence)
    t, tm = _pad_stack([np.load(t_files[i]) for i in ids], keep_sequence)
    return v, vm, t, tm, ids


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--npz")
    src.add_argument("--pickle")
    src.add_argument("--video-dir")
    src.add_argument("--h5", help="HDF5 archive (see module docstring)")
    ap.add_argument(
        "--text-h5",
        help="separate HDF5 file for --text-key when the modalities ship "
        "in two archives (requires --h5)",
    )
    ap.add_argument("--text-dir")
    ap.add_argument("--video-key", default="video")
    ap.add_argument("--text-key", default="text")
    ap.add_argument("--keep-sequence", action="store_true")
    ap.add_argument(
        "--dtype",
        choices=("float32", "bfloat16", "int8"),
        default="bfloat16",
        help="feature storage dtype (set data.features_dtype to match). "
        "Default bfloat16: halves disk/gather/H2D bytes vs float32 and is "
        "value-identical for bf16 towers — on the measured 1-core host an "
        "fp32 store assembles at 723k pairs/s vs a ~2M pairs/s device "
        "rate and STARVES the chip, while bf16/int8 keep up "
        "(BASELINE.md, host input pipeline).  int8 quarters the bytes "
        "with per-row scales in sibling *_scale.npy files, dequantized "
        "on device (see data.quantize).  float32 is for towers that "
        "genuinely need fp32 inputs; the trainer prints a throughput "
        "warning when it detects an fp32 store.",
    )
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    if args.text_h5 and not args.h5:
        raise SystemExit("--text-h5 requires --h5")
    if args.npz:
        v, vm, t, tm, ids = _from_npz(
            args.npz, args.video_key, args.text_key, args.keep_sequence
        )
    elif args.h5:
        v, vm, t, tm, ids = _from_h5(
            args.h5, args.text_h5, args.video_key, args.text_key,
            args.keep_sequence,
        )
    elif args.pickle:
        v, vm, t, tm, ids = _from_pickle(
            args.pickle, args.video_key, args.text_key, args.keep_sequence
        )
    else:
        if not args.text_dir:
            raise SystemExit("--video-dir requires --text-dir")
        v, vm, t, tm, ids = _from_dirs(
            args.video_dir, args.text_dir, args.keep_sequence
        )

    if v.shape[0] != t.shape[0]:
        raise SystemExit(f"row mismatch: {v.shape[0]} video vs {t.shape[0]} text")
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    for feats, name in ((v, "video_feats"), (t, "text_feats")):
        if args.dtype == "bfloat16":
            from crossclr_tpu.data.native_io import f32_to_bf16

            feats = f32_to_bf16(feats)
        elif args.dtype == "int8":
            from crossclr_tpu.data.quantize import quantize_features

            feats, scale = quantize_features(feats)
            np.save(out / f"{name}_scale.npy", scale)
        np.save(out / f"{name}.npy", feats)
    for mask, name in ((vm, "video_mask.npy"), (tm, "text_mask.npy")):
        if mask is not None:
            np.save(out / name, mask)
    (out / "ids.json").write_text(json.dumps(ids))
    masked = [n for m, n in ((vm, "video"), (tm, "text")) if m is not None]
    note = f" (+ {'/'.join(masked)} masks)" if masked else ""
    tag = "" if args.dtype == "float32" else f" [{args.dtype}]"
    print(f"wrote {v.shape} video / {t.shape} text features to {out}{note}{tag}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
