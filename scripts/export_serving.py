#!/usr/bin/env python
"""Export an AOT serving artifact: ``python scripts/export_serving.py``.

Builds the same service ``python -m crossclr_tpu.serve`` would (config +
checkpoint + encoded or precomputed corpus index), then serializes its
fused query→top-k computation — tower parameters and index baked in —
into one ``.npz`` via ``jax.export`` (see ``crossclr_tpu/aot.py``).
A consumer loads it with ``crossclr_tpu.aot.SearchArtifact.load(path)``
needing only jax + numpy: no config, checkpoint, or model code.

Example:
  python scripts/export_serving.py --config cfg.json \\
      --checkpoint-dir ckpts --corpus video --k 16 \\
      --platforms tpu,cpu --output search_artifact.npz
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None) -> int:
    from crossclr_tpu.aot import export_search, save_artifact
    from crossclr_tpu.serve import build_service
    from crossclr_tpu.utils.config import (
        ExperimentConfig,
        apply_overrides,
        load_config,
    )

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=None)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--corpus", choices=("video", "text"), default="video")
    ap.add_argument("--k", type=int, default=16,
                    help="top-k baked into the artifact (requests may ask "
                    "for any smaller k)")
    ap.add_argument("--output", required=True, help="artifact .npz path")
    ap.add_argument("--corpus-emb", default=None,
                    help="precomputed index .npz (eval --embeddings-output)")
    ap.add_argument("--corpus-dtype",
                    choices=("float32", "bfloat16", "int8"),
                    default="float32")
    ap.add_argument("--ema", action="store_true")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--platforms", default=None,
                    help="comma-separated lowering targets, e.g. tpu,cpu "
                    "(default: the current backend)")
    ap.add_argument("--query-shape", default=None,
                    help="per-query trailing feature shape: D for pooled "
                    "(the default, from the query tower's input_dim) or "
                    "S,D for sequence queries (adds a [b, S] mask to the "
                    "artifact signature)")
    ap.add_argument("--random-params", action="store_true")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)

    cfg = load_config(args.config) if args.config else ExperimentConfig()
    if args.overrides:
        cfg = apply_overrides(cfg, args.overrides)

    service = build_service(
        cfg,
        args.checkpoint_dir or cfg.checkpoint_dir,
        args.corpus,
        batch_size=args.batch_size,
        random_params=args.random_params,
        corpus_emb_path=args.corpus_emb,
        use_ema=args.ema,
        corpus_dtype=args.corpus_dtype,
    )
    if service.index_stale or service.index_tower_mismatch:
        raise SystemExit(
            "refusing to export: the corpus index disagrees with the query "
            "tower (see the warnings above) — re-export the index first"
        )
    platforms = (
        tuple(args.platforms.split(",")) if args.platforms else None
    )
    query_shape = (
        tuple(int(d) for d in args.query_shape.split(","))
        if args.query_shape else None
    )
    blob, meta, corpus = export_search(
        service, k=args.k, platforms=platforms, query_shape=query_shape
    )
    save_artifact(args.output, blob, meta, corpus, ids=service.ids)
    print(
        f"wrote {args.output}: k={meta['k']}, {meta['corpus_rows']} "
        f"{meta['corpus_side']} rows ({meta['index_dtype']} index), "
        f"queries={meta['query_side']}, platforms={meta['platforms']}, "
        f"step={meta['step']}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
