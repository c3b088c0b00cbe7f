"""CLI retrieval evaluation / serving: ``python -m crossclr_tpu.eval``.

The offline counterpart of ``crossclr_tpu.train``: load a trained
checkpoint, encode a corpus with the dual towers, report bidirectional
retrieval metrics (R@K / MdR / MnR — the paper's protocol, README.md:7),
and optionally dump top-k retrievals for serving.  The reference ships
neither an evaluator nor a serving path (SURVEY.md §1: only the loss
exists); this completes the pipeline a reference user has to hand-write.

Examples:
  python -m crossclr_tpu.eval --config cfg.json            # held-out split
  python -m crossclr_tpu.eval --config cfg.json --split all
  python -m crossclr_tpu.eval --config cfg.json --topk 10 \\
      --topk-queries text --topk-output retrievals.npz
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp


def _encode_split(trainer, state, data, batch_size: int):
    """Encode every row of ``data`` in aligned batches -> (v_emb, t_emb)."""
    from .data import epoch_batches

    replicate = None
    if jax.process_count() > 1 and trainer.mesh is not None:
        # multi-host: Trainer.encode returns embeddings sharded over the
        # global mesh; np.asarray on a non-fully-addressable jax.Array
        # raises.  Replicate first — a fully-replicated array is fetchable
        # on every host (each host's local shard IS the full value).
        from jax.sharding import NamedSharding, PartitionSpec as P

        replicate = jax.jit(
            lambda a: a,
            out_shardings=NamedSharding(trainer.mesh, P()),
        )

    v_parts, t_parts = [], []
    for batch in epoch_batches(
        data, batch_size, shuffle=False, drop_remainder=False
    ):
        v, t = trainer.encode(state, batch)
        if replicate is not None:
            v, t = replicate(v), replicate(t)
        v_parts.append(np.asarray(v))
        t_parts.append(np.asarray(t))
    return np.concatenate(v_parts, axis=0), np.concatenate(t_parts, axis=0)


def main(argv: list[str] | None = None) -> int:
    from .data import dataset_from_config, epoch_batches, train_eval_split
    from .evaluation import retrieval_metrics, retrieve_topk
    from .parallel import initialize_multihost, make_mesh
    from .training import CheckpointManager, Trainer
    from .utils.config import ExperimentConfig, apply_overrides, load_config

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=None, help="ExperimentConfig JSON path")
    ap.add_argument(
        "--checkpoint-dir",
        default=None,
        help="override config.checkpoint_dir (required via one or the other "
        "unless --random-params)",
    )
    ap.add_argument("--step", type=int, default=None, help="checkpoint step (default: latest)")
    ap.add_argument(
        "--split",
        choices=("eval", "all"),
        default="eval",
        help="'eval' = the same held-out rows train.py excludes from the "
        "train stream; 'all' = the full dataset",
    )
    ap.add_argument("--batch-size", type=int, default=None,
                    help="encode batch size (default: data.batch_size)")
    ap.add_argument("--ks", default="1,5,10", help="comma-separated recall cutoffs")
    ap.add_argument("--topk", type=int, default=None,
                    help="also dump top-k retrievals per query")
    ap.add_argument(
        "--topk-queries",
        choices=("video", "text"),
        default="text",
        help="query modality for --topk (text = t2v retrieval)",
    )
    ap.add_argument("--topk-output", default=None, help=".npz path for --topk")
    ap.add_argument(
        "--embeddings-output",
        default=None,
        help=".npz path for the encoded split's embeddings (keys: video, "
        "text, ids, step, split) — feed it to `serve --corpus-emb` to "
        "start the service without re-encoding the corpus",
    )
    ap.add_argument("--output", default=None, help="write metrics JSON here too")
    ap.add_argument(
        "--ema",
        action="store_true",
        help="encode with the EMA parameters (requires train.ema_decay in "
        "the config so the checkpoint carries the EMA tree)",
    )
    ap.add_argument(
        "--random-params",
        action="store_true",
        help="skip checkpoint restore (smoke tests / baselines)",
    )
    ap.add_argument("overrides", nargs="*", help="section.key=value overrides")
    args = ap.parse_args(argv)

    cfg = load_config(args.config) if args.config else ExperimentConfig()
    if args.overrides:
        cfg = apply_overrides(cfg, args.overrides)

    initialize_multihost()

    dataset, ids = dataset_from_config(cfg.data)

    if args.split == "eval" and cfg.data.eval_fraction > 0:
        # identical split arithmetic to train.py so these are exactly the
        # rows the training stream never saw (eval_fraction=0 disables the
        # holdout in train.py, so 'eval' degrades to the full dataset)
        n_eval = max(int(len(dataset) * cfg.data.eval_fraction), 1)
        if n_eval >= len(dataset):
            raise SystemExit(
                f"data.eval_fraction {cfg.data.eval_fraction} leaves no "
                f"train rows (dataset has {len(dataset)})"
            )
        _, data = train_eval_split(dataset, n_eval)
        if ids is not None:
            ids = ids[:n_eval]  # eval = the FIRST n_eval rows (RowSubset)
    else:
        data = dataset

    mesh = make_mesh() if len(jax.devices()) > 1 else None
    trainer = Trainer(cfg.video_tower, cfg.text_tower, cfg.train, mesh=mesh)

    batch_size = args.batch_size or min(cfg.data.batch_size, len(data))
    first = next(epoch_batches(data, min(batch_size, len(data)), shuffle=False))
    state = trainer.init_state(first["video"], first["text"])

    ckpt_dir = args.checkpoint_dir or cfg.checkpoint_dir
    if not args.random_params:
        if not ckpt_dir:
            raise SystemExit(
                "no checkpoint: pass --checkpoint-dir / set "
                "checkpoint_dir in the config, or use --random-params"
            )
        state = CheckpointManager(ckpt_dir).restore(state, step=args.step)
    if args.ema:
        state = trainer.ema_state(state)

    v_emb, t_emb = _encode_split(trainer, state, data, batch_size)

    ks = tuple(int(k) for k in args.ks.split(","))
    # with a mesh, rank with the corpus side sharded over the data axis
    # (per-device: [chunk, N/n_dev] scores — eval scales with the slice)
    metrics = retrieval_metrics(
        jnp.asarray(v_emb), jnp.asarray(t_emb), ks=ks, mesh=mesh
    )
    metrics.update(
        {"split": args.split, "rows": int(v_emb.shape[0]),
         "step": int(state.step)}
    )
    if args.ema:
        metrics["ema"] = True

    is_rank0 = jax.process_index() == 0
    line = json.dumps(metrics)
    if is_rank0:
        print(line)
        if args.output:
            with open(args.output, "w") as f:
                f.write(line + "\n")

    if args.embeddings_output and is_rank0:
        np.savez(
            args.embeddings_output,
            video=v_emb,
            text=t_emb,
            ids=np.asarray(ids if ids is not None else [], dtype=str),
            step=int(state.step),
            split=args.split,
            # which tower flavor encoded this dump — serve compares it
            # against its own --ema flag so an EMA/live tower-vs-index
            # mismatch is flagged, not silently served
            ema=bool(args.ema),
        )
        print(
            f"wrote {v_emb.shape[0]} x {v_emb.shape[1]} embeddings "
            f"(both modalities) to {args.embeddings_output}",
            file=sys.stderr,
        )

    if args.topk is not None:
        q, c = (
            (t_emb, v_emb) if args.topk_queries == "text" else (v_emb, t_emb)
        )
        scores, idx = retrieve_topk(
            jnp.asarray(q), jnp.asarray(c), k=args.topk
        )
        if is_rank0 and args.topk_output:
            np.savez(
                args.topk_output,
                scores=np.asarray(scores),
                indices=np.asarray(idx),
                queries=args.topk_queries,
            )
            print(
                f"wrote top-{int(scores.shape[1])} retrievals for "
                f"{int(scores.shape[0])} {args.topk_queries} queries to "
                f"{args.topk_output}",
                file=sys.stderr,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
