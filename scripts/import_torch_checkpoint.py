"""Import a PyTorch dual-tower checkpoint into a crossclr_tpu run directory.

The migration on-ramp for users of the PyTorch reference
(/root/reference/trainer/loss.py): take the torch ``state_dict``s of
their video/text towers (and optionally the reference criterion's
``logit_scale``, loss.py:52), convert the layouts
(utils.torch_import), and write a step-0 Orbax checkpoint that
``python -m crossclr_tpu.eval`` / ``serve`` / ``train --resume`` load
directly.

The torch file may be:
* a flat ``state_dict`` whose keys carry tower prefixes
  (``--video-prefix`` / ``--text-prefix``, stripped before matching), or
* a dict of dicts (e.g. ``{"video": sd, "text": sd, "criterion": sd}``)
  — select with ``--video-key`` / ``--text-key`` / ``--criterion-key``.

Usage:
  python scripts/import_torch_checkpoint.py --config cfg.json \\
      --torch-ckpt towers.pt --output ckpt_dir \\
      [--video-prefix video_tower.] [--text-prefix text_tower.] \\
      [--criterion-prefix criterion.] [--no-strict]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _sub_dict(sd: dict, prefix: str) -> dict:
    """Entries under ``prefix``, with the prefix stripped."""
    out = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    if not out:
        raise SystemExit(
            f"no keys under prefix {prefix!r} (state_dict has "
            f"{sorted(sd)[:20]})"
        )
    return out


def main(argv=None) -> int:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from crossclr_tpu.training import CheckpointManager, Trainer
    from crossclr_tpu.utils.config import (
        ExperimentConfig, apply_overrides, load_config,
    )
    from crossclr_tpu.utils.torch_import import dual_encoder_params_from_torch

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=None, help="ExperimentConfig JSON")
    ap.add_argument("--torch-ckpt", required=True, help=".pt file (torch.save)")
    ap.add_argument("--output", required=True, help="Orbax checkpoint dir")
    ap.add_argument("--video-prefix", default="video_tower.")
    ap.add_argument("--text-prefix", default="text_tower.")
    ap.add_argument("--criterion-prefix", default=None,
                    help="prefix of the reference criterion's state "
                    "(imports logit_scale); omit to keep the vestigial init")
    ap.add_argument("--video-key", default=None,
                    help="nested-dict key holding the video state_dict")
    ap.add_argument("--text-key", default=None)
    ap.add_argument("--criterion-key", default=None)
    ap.add_argument("--no-strict", action="store_true",
                    help="ignore torch entries that match no Flax param")
    ap.add_argument("overrides", nargs="*", help="section.key=value overrides")
    args = ap.parse_args(argv)

    import torch

    cfg = load_config(args.config) if args.config else ExperimentConfig()
    if args.overrides:
        cfg = apply_overrides(cfg, args.overrides)

    blob = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
    if hasattr(blob, "state_dict"):
        blob = blob.state_dict()
    if args.video_key or args.text_key:
        if not (args.video_key and args.text_key):
            raise SystemExit("--video-key and --text-key go together")
        video_sd, text_sd = blob[args.video_key], blob[args.text_key]
    else:
        video_sd = _sub_dict(blob, args.video_prefix)
        text_sd = _sub_dict(blob, args.text_prefix)
    # the criterion selector is independent of the tower mode: a flat
    # prefixed checkpoint may still nest the criterion under a key
    if args.criterion_key and args.criterion_prefix:
        raise SystemExit(
            "pass --criterion-key OR --criterion-prefix, not both"
        )
    if args.criterion_key:
        if args.criterion_key not in blob:
            raise SystemExit(
                f"--criterion-key {args.criterion_key!r} not in the "
                f"checkpoint (top-level keys: {sorted(blob)[:20]})"
            )
        crit_sd = blob[args.criterion_key]
    elif args.criterion_prefix:
        crit_sd = _sub_dict(blob, args.criterion_prefix)
    else:
        crit_sd = None

    # template state from the tower configs alone — a pure weight
    # conversion must not require the training data on disk; only the
    # input SHAPES matter (transformer pos_embed is sized by
    # TowerConfig.max_seq_len, not the example length)
    def _example(tower_cfg, seq_len):
        if getattr(tower_cfg, "kind", "mlp") == "transformer":
            s = min(seq_len or tower_cfg.max_seq_len, tower_cfg.max_seq_len)
            return jnp.zeros((2, s, tower_cfg.input_dim), jnp.float32)
        return jnp.zeros((2, tower_cfg.input_dim), jnp.float32)

    trainer = Trainer(cfg.video_tower, cfg.text_tower, cfg.train)
    state = trainer.init_state(
        _example(cfg.video_tower, getattr(cfg.data, "video_seq_len", None)),
        _example(cfg.text_tower, getattr(cfg.data, "text_seq_len", None)),
    )

    params = dual_encoder_params_from_torch(
        state.params, video_sd, text_sd, crit_sd, strict=not args.no_strict,
    )
    state = state.replace(params=params)
    if state.ema_params is not None:
        # imported weights ARE the history: start the average there
        state = state.replace(ema_params=jax.tree.map(jnp.copy, params))

    mgr = CheckpointManager(args.output)
    mgr.save(0, state, wait=True)
    mgr.close()
    n = sum(np.prod(v.shape) for v in jax.tree_util.tree_leaves(params))
    print(f"imported {int(n)} parameters -> {args.output} (step 0)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
