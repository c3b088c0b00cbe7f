"""CLI training entry point: ``python -m crossclr_tpu.train [options]``.

The reference has no CLI (SURVEY.md §1); this drives the full pipeline:
data → dual encoders → CrossCLR loss (local or global negatives) → AdamW
→ retrieval eval → Orbax checkpoints, from an ExperimentConfig JSON plus
``section.key=value`` overrides.

Examples:
  python -m crossclr_tpu.train --steps 500
  python -m crossclr_tpu.train --config configs/youcook2.json \\
      train.loss=crossclr_intra_fused data.batch_size=4096
"""

from __future__ import annotations

import argparse
import dataclasses
import signal
import sys

import jax


def main(argv: list[str] | None = None) -> int:
    from .data import (
        HostShard,
        dataset_from_config,
        epoch_batches,
        infinite_batches,
        prefetch_to_device,
        train_eval_split,
    )
    from .eval import _encode_split
    from .evaluation import retrieval_metrics
    from .parallel import (
        data_sharding,
        host_local_batch_size,
        initialize_multihost,
        make_mesh,
    )
    from .training import CheckpointManager, Trainer
    from .utils import MetricsWriter
    from .utils.config import ExperimentConfig, apply_overrides, load_config, save_config

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=None, help="ExperimentConfig JSON path")
    ap.add_argument("--steps", type=int, default=None, help="override total steps")
    ap.add_argument(
        "--stop-after",
        type=int,
        default=None,
        help="run at most this many steps THIS invocation, then checkpoint "
        "and exit cleanly; unlike --steps the LR schedule keeps "
        "train.total_steps as its horizon, so a later resume continues "
        "the same schedule (bounded time slices / preemption rehearsal)",
    )
    ap.add_argument("--metrics-csv", default=None)
    ap.add_argument(
        "--tensorboard-dir",
        default=None,
        help="also stream scalar metrics to TensorBoard event files here",
    )
    ap.add_argument(
        "--n-model",
        type=int,
        default=1,
        help="mesh model-axis size (tensor parallelism); data axis gets the rest",
    )
    ap.add_argument(
        "--mesh-dcn",
        default="auto",
        help="DCN granule count for multi-slice pods: 'auto' detects "
        "slices from the devices, an integer forces it (model axis stays "
        "inside a slice's ICI; only the data axis crosses DCN)",
    )
    ap.add_argument(
        "--mesh-granule",
        choices=("slice", "process"),
        default="slice",
        help="what counts as a DCN granule ('process' for platforms "
        "without slice_index, and CPU multi-process tests)",
    )
    ap.add_argument("--save-config", default=None, help="dump resolved config and exit")
    ap.add_argument(
        "--profile-dir",
        default=None,
        help="capture a jax.profiler device trace of the first train chunk "
        "into this directory (view in TensorBoard/XProf)",
    )
    ap.add_argument("overrides", nargs="*", help="section.key=value overrides")
    args = ap.parse_args(argv)

    cfg = load_config(args.config) if args.config else ExperimentConfig()
    if args.overrides:
        cfg = apply_overrides(cfg, args.overrides)
    if cfg.train.eval_with_ema and cfg.train.ema_decay is None:
        raise SystemExit(
            "train.eval_with_ema requires train.ema_decay (the state "
            "carries no EMA tree to evaluate with)"
        )
    if args.steps is not None:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, total_steps=args.steps)
        )
    if args.save_config:
        save_config(cfg, args.save_config)
        print(f"wrote {args.save_config}")
        return 0

    # multi-host: connect processes before any device use (no-op single host)
    initialize_multihost()

    # -- data ---------------------------------------------------------------
    dataset, _ = dataset_from_config(cfg.data)

    # held-out eval split: eval/R@K must measure retrieval on UNSEEN pairs,
    # so the eval rows are excluded from the train stream entirely.
    # eval_fraction=0 disables the holdout: trains on every row and
    # evaluates on the train rows (a memorization diagnostic, not
    # retrieval quality — stated on stderr so nobody mistakes the number)
    if cfg.data.eval_fraction > 0:
        n_eval = max(int(len(dataset) * cfg.data.eval_fraction), 1)
        if n_eval >= len(dataset):
            raise SystemExit(
                f"data.eval_fraction {cfg.data.eval_fraction} leaves no train "
                f"rows (dataset has {len(dataset)})"
            )
        train_data, eval_data = train_eval_split(dataset, n_eval)
    else:
        train_data = eval_data = dataset
        if jax.process_index() == 0:
            print(
                "data.eval_fraction=0: no held-out split; eval/R@K measures "
                "memorization of training rows",
                file=sys.stderr,
            )

    # -- mesh / trainer -----------------------------------------------------
    mesh = (
        make_mesh(
            n_model=args.n_model,
            dcn=args.mesh_dcn if args.mesh_dcn == "auto" else int(args.mesh_dcn),
            granule=args.mesh_granule,
        )
        if len(jax.devices()) > 1
        else None
    )
    trainer = Trainer(cfg.video_tower, cfg.text_tower, cfg.train, mesh=mesh)

    # multi-host: each process loads a disjoint row shard and a per-host
    # slice of the global batch; single host: identity
    local_batch = host_local_batch_size(cfg.data.batch_size)
    if jax.process_count() > 1:
        host_data = HostShard(
            train_data, jax.process_index(), jax.process_count()
        )
    else:
        host_data = train_data

    if len(host_data) < local_batch:
        raise SystemExit(
            f"host shard has {len(host_data)} rows < host-local batch "
            f"{local_batch}; shrink data.batch_size or the host count"
        )

    first = next(epoch_batches(host_data, local_batch, shuffle=False))
    state = trainer.init_state(first["video"], first["text"])

    ckpt = CheckpointManager(cfg.checkpoint_dir) if cfg.checkpoint_dir else None
    # model selection: a SEPARATE ranked manager under <dir>/best (ranked
    # garbage collection may delete the latest step — never mix it with
    # the resume checkpoints above).  Point eval/serve's --checkpoint-dir
    # at <dir>/best to use the selected model.
    best_ckpt = None
    if ckpt is not None and cfg.train.keep_best_metric:
        from pathlib import Path as _Path

        best_ckpt = CheckpointManager(
            _Path(cfg.checkpoint_dir) / "best",
            max_to_keep=1,
            best_metric=cfg.train.keep_best_metric,
        )
    is_rank0 = jax.process_index() == 0
    if ckpt is not None and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        if is_rank0:
            print(f"resumed from step {int(state.step)}", file=sys.stderr)

    # metrics are replicated scalars: only rank 0 writes/echoes, or every
    # host would clobber the same CSV path on a shared filesystem
    writer = MetricsWriter(
        args.metrics_csv if is_rank0 else None,
        echo=is_rank0,
        tensorboard_dir=args.tensorboard_dir if is_rank0 else None,
    )
    sharding = data_sharding(mesh) if mesh is not None else None

    # preemption tolerance: TPU pods deliver SIGTERM with a grace window.
    # The handler only sets a flag; fit() polls it before each dispatch
    # (every train.steps_per_call steps), so we exit at a step boundary
    # with a final checkpoint instead of dying mid-step (deterministic
    # data order + the saved step make the resumed run continue the exact
    # batch sequence).
    stop_requested = {"flag": False}

    def _on_signal(signum, frame):
        stop_requested["flag"] = True
        if is_rank0:
            print(
                f"signal {signum}: stopping at the next step boundary "
                "(checkpoint + clean exit)",
                file=sys.stderr,
            )

    prev_handlers = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _on_signal)
        except ValueError:  # non-main thread (tests): leave handlers alone
            pass

    # -- train --------------------------------------------------------------
    steps = cfg.train.total_steps
    done = int(state.step)
    if args.stop_after is not None:
        # bounded invocation: stop (and checkpoint, below) after N more
        # steps while the schedule keeps total_steps as its horizon
        steps = min(steps, done + args.stop_after)
    # the data stream fast-forwards to the restored step so a resumed run
    # continues the exact batch sequence; async H2D with 2 batches in
    # flight overlaps assembly/transfer with the running step
    # steps_per_call: stack chunks on the HOST before prefetch, so each
    # dispatch gets one [n, b, ...] transfer and — multi-host — the
    # stacked local shards stitch into one global chunk.  Alignment
    # constraint: every fit() call below runs `eval_every` steps (or the
    # final tail), so eval_every must be a chunk multiple or the stream
    # would mis-align across eval boundaries (fit discards chunk tails
    # only at the END of training, where nothing resumes mid-config).
    spc = cfg.train.steps_per_call
    prestacked = spc > 1
    if prestacked and cfg.eval_every % spc != 0:
        if is_rank0:
            print(
                f"train.steps_per_call={spc} does not divide "
                f"eval_every={cfg.eval_every}; host-side chunk "
                "pre-stacking disabled (single-host runs still scan "
                f"{spc} steps per dispatch via fit's own stacking; "
                "multi-host falls back to per-step dispatches)",
                file=sys.stderr,
            )
        prestacked = False
    if prestacked:
        from .data import stacked_chunks
        from jax.sharding import NamedSharding, PartitionSpec

        # same batch stream as stack_batches(infinite_batches(...), spc),
        # but each chunk is assembled with ONE multithreaded gather per
        # modality instead of spc gathers + an np.stack re-copy
        # ring of 4 destination buffers: the pipeline holds at most 3
        # chunks (prefetch queue + in-assembly + in-transfer), and fresh
        # chunk-sized allocations re-fault every page (~6x slower steady
        # state, scripts/bench_input_pipeline.py)
        batches = stacked_chunks(
            host_data, local_batch, spc, seed=cfg.data.seed, start_step=done,
            reuse_buffers=4,
        )
        if sharding is not None:
            # batch axis moves to dim 1 of the stacked chunk
            sharding = NamedSharding(
                sharding.mesh, PartitionSpec(None, *sharding.spec)
            )
    else:
        batches = infinite_batches(
            host_data, local_batch, seed=cfg.data.seed, start_step=done
        )
    # each resident chunk costs steps_per_call x the batch footprint, so
    # the stacked path keeps one chunk in flight instead of two
    it = prefetch_to_device(
        batches, size=1 if prestacked else 2, sharding=sharding
    )
    try:
        first_chunk = True
        while done < steps:
            chunk = min(cfg.eval_every, steps - done)
            if args.profile_dir and first_chunk:
                # device trace of the first chunk only: compilation + the
                # steady-state steps, bounded file size
                from .utils.profiling import trace as profiler_trace

                profile_cm = profiler_trace(args.profile_dir)
            else:
                import contextlib

                profile_cm = contextlib.nullcontext()
            with profile_cm:
                try:
                    state, history = trainer.fit(
                        state, it, steps=chunk, log_every=cfg.log_every,
                        writer=writer,
                        should_stop=lambda: stop_requested["flag"],
                        prestacked=prestacked,
                    )
                except FloatingPointError as e:
                    # poisoned state: do NOT checkpoint it — the last good
                    # checkpoint on disk is the recovery point
                    raise SystemExit(f"aborted: {e}") from e
            if args.profile_dir and first_chunk and is_rank0:
                print(f"profiler trace written to {args.profile_dir}",
                      file=sys.stderr)
            first_chunk = False
            done = int(state.step)
            if stop_requested["flag"]:
                # a regular save (or the restore we resumed from) may
                # already hold this exact step — Orbax raises on duplicates
                if ckpt is not None and ckpt.latest_step() != done:
                    ckpt.save(done, state, wait=True)
                    if is_rank0:
                        print(
                            f"preemption checkpoint saved at step {done}",
                            file=sys.stderr,
                        )
                break
            # batched eval encode: never materializes the eval split as one
            # host array / one device batch (matters for eval_fraction=0,
            # where the "split" is the whole — possibly mmapped — dataset)
            eval_state = (
                trainer.ema_state(state)
                if cfg.train.eval_with_ema
                else state
            )
            v_emb, t_emb = _encode_split(
                trainer, eval_state, eval_data, local_batch
            )
            metrics = retrieval_metrics(
                jax.numpy.asarray(v_emb), jax.numpy.asarray(t_emb)
            )
            metrics["step"] = done
            writer({f"eval/{k}" if k != "step" else k: v for k, v in metrics.items()})
            if ckpt is not None:
                ckpt.save(done, state)
            if best_ckpt is not None:
                if cfg.train.keep_best_metric not in metrics:
                    raise SystemExit(
                        f"train.keep_best_metric "
                        f"{cfg.train.keep_best_metric!r} is not an eval "
                        f"metric; available: {sorted(metrics)}"
                    )
                best_ckpt.save(
                    done, state,
                    metrics={k: float(v) for k, v in metrics.items()},
                )
    finally:
        # stop the prefetch worker thread before teardown — a daemon
        # thread mid-device_put at interpreter shutdown can fault
        it.close()
        for sig, handler in prev_handlers.items():
            signal.signal(sig, handler)
        if ckpt is not None:
            ckpt.wait()
            ckpt.close()
        if best_ckpt is not None:
            best_ckpt.wait()
            best_ckpt.close()
        writer.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
