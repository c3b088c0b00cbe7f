"""Worker for the REAL 2-process distributed test (not a test itself).

Launched by tests/test_multiprocess.py as ``python multiprocess_worker.py
<rank> <port> <workdir> [extra train.main args...]``.  Connects the two
CPU processes through ``jax.distributed.initialize`` (4 local devices
each → one 8-device global mesh) and runs the actual training CLI, so
``HostShard``, ``make_array_from_process_local_data`` stitching, rank-0
CSV gating, Orbax save/restore, and the sharded eval encode all execute
in a genuine multi-process runtime — no monkeypatched ``process_count``.
"""

import os
import sys

# launched as a script: python puts tests/ on sys.path, not the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    rank = int(sys.argv[1])
    port = sys.argv[2]
    workdir = sys.argv[3]
    extra = sys.argv[4:]

    import jax

    # before any backend use; env vars are overridden by the image's TPU
    # plugin sitecustomize, so this must go through jax.config
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)

    from crossclr_tpu.parallel import initialize_multihost

    # explicit coordinator args (plain-CPU fleets have no auto-discovery);
    # train.main's own initialize_multihost() call then no-ops (idempotent)
    assert initialize_multihost(f"localhost:{port}", 2, rank)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert len(jax.local_devices()) == 4

    from crossclr_tpu.train import main as train_main

    rc = train_main(
        [
            "--metrics-csv", f"{workdir}/metrics_rank{rank}.csv",
            "data.num_pairs=64", "data.batch_size=16",
            "data.video_dim=24", "data.text_dim=16",
            "video_tower.input_dim=24", "video_tower.embed_dim=16",
            "video_tower.hidden_dim=32", "video_tower.dtype=float32",
            "text_tower.input_dim=16", "text_tower.embed_dim=16",
            "text_tower.hidden_dim=32", "text_tower.dtype=float32",
            "train.loss=crossclr_intra", "train.global_negatives=true",
            "train.warmup_steps=2",
            # 2 steps per dispatch: exercises host-side chunk stacking +
            # make_array_from_process_local_data stitching of the stacked
            # global chunk + scan-over-shard_map, all cross-process
            "train.steps_per_call=2",
            f"checkpoint_dir={workdir}/ckpt",
            "eval_every=2", "log_every=1",
            *extra,
        ]
    )
    print(f"WORKER_DONE rank={rank} rc={rc}", flush=True)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
