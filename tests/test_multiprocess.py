"""REAL 2-process distributed training (SURVEY.md §4.3, VERDICT r2 #4).

Every other multi-host test monkeypatches ``jax.process_count``; this one
launches two actual CPU processes joined through
``jax.distributed.initialize`` (4 local devices each → one 8-device
global mesh) and drives the full training CLI end to end, exercising for
real: HostShard row sharding, ``make_array_from_process_local_data``
batch stitching, global-negative shard_map steps, the sharded eval
encode, Orbax save/restore across processes, and rank-0 CSV gating.
"""

import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "multiprocess_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(WORKER)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_pair(port, workdir, steps, timeout=240, extra=()):
    env = dict(os.environ)
    env.pop("CROSSCLR_TESTS_BACKEND", None)  # worker forces CPU itself
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(rank), str(port), str(workdir),
             "--steps", str(steps), *extra],
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for rank in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
    return outs


def test_two_process_train_eval_checkpoint_resume(tmp_path):
    port = _free_port()
    out0, out1 = _run_pair(port, tmp_path, steps=4)

    # rank 0 echoes train metrics and eval retrieval metrics; rank 1 is
    # silent (echo gating) and writes no CSV (writer-path gating)
    assert "step=4" in out0 and "eval/t2v/R@1" in out0
    assert "step=4" not in out1 and "eval/" not in out1
    csv0 = tmp_path / "metrics_rank0.csv"
    assert csv0.exists()
    assert not (tmp_path / "metrics_rank1.csv").exists()
    rows = csv0.read_text().strip().splitlines()
    # header + train rows (logged per 2-step dispatch chunk:
    # steps_per_call=2 in the worker) + eval rows
    assert len(rows) >= 5

    # checkpoints land at the eval_every boundaries from the shared dir
    assert sorted(p.name for p in (tmp_path / "ckpt").iterdir()) == ["2", "4"]

    # second 2-process run restores the step-4 state and continues the
    # exact batch sequence to step 6 — on a HYBRID mesh (2 process
    # granules): with process-sorted CPU devices the grid is identical to
    # the plain one, so the restore stays valid while the hybrid
    # construction + sharding-derived stitching run in a genuine
    # multi-process runtime
    out0b, _ = _run_pair(
        _free_port(), tmp_path, steps=6,
        extra=("--mesh-dcn", "2", "--mesh-granule", "process"),
    )
    assert "resumed from step 4" in out0b
    # metrics log at 2-step dispatch-chunk granularity: step 6, not 5
    assert "step=6" in out0b
    assert "6" in {p.name for p in (tmp_path / "ckpt").iterdir()}

    # CSV extends across the resume: the step column reaches 6 exactly once
    rows = csv0.read_text().strip().splitlines()
    header = rows[0].split(",")
    step_col = header.index("step")
    steps_logged = [r.split(",")[step_col] for r in rows[1:]]
    assert steps_logged.count("6") >= 1
    assert max(int(float(s)) for s in steps_logged if s) == 6
