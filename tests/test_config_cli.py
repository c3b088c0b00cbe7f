"""Config round-trip and CLI entry-point tests."""

import dataclasses
import json
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from crossclr_tpu.models import TowerConfig
from crossclr_tpu.utils.config import (
    DataConfig,
    ExperimentConfig,
    apply_overrides,
    load_config,
    save_config,
)


def test_config_roundtrip(tmp_path):
    cfg = ExperimentConfig(
        name="t",
        video_tower=TowerConfig(kind="transformer", input_dim=64, dtype=jnp.bfloat16),
        data=DataConfig(batch_size=128),
    )
    path = tmp_path / "c.json"
    save_config(cfg, path)
    loaded = load_config(path)
    assert loaded.name == "t"
    assert loaded.video_tower.kind == "transformer"
    assert loaded.video_tower.input_dim == 64
    assert loaded.video_tower.dtype is jnp.bfloat16
    assert loaded.data.batch_size == 128


def test_shipped_configs_parse():
    import glob

    names = sorted(glob.glob("configs/*.json"))
    assert len(names) >= 4  # youcook2, lsmdc, fullcrossclr, podslice
    for name in names:
        cfg = load_config(name)
        assert cfg.train.temperature == 0.03  # loss.py:50 default preserved
        assert cfg.train.negative_weight == 0.8
        # structural constraints the runtime enforces later must already
        # hold in every shipped file (fail here, not mid-training)
        if cfg.train.steps_per_call > 1:
            assert cfg.eval_every % cfg.train.steps_per_call == 0, name
        if cfg.train.embedding_chunk:
            # embedding_chunk bounds the PER-DEVICE rows encoded at once;
            # under global_negatives the per-device batch is the global
            # batch over the data-axis size.  A shipped config must not
            # crash on any plausible slice: for every power-of-two device
            # count, either the per-device batch already fits under the
            # bound (plain step runs) or the chunk divides it.
            for ndev in (1, 2, 4, 8, 16, 32, 64, 128):
                n = (
                    cfg.data.batch_size // ndev
                    if cfg.train.global_negatives
                    else cfg.data.batch_size
                )
                if n <= 0:
                    continue
                assert (
                    n <= cfg.train.embedding_chunk
                    or n % cfg.train.embedding_chunk == 0
                ), (name, ndev, n)


def test_overrides():
    cfg = ExperimentConfig()
    cfg2 = apply_overrides(
        cfg, ["train.loss=info_nce", "data.batch_size=32", "train.temperature=0.5"]
    )
    assert cfg2.train.loss == "info_nce"
    assert cfg2.data.batch_size == 32
    assert cfg2.train.temperature == 0.5
    # original untouched (frozen dataclasses)
    assert cfg.train.loss == "crossclr_intra"


def test_override_unknown_key_raises():
    with pytest.raises(KeyError):
        apply_overrides(ExperimentConfig(), ["train.nope=1"])


def test_cli_save_config(tmp_path):
    out = tmp_path / "resolved.json"
    from crossclr_tpu.train import main

    rc = main(["--save-config", str(out), "train.total_steps=7"])
    assert rc == 0
    assert json.loads(out.read_text())["train"]["total_steps"] == 7


def test_cli_end_to_end_smoke(tmp_path):
    """Full CLI: synthetic data, tiny towers, a few steps, metrics CSV."""
    from crossclr_tpu.train import main

    csv_path = tmp_path / "metrics.csv"
    rc = main(
        [
            "--steps", "6",
            "--metrics-csv", str(csv_path),
            "data.num_pairs=64",
            "data.batch_size=32",
            "data.video_dim=24",
            "data.text_dim=16",
            "video_tower.input_dim=24",
            "video_tower.embed_dim=16",
            "video_tower.hidden_dim=32",
            "video_tower.dtype=float32",
            "text_tower.input_dim=16",
            "text_tower.embed_dim=16",
            "text_tower.hidden_dim=32",
            "text_tower.dtype=float32",
            "train.warmup_steps=2",
            "eval_every=3",
            "log_every=2",
        ]
    )
    assert rc == 0
    assert csv_path.exists()
    rows = csv_path.read_text().strip().splitlines()
    assert len(rows) >= 2  # header + at least one metric row


def test_checkpoint_resume_via_cli(tmp_path):
    from crossclr_tpu.train import main

    args = [
        "--steps", "4",
        "data.num_pairs=64", "data.batch_size=32",
        "data.video_dim=24", "data.text_dim=16",
        "video_tower.input_dim=24", "video_tower.embed_dim=16",
        "video_tower.hidden_dim=32", "video_tower.dtype=float32",
        "text_tower.input_dim=16", "text_tower.embed_dim=16",
        "text_tower.hidden_dim=32", "text_tower.dtype=float32",
        "train.warmup_steps=2", "eval_every=2", "log_every=2",
        f"checkpoint_dir={tmp_path}/ck",
    ]
    assert main(args) == 0
    # resume: bump steps, should pick up from step 4
    args[1] = "8"
    assert main(args) == 0


def test_cli_heldout_retrieval_gate(tmp_path):
    """Accuracy proxy gate (BASELINE.md): the full CLI pipeline on
    correlated synthetic pairs must reach eval R@1 >= 90 on the HELD-OUT
    split within 300 steps.  Exercises the exact train -> encode ->
    retrieve path the real YouCook2/LSMDC gate would use, and, because the
    eval rows are excluded from the train stream, measures generalization
    rather than memorization."""
    import csv as _csv

    from crossclr_tpu.train import main

    csv_path = tmp_path / "metrics.csv"
    rc = main(
        [
            "--steps", "300",
            "--metrics-csv", str(csv_path),
            "data.num_pairs=512",
            "data.batch_size=128",
            "data.video_dim=48",
            "data.text_dim=32",
            "video_tower.input_dim=48",
            "video_tower.embed_dim=32",
            "video_tower.hidden_dim=64",
            "video_tower.dtype=float32",
            "text_tower.input_dim=32",
            "text_tower.embed_dim=32",
            "text_tower.hidden_dim=64",
            "text_tower.dtype=float32",
            "train.learning_rate=1e-3",
            "train.temperature=0.1",
            "train.warmup_steps=10",
            "eval_every=300",
            "log_every=100",
        ]
    )
    assert rc == 0
    rows = list(_csv.DictReader(open(csv_path)))
    eval_rows = [r for r in rows if r.get("eval/v2t/R@1")]
    assert eval_rows, f"no eval metrics logged; keys={rows[-1].keys()}"
    final = eval_rows[-1]
    assert float(final["eval/v2t/R@1"]) >= 90.0, final
    assert float(final["eval/t2v/R@1"]) >= 90.0, final


def test_cli_heldout_retrieval_gate_from_int8_store(tmp_path):
    """The same proxy gate, fed from an int8 FEATURE STORE: the exact
    correlated pairs the synthetic gate trains on, exported through
    per-row int8 quantization (4x narrower host path) and trained via
    the ``files`` source with device-side dequant — held-out R@1 must
    still clear 90, i.e. the narrow store does not degrade what the
    model learns."""
    import csv as _csv

    from crossclr_tpu.data import SyntheticPairs, quantize_features
    from crossclr_tpu.train import main

    data = SyntheticPairs(num_pairs=512, video_dim=48, text_dim=32, seed=0)
    for arr, name in ((data.video, "v"), (data.text, "t")):
        q, s = quantize_features(np.asarray(arr))
        np.save(tmp_path / f"{name}.npy", q)
        np.save(tmp_path / f"{name}_scale.npy", s)

    csv_path = tmp_path / "metrics.csv"
    rc = main(
        [
            "--steps", "300",
            "--metrics-csv", str(csv_path),
            "data.source=files",
            f"data.video_path={tmp_path / 'v.npy'}",
            f"data.text_path={tmp_path / 't.npy'}",
            "data.features_dtype=int8",
            "data.eval_fraction=0.125",  # 64 held-out rows, as the gate
            "data.batch_size=128",
            "video_tower.input_dim=48",
            "video_tower.embed_dim=32",
            "video_tower.hidden_dim=64",
            "video_tower.dtype=float32",
            "text_tower.input_dim=32",
            "text_tower.embed_dim=32",
            "text_tower.hidden_dim=64",
            "text_tower.dtype=float32",
            "train.learning_rate=1e-3",
            "train.temperature=0.1",
            "train.warmup_steps=10",
            "eval_every=300",
            "log_every=100",
        ]
    )
    assert rc == 0
    rows = list(_csv.DictReader(open(csv_path)))
    eval_rows = [r for r in rows if r.get("eval/v2t/R@1")]
    assert eval_rows, f"no eval metrics logged; keys={rows[-1].keys()}"
    final = eval_rows[-1]
    assert float(final["eval/v2t/R@1"]) >= 90.0, final
    assert float(final["eval/t2v/R@1"]) >= 90.0, final


def test_eval_cli_from_checkpoint(tmp_path, capsys):
    """python -m crossclr_tpu.eval: restore the trained checkpoint, report
    held-out retrieval metrics as one JSON line, and dump top-k retrievals
    (the serving path) to an .npz."""
    from crossclr_tpu.eval import main as eval_main
    from crossclr_tpu.train import main as train_main

    common = [
        "data.num_pairs=64", "data.batch_size=32",
        "data.video_dim=24", "data.text_dim=16",
        "video_tower.input_dim=24", "video_tower.embed_dim=16",
        "video_tower.hidden_dim=32", "video_tower.dtype=float32",
        "text_tower.input_dim=16", "text_tower.embed_dim=16",
        "text_tower.hidden_dim=32", "text_tower.dtype=float32",
        "train.warmup_steps=2",
        f"checkpoint_dir={tmp_path}/ck",
    ]
    assert train_main(["--steps", "4", "eval_every=4", "log_every=2"] + common) == 0
    capsys.readouterr()

    topk_path = tmp_path / "retrievals.npz"
    out_path = tmp_path / "metrics.json"
    rc = eval_main(
        [
            "--topk", "3",
            "--topk-queries", "text",
            "--topk-output", str(topk_path),
            "--output", str(out_path),
        ]
        + common
    )
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    metrics = json.loads(line)
    assert metrics["step"] == 4
    assert metrics["split"] == "eval"
    assert metrics["rows"] == 6  # 10% of 64 -> 6 held-out rows
    assert "v2t/R@1" in metrics and "t2v/MdR" in metrics
    assert json.loads(out_path.read_text()) == metrics

    dump = np.load(topk_path)
    assert dump["scores"].shape == (6, 3)
    assert dump["indices"].shape == (6, 3)

    # --split all covers the full dataset; --random-params skips restore
    rc = eval_main(["--split", "all", "--random-params"] + common)
    assert rc == 0
    metrics_all = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics_all["rows"] == 64
    assert metrics_all["step"] == 0


def test_eval_cli_requires_checkpoint(tmp_path):
    from crossclr_tpu.eval import main as eval_main

    with pytest.raises(SystemExit, match="no checkpoint"):
        eval_main(["data.num_pairs=32", "data.batch_size=16"])


def test_eval_encode_split_multihost_replicates(monkeypatch):
    """_encode_split under jax.process_count() > 1: embeddings are
    replicated over the mesh before the host fetch (np.asarray on a
    non-fully-addressable sharded array would raise on a real multi-host
    slice), and values match the single-process path."""
    import jax

    from crossclr_tpu.data import SyntheticPairs, epoch_batches
    from crossclr_tpu.eval import _encode_split
    from crossclr_tpu.models import TowerConfig
    from crossclr_tpu.parallel import make_mesh
    from crossclr_tpu.training import TrainConfig, Trainer

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    data = SyntheticPairs(num_pairs=60, video_dim=24, text_dim=16, seed=0)
    vc = TowerConfig(kind="mlp", input_dim=24, embed_dim=16, hidden_dim=32,
                     dtype=jnp.float32)
    tc = TowerConfig(kind="mlp", input_dim=16, embed_dim=16, hidden_dim=32,
                     dtype=jnp.float32)
    tr = Trainer(vc, tc, TrainConfig(total_steps=5), mesh=make_mesh())
    batch0 = next(epoch_batches(data, 30))
    state = tr.init_state(batch0["video"], batch0["text"])

    v1, t1 = _encode_split(tr, state, data, 30)

    # batches of 30 rows are not divisible by the 8-device mesh, so
    # Trainer.encode takes its replicated plain path under the mocked
    # process count and _encode_split's replicate wrapper engages
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    v2, t2 = _encode_split(tr, state, data, 30)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)
    np.testing.assert_allclose(t1, t2, rtol=1e-6)


def test_train_cli_eval_fraction_zero_disables_holdout(tmp_path, capsys):
    """data.eval_fraction=0: train on every row, eval on the train rows
    (memorization diagnostic), with the caveat stated on stderr."""
    from crossclr_tpu.train import main

    csv_path = tmp_path / "metrics.csv"
    rc = main(
        [
            "--steps", "2",
            "--metrics-csv", str(csv_path),
            "data.num_pairs=32", "data.batch_size=32",
            "data.eval_fraction=0",
            "data.video_dim=24", "data.text_dim=16",
            "video_tower.input_dim=24", "video_tower.embed_dim=16",
            "video_tower.hidden_dim=32", "video_tower.dtype=float32",
            "text_tower.input_dim=16", "text_tower.embed_dim=16",
            "text_tower.hidden_dim=32", "text_tower.dtype=float32",
            "train.warmup_steps=1", "eval_every=2", "log_every=1",
        ]
    )
    assert rc == 0
    assert "memorization" in capsys.readouterr().err
    # with a 32-row dataset and batch 32, a holdout would have made the
    # train stream impossible — fraction 0 keeps every row trainable
    assert csv_path.exists()


def test_sigterm_checkpoints_and_resumes(tmp_path):
    """Preemption tolerance: SIGTERM mid-run exits 0 at a step boundary
    with a checkpoint; a rerun resumes from it (TPU pods deliver SIGTERM
    with a grace window — dying mid-step loses the step, a flag + poll
    does not)."""
    import os
    import signal as _signal
    import time

    csv_path = tmp_path / "metrics.csv"
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import sys\n"
        "from crossclr_tpu.train import main\n"
        "sys.exit(main(sys.argv[1:]))\n"
    )
    args = [
        sys.executable, "-c", code,
        "--steps", "100000",
        "--metrics-csv", str(csv_path),
        "data.num_pairs=64", "data.batch_size=32",
        "data.video_dim=24", "data.text_dim=16",
        "video_tower.input_dim=24", "video_tower.embed_dim=16",
        "video_tower.hidden_dim=32", "video_tower.dtype=float32",
        "text_tower.input_dim=16", "text_tower.embed_dim=16",
        "text_tower.hidden_dim=32", "text_tower.dtype=float32",
        "train.warmup_steps=2", "eval_every=100000", "log_every=50",
        f"checkpoint_dir={tmp_path}/ck",
    ]
    proc = subprocess.Popen(
        args, cwd="/root/repo", stderr=subprocess.PIPE, text=True
    )
    # wait until training is demonstrably under way (metrics rows exist)
    deadline = time.time() + 120
    while time.time() < deadline:
        if csv_path.exists() and len(csv_path.read_text().splitlines()) >= 2:
            break
        if proc.poll() is not None:
            raise AssertionError(f"CLI died early: {proc.communicate()[1]}")
        time.sleep(0.5)
    else:
        proc.kill()
        raise AssertionError("training never produced metrics")

    proc.send_signal(_signal.SIGTERM)
    _, err = proc.communicate(timeout=120)
    assert proc.returncode == 0, err
    assert "preemption checkpoint saved" in err

    from crossclr_tpu.training import CheckpointManager

    saved = CheckpointManager(f"{tmp_path}/ck").latest_step()
    assert saved is not None and 0 < saved < 100000


def test_cli_variable_length_sequences(tmp_path):
    """End-to-end CLI with ragged synthetic sequences: masks flow through
    training AND the periodic eval encode."""
    from crossclr_tpu.train import main

    csv_path = tmp_path / "metrics.csv"
    rc = main(
        [
            "--steps", "4",
            "--metrics-csv", str(csv_path),
            "data.num_pairs=48", "data.batch_size=16",
            "data.video_dim=16", "data.text_dim=12",
            "data.video_seq_len=5", "data.text_seq_len=3",
            "data.variable_lengths=true",
            "video_tower.kind=transformer", "video_tower.input_dim=16",
            "video_tower.embed_dim=16", "video_tower.hidden_dim=32",
            "video_tower.num_layers=1", "video_tower.num_heads=2",
            "video_tower.max_seq_len=8", "video_tower.dtype=float32",
            "text_tower.kind=transformer", "text_tower.input_dim=12",
            "text_tower.embed_dim=16", "text_tower.hidden_dim=32",
            "text_tower.num_layers=1", "text_tower.num_heads=2",
            "text_tower.max_seq_len=8", "text_tower.dtype=float32",
            "train.warmup_steps=1", "eval_every=4", "log_every=2",
        ]
    )
    assert rc == 0
    rows = csv_path.read_text().splitlines()
    assert any("eval/v2t/R@1" in r for r in rows[:1])  # header has eval keys


def test_cli_profile_dir_writes_trace(tmp_path):
    """--profile-dir captures a jax.profiler trace of the first chunk."""
    from crossclr_tpu.train import main

    rc = main(
        [
            "--steps", "2",
            "--profile-dir", str(tmp_path / "trace"),
            "data.num_pairs=32", "data.batch_size=16",
            "data.video_dim=24", "data.text_dim=16",
            "video_tower.input_dim=24", "video_tower.embed_dim=16",
            "video_tower.hidden_dim=32", "video_tower.dtype=float32",
            "text_tower.input_dim=16", "text_tower.embed_dim=16",
            "text_tower.hidden_dim=32", "text_tower.dtype=float32",
            "train.warmup_steps=1", "eval_every=2", "log_every=1",
        ]
    )
    assert rc == 0
    # jax writes plugins/profile/<ts>/*.xplane.pb under the logdir
    traces = list((tmp_path / "trace").rglob("*.xplane.pb"))
    assert traces, list((tmp_path / "trace").rglob("*"))


def test_checkpoint_best_retention_unit(tmp_path):
    """A ranked CheckpointManager keeps the best-by-metric step, not the
    most recent (max_to_keep=1 evicts the rest)."""
    import jax.numpy as jnp

    from crossclr_tpu.data import SyntheticPairs, epoch_batches
    from crossclr_tpu.models import TowerConfig
    from crossclr_tpu.training import CheckpointManager, TrainConfig, Trainer

    data = SyntheticPairs(num_pairs=32, video_dim=8, text_dim=8, seed=0)
    tower = TowerConfig(
        kind="mlp", input_dim=8, embed_dim=8, hidden_dim=8,
        dtype=jnp.float32,
    )
    trainer = Trainer(tower, tower, TrainConfig(total_steps=10), mesh=None)
    batch = next(epoch_batches(data, 16, shuffle=False))
    state = trainer.init_state(batch["video"], batch["text"])

    mngr = CheckpointManager(
        tmp_path / "best", max_to_keep=1, best_metric="v2t/R@1"
    )
    for step, r1 in ((1, 50.0), (2, 90.0), (3, 70.0)):
        state = state.replace(step=step)
        mngr.save(step, state, metrics={"v2t/R@1": r1}, wait=True)
    assert mngr.best_step() == 2
    restored = mngr.restore(state.replace(step=0), step=mngr.best_step())
    assert int(restored.step) == 2
    mngr.close()


def test_train_cli_keep_best_metric(tmp_path):
    """train.keep_best_metric writes a ranked best checkpoint under
    <checkpoint_dir>/best, loadable by the eval CLI."""
    from crossclr_tpu import eval as eval_cli
    from crossclr_tpu.train import main

    ckpt = tmp_path / "ckpt"
    common = [
        "data.num_pairs=64", "data.batch_size=32",
        "data.video_dim=24", "data.text_dim=16",
        "video_tower.input_dim=24", "video_tower.embed_dim=16",
        "video_tower.hidden_dim=32", "video_tower.dtype=float32",
        "text_tower.input_dim=16", "text_tower.embed_dim=16",
        "text_tower.hidden_dim=32", "text_tower.dtype=float32",
        "train.warmup_steps=2", "eval_every=3", "log_every=3",
    ]
    rc = main([
        "--steps", "6", f"checkpoint_dir={ckpt}",
        "train.keep_best_metric=v2t/R@1", *common,
    ])
    assert rc == 0
    assert (ckpt / "best").is_dir()

    from crossclr_tpu.training import CheckpointManager

    best = CheckpointManager(ckpt / "best", best_metric="v2t/R@1")
    assert best.best_step() in (3, 6)
    best.close()

    # the eval CLI consumes the selected model by pointing at <dir>/best
    rc = eval_cli.main([
        "--checkpoint-dir", str(ckpt / "best"), "--split", "all", *common,
    ])
    assert rc == 0

    # an unknown metric name fails loudly at the first eval boundary
    import pytest

    with pytest.raises(SystemExit, match="not an eval metric"):
        main([
            "--steps", "3",
            f"checkpoint_dir={tmp_path / 'ckpt2'}",
            "train.keep_best_metric=nope/R@1", *common,
        ])
