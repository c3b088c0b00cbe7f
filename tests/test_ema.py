"""EMA (Polyak-averaged) parameters: TrainConfig.ema_decay.

The reference ships no trainer at all (SURVEY.md §1), so this is part of
the capability envelope around it: an exponential moving average of the
parameters rides the TrainState — updated in the jitted step, sharded
like the live params, checkpointed — and `eval --ema` / `serve --ema`
encode with it.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crossclr_tpu.data import SyntheticPairs, epoch_batches
from crossclr_tpu.models import TowerConfig
from crossclr_tpu.training import CheckpointManager, TrainConfig, Trainer


def _setup(ema_decay=0.9, mesh=None, **cfg_kw):
    data = SyntheticPairs(num_pairs=128, video_dim=24, text_dim=16, seed=0)
    video_cfg = TowerConfig(
        kind="mlp", input_dim=24, embed_dim=16, hidden_dim=32,
        dtype=jnp.float32,
    )
    text_cfg = TowerConfig(
        kind="mlp", input_dim=16, embed_dim=16, hidden_dim=32,
        dtype=jnp.float32,
    )
    train_cfg = TrainConfig(
        learning_rate=1e-3, warmup_steps=2, total_steps=50,
        ema_decay=ema_decay, **cfg_kw,
    )
    trainer = Trainer(video_cfg, text_cfg, train_cfg, mesh=mesh)
    batch = next(epoch_batches(data, 32, shuffle=False))
    state = trainer.init_state(batch["video"], batch["text"])
    return trainer, state, batch


def _host(tree):
    return jax.tree.map(lambda v: np.asarray(v), tree)


def test_ema_matches_host_recurrence():
    """On-device EMA == the closed host recurrence over the live params
    (initialized AT the initial params: no zero-init bias)."""
    d = 0.9
    trainer, state, batch = _setup(ema_decay=d)
    ema_host = _host(state.params)
    np.testing.assert_array_equal(
        _host(state.ema_params)["logit_scale"], ema_host["logit_scale"]
    )
    for _ in range(4):
        state, _ = trainer.train_step(state, batch)
        params_host = _host(state.params)
        ema_host = jax.tree.map(
            lambda e, p: d * e + (1 - d) * p, ema_host, params_host
        )
        got = _host(state.ema_params)
        # atol floors the near-zero elements (fp32 fma-order noise)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                a, b, rtol=1e-5, atol=1e-6
            ),
            got, ema_host,
        )
    # EMA lags the live params once training moves
    diffs = jax.tree.leaves(
        jax.tree.map(
            lambda e, p: float(np.abs(e - p).max()),
            _host(state.ema_params), _host(state.params),
        )
    )
    assert max(diffs) > 0


def test_ema_disabled_costs_nothing_and_raises():
    trainer, state, batch = _setup(ema_decay=None)
    assert state.ema_params is None
    state, _ = trainer.train_step(state, batch)
    assert state.ema_params is None
    with pytest.raises(ValueError, match="ema_decay"):
        state.as_ema()


def test_ema_decay_validated():
    with pytest.raises(ValueError, match="ema_decay"):
        _setup(ema_decay=1.0)


def test_ema_scanned_steps_match_sequential():
    """steps_per_call composes with EMA: the scanned multi-step dispatch
    produces the same EMA tree as sequential stepping."""
    from crossclr_tpu.data import stack_batches

    trainer_a, state_a, batch = _setup(ema_decay=0.95)
    trainer_b, state_b, _ = _setup(ema_decay=0.95)
    batches = [batch] * 3
    for b in batches:
        state_a, _ = trainer_a.train_step(state_a, b)
    stacked = next(stack_batches(iter(batches), 3))
    state_b, _ = trainer_b.train_steps(state_b, stacked)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        _host(state_a.ema_params), _host(state_b.ema_params),
    )


def test_ema_checkpoint_roundtrip_and_as_ema(tmp_path):
    trainer, state, batch = _setup(ema_decay=0.9)
    for _ in range(3):
        state, _ = trainer.train_step(state, batch)
    mngr = CheckpointManager(tmp_path / "ckpt")
    mngr.save(3, state, wait=True)
    mngr.close()

    trainer2, template, _ = _setup(ema_decay=0.9)
    restored = CheckpointManager(tmp_path / "ckpt").restore(template)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        _host(state.ema_params), _host(restored.ema_params),
    )
    # as_ema really swaps: encode with EMA differs from encode with live
    swapped = restored.as_ema()
    v_live, _ = trainer2.encode(restored, batch)
    v_ema, _ = trainer2.encode(swapped, batch)
    assert float(np.abs(np.asarray(v_live) - np.asarray(v_ema)).max()) > 0


def test_ema_sharded_like_params_under_tp():
    """Tensor-parallel placement: the EMA tree gets the SAME shardings as
    the live params, and the step preserves them."""
    from crossclr_tpu.parallel import make_mesh

    mesh = make_mesh(n_model=2)
    trainer, state, batch = _setup(ema_decay=0.9, mesh=mesh)

    def specs(tree):
        return jax.tree.map(lambda v: v.sharding.spec, tree)

    assert specs(state.ema_params) == specs(state.params)
    state, _ = trainer.train_step(state, batch)
    assert specs(state.ema_params) == specs(state.params)


def test_eval_and_serve_cli_use_ema(tmp_path):
    """`eval --ema` reports against the EMA tree; `serve --ema` builds a
    service whose query tower is the EMA one."""
    from crossclr_tpu import eval as eval_cli
    from crossclr_tpu.data import dataset_from_config
    from crossclr_tpu.serve import build_service
    from crossclr_tpu.utils.config import (
        DataConfig,
        ExperimentConfig,
        apply_overrides,
        save_config,
    )

    cfg = ExperimentConfig(data=DataConfig(
        num_pairs=48, batch_size=16, video_dim=24, text_dim=16,
    ))
    cfg = apply_overrides(cfg, [
        "video_tower.input_dim=24", "video_tower.embed_dim=16",
        "video_tower.hidden_dim=32", "video_tower.dtype=float32",
        "text_tower.input_dim=16", "text_tower.embed_dim=16",
        "text_tower.hidden_dim=32", "text_tower.dtype=float32",
        "train.ema_decay=0.5", "train.learning_rate=0.01",
        "train.warmup_steps=1",
    ])
    dataset, _ = dataset_from_config(cfg.data)
    trainer = Trainer(cfg.video_tower, cfg.text_tower, cfg.train, mesh=None)
    batch = next(epoch_batches(dataset, 16, shuffle=False))
    state = trainer.init_state(batch["video"], batch["text"])
    for _ in range(3):
        state, _ = trainer.train_step(state, batch)
    ckpt = tmp_path / "ckpt"
    mngr = CheckpointManager(ckpt)
    mngr.save(3, state, wait=True)
    mngr.close()
    cfg_path = tmp_path / "cfg.json"
    save_config(cfg, cfg_path)

    out = tmp_path / "m.json"
    assert eval_cli.main([
        "--config", str(cfg_path), "--split", "all",
        "--checkpoint-dir", str(ckpt), "--ema", "--output", str(out),
    ]) == 0
    metrics = json.loads(out.read_text())
    assert metrics["ema"] is True

    svc_ema = build_service(cfg, str(ckpt), "video", use_ema=True)
    svc_live = build_service(cfg, str(ckpt), "video")
    queries = SyntheticPairs(
        num_pairs=48, video_dim=24, text_dim=16, seed=0
    ).text[:3]
    s_ema = svc_ema.search(queries, k=4)
    s_live = svc_live.search(queries, k=4)
    # the EMA tower is a different function: scores must differ
    assert s_ema["scores"] != s_live["scores"]
    # and the EMA service's corpus was encoded with the EMA tower too
    batch_all = {"video": dataset.video, "text": dataset.text}
    v_ema, _ = trainer.encode(svc_ema.state, batch_all)
    np.testing.assert_allclose(
        np.asarray(svc_ema.corpus_emb), np.asarray(v_ema), atol=1e-6
    )

    # a LIVE-encoded dump served with --ema is a tower/index mismatch the
    # step comparison cannot see — the npz records the flavor and serve
    # flags the disagreement (and the matching combination does not)
    emb_path = tmp_path / "live_dump.npz"
    assert eval_cli.main([
        "--config", str(cfg_path), "--split", "all",
        "--checkpoint-dir", str(ckpt),
        "--embeddings-output", str(emb_path),
    ]) == 0
    mismatched = build_service(
        cfg, str(ckpt), "video", use_ema=True,
        corpus_emb_path=str(emb_path),
    )
    assert mismatched.index_tower_mismatch is True
    matched = build_service(
        cfg, str(ckpt), "video", corpus_emb_path=str(emb_path)
    )
    assert matched.index_tower_mismatch is False


def test_train_cli_eval_with_ema(tmp_path):
    """train.eval_with_ema: the eval-boundary metrics (and best ranking)
    come from the EMA tower; without ema_decay it fails at startup."""
    import pytest

    from crossclr_tpu.train import main

    common = [
        "data.num_pairs=64", "data.batch_size=32",
        "data.video_dim=24", "data.text_dim=16",
        "video_tower.input_dim=24", "video_tower.embed_dim=16",
        "video_tower.hidden_dim=32", "video_tower.dtype=float32",
        "text_tower.input_dim=16", "text_tower.embed_dim=16",
        "text_tower.hidden_dim=32", "text_tower.dtype=float32",
        "train.warmup_steps=2", "eval_every=3", "log_every=3",
    ]
    csv_path = tmp_path / "m.csv"
    rc = main([
        "--steps", "3", "--metrics-csv", str(csv_path),
        "train.ema_decay=0.5", "train.eval_with_ema=true", *common,
    ])
    assert rc == 0
    assert "eval/v2t/R@1" in csv_path.read_text()

    with pytest.raises(SystemExit, match="requires train.ema_decay"):
        main(["--steps", "3", "train.eval_with_ema=true", *common])
