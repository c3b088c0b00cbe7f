"""Training integration tests (SURVEY.md §4 item 5).

Tiny dual encoders + synthetic correlated data must overfit to high
retrieval R@1 in a few hundred steps; checkpoint save/restore round-trips
the full state; the sharded global-negative step runs on the 8-device
CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crossclr_tpu.data import SyntheticPairs, epoch_batches, infinite_batches
from crossclr_tpu.evaluation import retrieval_metrics
from crossclr_tpu.models import TowerConfig
from crossclr_tpu.training import CheckpointManager, TrainConfig, Trainer


def _tiny_setup(loss="crossclr_intra", mesh=None, batch_size=64):
    data = SyntheticPairs(num_pairs=256, video_dim=48, text_dim=32, seed=0)
    video_cfg = TowerConfig(
        kind="mlp", input_dim=48, embed_dim=32, hidden_dim=64, dtype=jnp.float32
    )
    text_cfg = TowerConfig(
        kind="mlp", input_dim=32, embed_dim=32, hidden_dim=64, dtype=jnp.float32
    )
    train_cfg = TrainConfig(
        loss=loss,
        learning_rate=1e-3,
        warmup_steps=10,
        total_steps=400,
        temperature=0.1,
    )
    trainer = Trainer(video_cfg, text_cfg, train_cfg, mesh=mesh)
    batch0 = next(epoch_batches(data, batch_size))
    state = trainer.init_state(batch0["video"], batch0["text"])
    return data, trainer, state, batch_size


def test_overfit_synthetic_retrieval():
    data, trainer, state, bsz = _tiny_setup()
    state, history = trainer.fit(
        state, infinite_batches(data, bsz), steps=300, log_every=100
    )
    assert history[-1]["loss"] < history[0]["loss"]

    batch = {"video": data.video, "text": data.text}
    v_emb, t_emb = trainer.encode(state, batch)
    metrics = retrieval_metrics(v_emb, t_emb)
    assert metrics["v2t/R@1"] > 80.0, metrics
    assert metrics["t2v/R@1"] > 80.0, metrics


@pytest.mark.parametrize("loss", ["info_nce", "max_margin", "crossclr"])
def test_other_losses_train(loss):
    data, trainer, state, bsz = _tiny_setup(loss=loss)
    state, history = trainer.fit(
        state, infinite_batches(data, bsz), steps=60, log_every=30
    )
    assert np.isfinite(history[-1]["loss"])
    assert history[-1]["loss"] < history[0]["loss"] + 1e-3


def test_transformer_towers_train():
    rng = np.random.default_rng(0)
    n, s_v, s_t, d_v, d_t = 128, 6, 4, 24, 16

    class SeqData:
        video = rng.standard_normal((n, s_v, d_v)).astype(np.float32)
        text = rng.standard_normal((n, s_t, d_t)).astype(np.float32)

        def __len__(self):
            return n

    # correlated: text sequence mean tracks video sequence mean
    shared = rng.standard_normal((n, 1, 8)).astype(np.float32)
    SeqData.video[:, :, :8] += shared
    SeqData.text[:, :, :8] += shared

    video_cfg = TowerConfig(
        kind="transformer", input_dim=d_v, embed_dim=32, hidden_dim=64,
        num_layers=1, num_heads=4, max_seq_len=8, dtype=jnp.float32,
    )
    text_cfg = TowerConfig(
        kind="transformer", input_dim=d_t, embed_dim=32, hidden_dim=64,
        num_layers=1, num_heads=4, max_seq_len=8, dtype=jnp.float32,
    )
    trainer = Trainer(
        video_cfg, text_cfg,
        TrainConfig(learning_rate=1e-3, warmup_steps=5, total_steps=200, temperature=0.1),
    )
    ds = SeqData()
    state = trainer.init_state(ds.video[:8], ds.text[:8])
    state, history = trainer.fit(
        state, infinite_batches(ds, 64), steps=80, log_every=40
    )
    assert np.isfinite(history[-1]["loss"])
    assert history[-1]["loss"] < history[0]["loss"]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_global_negative_step_matches_single_device():
    from crossclr_tpu.parallel import make_mesh

    mesh = make_mesh()
    data, trainer_sh, state_sh, bsz = _tiny_setup(mesh=mesh)
    _, trainer_1, state_1, _ = _tiny_setup(mesh=None)

    batch = next(epoch_batches(data, bsz, shuffle=False))
    state_sh2, m_sh = trainer_sh.train_step(state_sh, batch)
    state_12, m_1 = trainer_1.train_step(state_1, batch)
    # same init seed -> same params; global-negative loss over the full
    # batch == local loss on one device
    np.testing.assert_allclose(
        float(m_sh["loss"]), float(m_1["loss"]), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        float(m_sh["grad_norm"]), float(m_1["grad_norm"]), rtol=1e-3
    )


def test_checkpoint_roundtrip(tmp_path):
    data, trainer, state, bsz = _tiny_setup()
    state, _ = trainer.fit(state, infinite_batches(data, bsz), steps=3, log_every=1)

    mngr = CheckpointManager(tmp_path / "ckpt")
    mngr.save(3, state, wait=True)
    restored = mngr.restore(jax.tree.map(np.zeros_like, state))
    assert int(restored.step) == int(state.step)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state.params,
        restored.params,
    )
    mngr.close()


def test_metrics_are_scalars():
    data, trainer, state, bsz = _tiny_setup()
    batch = next(epoch_batches(data, bsz))
    _, metrics = trainer.train_step(state, batch)
    for k, v in metrics.items():
        assert np.asarray(v).shape == (), k
        assert np.isfinite(float(v)), k


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tensor_parallel_step_matches_single_device():
    """dp=4 x tp=2 mesh: Megatron-style sharded tower matmuls under GSPMD
    produce the same loss/grad-norm as an unsharded single-device step."""
    from crossclr_tpu.data import SyntheticPairs, epoch_batches
    from crossclr_tpu.parallel import data_sharding, make_mesh

    mesh = make_mesh(n_data=4, n_model=2)
    data = SyntheticPairs(num_pairs=128, video_dim=48, text_dim=32, seed=0)
    vc = TowerConfig(kind="mlp", input_dim=48, embed_dim=32, hidden_dim=64,
                     dtype=jnp.float32)
    tc = TowerConfig(kind="mlp", input_dim=32, embed_dim=32, hidden_dim=64,
                     dtype=jnp.float32)
    batch = next(epoch_batches(data, 32, shuffle=False))

    tr_tp = Trainer(vc, tc, TrainConfig(total_steps=10), mesh=mesh)
    st_tp = tr_tp.init_state(batch["video"], batch["text"])
    assert "model" in str(
        st_tp.params["video_tower"]["fc1"]["kernel"].sharding.spec
    )
    sh = data_sharding(mesh)
    dbatch = {k: jax.device_put(jnp.asarray(v), sh) for k, v in batch.items()}
    _, m_tp = tr_tp.train_step(st_tp, dbatch)

    tr_1 = Trainer(vc, tc, TrainConfig(total_steps=10), mesh=None)
    st_1 = tr_1.init_state(batch["video"], batch["text"])
    _, m_1 = tr_1.train_step(st_1, batch)

    np.testing.assert_allclose(float(m_tp["loss"]), float(m_1["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m_tp["grad_norm"]), float(m_1["grad_norm"]), rtol=1e-4
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_fused_global_step_matches_single_device():
    """Trainer with loss=crossclr_intra_fused on a data mesh routes through
    the rectangular Pallas kernels (interpret mode on CPU) and matches the
    unsharded step."""
    from crossclr_tpu.parallel import make_mesh

    mesh = make_mesh()
    data, trainer_sh, state_sh, bsz = _tiny_setup(
        loss="crossclr_intra_fused", mesh=mesh
    )
    _, trainer_1, state_1, _ = _tiny_setup(loss="crossclr_intra", mesh=None)

    batch = next(epoch_batches(data, bsz, shuffle=False))
    _, m_sh = trainer_sh.train_step(state_sh, batch)
    _, m_1 = trainer_1.train_step(state_1, batch)
    np.testing.assert_allclose(
        float(m_sh["loss"]), float(m_1["loss"]), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        float(m_sh["grad_norm"]), float(m_1["grad_norm"]), rtol=1e-3
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_fused_global_learnable_temperature_matches_jnp():
    """Learnable τ composes with the GLOBAL fused path: the rect kernels
    take τ as a traced SMEM scalar with a hand-written dτ, so one step
    matches the jnp global path exactly — including the logit_scale
    gradient (it enters grad_norm)."""
    from crossclr_tpu.data import SyntheticPairs, epoch_batches
    from crossclr_tpu.parallel import make_mesh

    mesh = make_mesh()
    data = SyntheticPairs(num_pairs=256, video_dim=48, text_dim=32, seed=0)
    vc = TowerConfig(kind="mlp", input_dim=48, embed_dim=32, hidden_dim=64,
                     dtype=jnp.float32)
    tc = TowerConfig(kind="mlp", input_dim=32, embed_dim=32, hidden_dim=64,
                     dtype=jnp.float32)

    def build(loss):
        cfg = TrainConfig(
            loss=loss, learnable_temperature=True, learning_rate=1e-3,
            warmup_steps=10, total_steps=400, temperature=0.1,
        )
        tr = Trainer(vc, tc, cfg, mesh=mesh)
        batch0 = next(epoch_batches(data, 64))
        return tr, tr.init_state(batch0["video"], batch0["text"])

    tr_f, st_f = build("crossclr_intra_fused")
    tr_j, st_j = build("crossclr_intra")
    batch = next(epoch_batches(data, 64, shuffle=False))
    _, m_f = tr_f.train_step(st_f, batch)
    _, m_j = tr_j.train_step(st_j, batch)
    np.testing.assert_allclose(
        float(m_f["loss"]), float(m_j["loss"]), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        float(m_f["grad_norm"]), float(m_j["grad_norm"]), rtol=1e-3
    )


def test_learnable_temperature_trains_logit_scale():
    """CLIP-style option: logit_scale becomes a live parameter whose value
    moves under training; disabled (reference parity) it stays untouched."""
    data = SyntheticPairs(num_pairs=128, video_dim=16, text_dim=12, seed=0)
    vc = TowerConfig(kind="mlp", input_dim=16, embed_dim=8, hidden_dim=16,
                     dtype=jnp.float32)
    tc = TowerConfig(kind="mlp", input_dim=12, embed_dim=8, hidden_dim=16,
                     dtype=jnp.float32)

    tr = Trainer(vc, tc, TrainConfig(
        loss="crossclr_intra", learnable_temperature=True,
        learning_rate=1e-2, warmup_steps=2, total_steps=50, temperature=0.1,
    ))
    batch = next(epoch_batches(data, 64))
    state = tr.init_state(batch["video"], batch["text"])
    assert float(state.params["logit_scale"]) == 0.0  # exp(0)=1 -> τ as configured
    state, _ = tr.fit(state, infinite_batches(data, 64), steps=20, log_every=20)
    assert abs(float(state.params["logit_scale"])) > 1e-4

    # the fused loss composes with it too (traced-τ dual kernel / jnp
    # fallback off-TPU); max_margin has no temperature and still rejects
    tr2 = Trainer(vc, tc, TrainConfig(
        loss="crossclr_intra_fused", learnable_temperature=True,
        learning_rate=1e-2, warmup_steps=2, total_steps=50, temperature=0.1,
    ))
    st2 = tr2.init_state(batch["video"], batch["text"])
    st2, _ = tr2.fit(st2, infinite_batches(data, 64), steps=20, log_every=20)
    assert abs(float(st2.params["logit_scale"])) > 1e-4

    bad = Trainer(vc, tc, TrainConfig(
        loss="max_margin", learnable_temperature=True, total_steps=5,
    ))
    st3 = bad.init_state(batch["video"], batch["text"])
    with pytest.raises(ValueError):
        bad.train_step(st3, batch)


def test_crossclr_loss_with_transformer_towers_trains():
    """loss='crossclr' + transformer towers: raw sequence batches feed the
    connectivity scoring (regression: this combination used to crash)."""
    rng = np.random.default_rng(0)
    n = 64

    class SeqData:
        video = rng.standard_normal((n, 4, 16)).astype(np.float32)
        text = rng.standard_normal((n, 3, 12)).astype(np.float32)

        def __len__(self):
            return n

    vc = TowerConfig(kind="transformer", input_dim=16, embed_dim=16,
                     hidden_dim=32, num_layers=1, num_heads=2, max_seq_len=4,
                     dtype=jnp.float32)
    tc = TowerConfig(kind="transformer", input_dim=12, embed_dim=16,
                     hidden_dim=32, num_layers=1, num_heads=2, max_seq_len=4,
                     dtype=jnp.float32)
    tr = Trainer(vc, tc, TrainConfig(loss="crossclr", total_steps=10,
                                     warmup_steps=2, temperature=0.1))
    ds = SeqData()
    state = tr.init_state(ds.video[:8], ds.text[:8])
    state, hist = tr.fit(state, infinite_batches(ds, 32), steps=5, log_every=5)
    assert np.isfinite(hist[-1]["loss"])


def test_logit_scale_clamped_without_gradient_latch():
    """The stored logit_scale is clamped AFTER the optimizer step (CLIP
    style), so a value at the bound still has a live gradient path and can
    move back in-range — an in-graph clip would latch it (ADVICE round 1)."""
    data = SyntheticPairs(num_pairs=128, video_dim=16, text_dim=12, seed=0)
    vc = TowerConfig(kind="mlp", input_dim=16, embed_dim=8, hidden_dim=16,
                     dtype=jnp.float32)
    tc = TowerConfig(kind="mlp", input_dim=12, embed_dim=8, hidden_dim=16,
                     dtype=jnp.float32)
    tr = Trainer(vc, tc, TrainConfig(
        loss="crossclr_intra", learnable_temperature=True,
        learning_rate=1e-2, warmup_steps=0, total_steps=50, temperature=0.1,
    ))
    batch = next(epoch_batches(data, 64))
    state = tr.init_state(batch["video"], batch["text"])

    bound = 4.6051702  # ln(100)
    # force the raw parameter far past the lower bound, as runaway Adam
    # momentum would
    state = state.replace(
        params=dict(state.params, logit_scale=jnp.asarray(-6.0, jnp.float32))
    )
    state, _ = tr.train_step(state, batch)
    after_one = float(state.params["logit_scale"])
    assert after_one >= -bound - 1e-6  # clamped back into range

    # gradient still flows at/near the bound: the contrastive gradient
    # pushes the scale up on separable data, so the next steps move it
    # strictly inside the range instead of latching at -bound
    for _ in range(3):
        state, _ = tr.train_step(state, batch)
    assert float(state.params["logit_scale"]) > -bound + 1e-4


def test_encode_multiprocess_dispatch(monkeypatch):
    """Under a mocked multi-process count the sharded eval encode must
    route every batch key through the sharding-derived stitch
    (`stitch_host_replicated` — never feed host-local numpy to a
    global-sharding jit), and fall back to the replicated path when rows
    don't divide the data axis (VERDICT r1 weak #4).  The stitch itself
    is verified for real — including permuted device orders — in
    tests/test_distributed.py and the 2-process run."""
    from crossclr_tpu.parallel import make_mesh
    from crossclr_tpu.training import trainer as trainer_mod

    data = SyntheticPairs(num_pairs=64, video_dim=16, text_dim=12, seed=0)
    vc = TowerConfig(kind="mlp", input_dim=16, embed_dim=8, hidden_dim=16,
                     dtype=jnp.float32)
    tc = TowerConfig(kind="mlp", input_dim=12, embed_dim=8, hidden_dim=16,
                     dtype=jnp.float32)
    mesh = make_mesh(n_data=8, n_model=1)
    tr = Trainer(vc, tc, TrainConfig(loss="crossclr_intra"), mesh=mesh)
    batch = next(epoch_batches(data, 64))
    state = tr.init_state(batch["video"][:8], batch["text"][:8])

    class _Stitched(Exception):
        pass

    captured = {}

    def fake_stitch(sharding, full, global_shape):
        captured[global_shape[1]] = (full.shape, tuple(global_shape))
        raise _Stitched  # short-circuit: placement needs only this probe

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    monkeypatch.setattr(trainer_mod, "stitch_host_replicated", fake_stitch)

    with pytest.raises(_Stitched):
        tr.encode(state, {"video": data.video[:64], "text": data.text[:64]})
    # the stitch receives the host-replicated FULL batch plus the global
    # shape; the sharding's own device→rows map decides placement
    assert captured[16] == ((64, 16), (64, 16))

    # 60 rows: not divisible by the 8-device data axis ->
    # replicated plain path, no stitch attempted
    captured.clear()
    v, t = tr.encode(state, {"video": data.video[:60], "text": data.text[:60]})
    assert not captured and v.shape == (60, 8) and t.shape == (60, 8)


def test_crossclr_fused_matches_crossclr_single_device():
    """loss='crossclr_fused' (pruned rect kernels, interpret off-TPU) takes
    one step identical to loss='crossclr' (jnp) — the full paper loss has
    a drop-in fused backend."""
    from crossclr_tpu.data import SyntheticPairs, epoch_batches

    data = SyntheticPairs(num_pairs=128, video_dim=48, text_dim=32, seed=0)
    vc = TowerConfig(kind="mlp", input_dim=48, embed_dim=32, hidden_dim=64,
                     dtype=jnp.float32)
    tc = TowerConfig(kind="mlp", input_dim=32, embed_dim=32, hidden_dim=64,
                     dtype=jnp.float32)

    def one_step(loss):
        cfg = TrainConfig(loss=loss, learning_rate=1e-3, warmup_steps=10,
                          total_steps=100, temperature=0.1)
        tr = Trainer(vc, tc, cfg, mesh=None)
        batch = next(epoch_batches(data, 64, shuffle=False))
        state = tr.init_state(batch["video"], batch["text"])
        _, m = tr.train_step(state, batch)
        return m

    m_f = one_step("crossclr_fused")
    m_j = one_step("crossclr")
    np.testing.assert_allclose(
        float(m_f["loss"]), float(m_j["loss"]), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        float(m_f["grad_norm"]), float(m_j["grad_norm"]), rtol=1e-3
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_crossclr_fused_global_matches_single_device():
    """loss='crossclr_fused' + global negatives: the pruned rect kernels
    run per-device inside shard_map and one step matches the unsharded
    jnp crossclr step."""
    from crossclr_tpu.data import SyntheticPairs, epoch_batches
    from crossclr_tpu.parallel import make_mesh

    data = SyntheticPairs(num_pairs=256, video_dim=48, text_dim=32, seed=0)
    vc = TowerConfig(kind="mlp", input_dim=48, embed_dim=32, hidden_dim=64,
                     dtype=jnp.float32)
    tc = TowerConfig(kind="mlp", input_dim=32, embed_dim=32, hidden_dim=64,
                     dtype=jnp.float32)

    def one_step(loss, mesh):
        cfg = TrainConfig(loss=loss, learning_rate=1e-3, warmup_steps=10,
                          total_steps=100, temperature=0.1)
        tr = Trainer(vc, tc, cfg, mesh=mesh)
        batch = next(epoch_batches(data, 64, shuffle=False))
        state = tr.init_state(batch["video"], batch["text"])
        _, m = tr.train_step(state, batch)
        return m

    m_f = one_step("crossclr_fused", make_mesh())
    m_j = one_step("crossclr", None)
    np.testing.assert_allclose(
        float(m_f["loss"]), float(m_j["loss"]), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        float(m_f["grad_norm"]), float(m_j["grad_norm"]), rtol=1e-3
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_flash_attention_demoted_on_multidevice_mesh(capsys):
    """attention='flash' towers on a multi-device mesh fall back to 'xla'
    (a pallas_call cannot be partitioned by GSPMD) with a stderr note;
    single-device trainers keep flash."""
    from crossclr_tpu.parallel import make_mesh

    vc = TowerConfig(kind="transformer", input_dim=16, embed_dim=16,
                     hidden_dim=32, num_layers=1, num_heads=2, max_seq_len=4,
                     dtype=jnp.float32, attention="flash")
    tc = TowerConfig(kind="transformer", input_dim=12, embed_dim=16,
                     hidden_dim=32, num_layers=1, num_heads=2, max_seq_len=4,
                     dtype=jnp.float32, attention="flash")

    tr = Trainer(vc, tc, TrainConfig(total_steps=5), mesh=make_mesh())
    assert tr.video_cfg.attention == "xla"
    assert tr.text_cfg.attention == "xla"
    assert "flash" in capsys.readouterr().err

    tr1 = Trainer(vc, tc, TrainConfig(total_steps=5), mesh=None)
    assert tr1.video_cfg.attention == "flash"


def test_crossclr_fused_odd_batch_falls_back():
    """Batches outside the kernel tiling (here 50 rows) fall back to the
    jnp cross_clr on every backend, interpret mode included."""
    from crossclr_tpu.losses import cross_clr
    from crossclr_tpu.ops import cross_clr_fused

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((50, 32)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((50, 32)), jnp.float32)
    got = float(cross_clr_fused(v, t, interpret=True))
    want = float(cross_clr(v, t))
    np.testing.assert_allclose(got, want, rtol=2e-5)


@pytest.mark.parametrize("loss", ["crossclr_intra", "crossclr"])
def test_variable_length_masks_flow_through_training(loss):
    """SyntheticPairs(variable_lengths=True) emits [N, S] masks that reach
    the towers: perturbing a PADDED frame's features must not change the
    loss (masked attention + masked mean pooling), while perturbing a
    VALID frame must.  loss='crossclr' additionally exercises the
    CONNECTIVITY path — its input pooling must be masked too, even for
    NON-ZERO padding content (real stores pad by repeating frames)."""
    from crossclr_tpu.data import SyntheticPairs, epoch_batches

    data = SyntheticPairs(
        num_pairs=64, video_dim=16, text_dim=12,
        video_seq_len=6, text_seq_len=4, variable_lengths=True, seed=0,
    )
    assert data.video_mask.shape == (64, 6)
    assert data.text_mask.shape == (64, 4)

    vc = TowerConfig(kind="transformer", input_dim=16, embed_dim=16,
                     hidden_dim=32, num_layers=1, num_heads=2, max_seq_len=8,
                     dtype=jnp.float32)
    tc = TowerConfig(kind="transformer", input_dim=12, embed_dim=16,
                     hidden_dim=32, num_layers=1, num_heads=2, max_seq_len=8,
                     dtype=jnp.float32)
    tr = Trainer(vc, tc, TrainConfig(loss=loss, total_steps=10, warmup_steps=2))
    batch = next(epoch_batches(data, 32, shuffle=False))
    assert set(batch) == {"video", "text", "video_mask", "text_mask"}
    state = tr.init_state(batch["video"], batch["text"])
    # the step donates the state buffers: snapshot to host and rebuild a
    # fresh identical state per call
    host_state = jax.tree.map(np.array, state)
    fresh = lambda: jax.tree.map(jnp.asarray, host_state)  # noqa: E731
    _, m0 = tr.train_step(fresh(), batch)

    # find a row with padding and poke a padded frame
    row = int(np.argmin(batch["video_mask"].sum(axis=1)))
    pad_pos = int(np.argmin(batch["video_mask"][row]))
    assert batch["video_mask"][row, pad_pos] == 0.0
    poked = dict(batch)
    poked["video"] = np.array(batch["video"])
    poked["video"][row, pad_pos] += 100.0
    _, m1 = tr.train_step(fresh(), poked)
    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]), rtol=1e-6)

    valid_pos = int(np.argmax(batch["video_mask"][row]))
    poked["video"] = np.array(batch["video"])
    poked["video"][row, valid_pos] += 100.0
    _, m2 = tr.train_step(fresh(), poked)
    assert abs(float(m2["loss"]) - float(m0["loss"])) > 1e-4


def test_steps_per_call_matches_sequential_steps():
    """The scanned multi-step dispatch (cfg.steps_per_call > 1) must
    produce the same state/metrics as the same number of sequential
    train_step calls on the same batch sequence."""
    from crossclr_tpu.data import SyntheticPairs

    data = SyntheticPairs(num_pairs=128, video_dim=24, text_dim=16, seed=0)
    vc = TowerConfig(kind="mlp", input_dim=24, embed_dim=16, hidden_dim=32,
                     dtype=jnp.float32)
    tc = TowerConfig(kind="mlp", input_dim=16, embed_dim=16, hidden_dim=32,
                     dtype=jnp.float32)

    def build(spc):
        cfg = TrainConfig(loss="crossclr_intra", total_steps=20,
                          warmup_steps=2, steps_per_call=spc)
        tr = Trainer(vc, tc, cfg, mesh=None)
        st = tr.init_state(data.video[:2], data.text[:2])
        return tr, st

    import itertools

    batches = list(itertools.islice(infinite_batches(data, 32, seed=0), 6))

    tr1, st1 = build(1)
    for b in batches:
        st1, m1 = tr1.train_step(st1, b)

    tr4, st4 = build(4)  # 6 steps = chunks of 4 + 2 (jit respecializes)
    st4, history = tr4.fit(st4, iter(batches), steps=6, log_every=2)

    flat1 = jax.tree.leaves(st1.params)
    flat4 = jax.tree.leaves(st4.params)
    for a, b in zip(flat1, flat4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    assert int(st4.step) == 6
    np.testing.assert_allclose(history[-1]["loss"], float(m1["loss"]),
                               rtol=1e-6)
    # log boundaries still honored at chunk granularity: steps 4 and 6
    assert [h["step"] for h in history] == [4, 6]


def test_train_steps_stacked_metrics():
    from crossclr_tpu.data import SyntheticPairs

    data = SyntheticPairs(num_pairs=64, video_dim=24, text_dim=16, seed=1)
    vc = TowerConfig(kind="mlp", input_dim=24, embed_dim=16, hidden_dim=32,
                     dtype=jnp.float32)
    tc = TowerConfig(kind="mlp", input_dim=16, embed_dim=16, hidden_dim=32,
                     dtype=jnp.float32)
    tr = Trainer(vc, tc, TrainConfig(loss="crossclr_intra", total_steps=10,
                                     warmup_steps=2, steps_per_call=3))
    st = tr.init_state(data.video[:2], data.text[:2])
    stacked = {
        "video": jnp.stack([data.video[:32], data.video[32:64]]),
        "text": jnp.stack([data.text[:32], data.text[32:64]]),
    }
    st, metrics = tr.train_steps(st, stacked)
    assert metrics["loss"].shape == (2,)
    assert int(st.step) == 2
    assert np.isfinite(np.asarray(metrics["loss"])).all()


def test_stacked_bytes_guard(capsys):
    """The steps_per_call x batch-bytes footgun is guarded at trace time
    (TrainConfig.max_stacked_bytes): fit() degrades to sequential
    single-step dispatch with a clear message — same final state — and a
    direct train_steps() call raises with the computed sizes; 0 disables."""
    import dataclasses
    import itertools

    from crossclr_tpu.data import SyntheticPairs

    data = SyntheticPairs(num_pairs=128, video_dim=24, text_dim=16, seed=3)
    vc = TowerConfig(kind="mlp", input_dim=24, embed_dim=16, hidden_dim=32,
                     dtype=jnp.float32)
    tc = TowerConfig(kind="mlp", input_dim=16, embed_dim=16, hidden_dim=32,
                     dtype=jnp.float32)
    per_batch = 32 * (24 + 16) * 4  # fp32 bytes of one 32-row batch
    cfg = TrainConfig(loss="crossclr_intra", total_steps=10, warmup_steps=2,
                      steps_per_call=4, max_stacked_bytes=2 * per_batch)
    batches = list(itertools.islice(infinite_batches(data, 32, seed=0), 4))

    tr = Trainer(vc, tc, cfg, mesh=None)
    st = tr.init_state(data.video[:2], data.text[:2])
    st, history = tr.fit(st, iter(batches), steps=4, log_every=1)
    assert int(st.step) == 4
    err = capsys.readouterr().err
    assert "falling back to sequential" in err
    assert err.count("falling back") == 1  # warned once, not per chunk
    # sequential fallback logs at single-step granularity again
    assert [h["step"] for h in history] == [1, 2, 3, 4]

    # same final params as an unguarded sequential run
    tr_ref = Trainer(vc, tc, dataclasses.replace(cfg, steps_per_call=1),
                     mesh=None)
    st_ref = tr_ref.init_state(data.video[:2], data.text[:2])
    for b in batches:
        st_ref, _ = tr_ref.train_step(st_ref, b)
    for a, b in zip(jax.tree.leaves(st.params), jax.tree.leaves(st_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)

    # a direct train_steps call (the prestacked multi-host path) raises
    # with the arithmetic instead of OOMing at transfer time
    tr2 = Trainer(vc, tc, cfg, mesh=None)
    st2 = tr2.init_state(data.video[:2], data.text[:2])
    stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    with pytest.raises(ValueError, match="chunk budget"):
        tr2.train_steps(st2, stacked)

    # 0 disables the guard entirely
    tr3 = Trainer(vc, tc, dataclasses.replace(cfg, max_stacked_bytes=0),
                  mesh=None)
    st3 = tr3.init_state(data.video[:2], data.text[:2])
    st3, metrics = tr3.train_steps(st3, stacked)
    assert int(st3.step) == 4
    assert np.isfinite(np.asarray(metrics["loss"])).all()


def test_steps_per_call_with_global_negatives_mesh():
    """spc > 1 composes with the shard_map global-negative step (scan over
    the sharded step inside one jit on the 8-device mesh)."""
    from crossclr_tpu.data import SyntheticPairs
    from crossclr_tpu.parallel import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU backend")
    data = SyntheticPairs(num_pairs=128, video_dim=24, text_dim=16, seed=2)
    vc = TowerConfig(kind="mlp", input_dim=24, embed_dim=16, hidden_dim=32,
                     dtype=jnp.float32)
    tc = TowerConfig(kind="mlp", input_dim=16, embed_dim=16, hidden_dim=32,
                     dtype=jnp.float32)
    mesh = make_mesh()
    cfg = TrainConfig(loss="crossclr_intra", total_steps=10, warmup_steps=2,
                      global_negatives=True, steps_per_call=2)
    tr = Trainer(vc, tc, cfg, mesh=mesh)
    st = tr.init_state(data.video[:2], data.text[:2])
    st, history = tr.fit(
        st, infinite_batches(data, 32, seed=0), steps=4, log_every=2
    )
    assert int(st.step) == 4
    assert np.isfinite(history[-1]["loss"])


def test_fit_aborts_on_nonfinite_loss():
    """A poisoned batch (NaN features) must raise FloatingPointError at
    the next log boundary instead of silently training on."""
    from crossclr_tpu.data import SyntheticPairs

    data = SyntheticPairs(num_pairs=64, video_dim=24, text_dim=16, seed=3)
    vc = TowerConfig(kind="mlp", input_dim=24, embed_dim=16, hidden_dim=32,
                     dtype=jnp.float32)
    tc = TowerConfig(kind="mlp", input_dim=16, embed_dim=16, hidden_dim=32,
                     dtype=jnp.float32)
    tr = Trainer(vc, tc, TrainConfig(loss="crossclr_intra", total_steps=10,
                                     warmup_steps=2))
    st = tr.init_state(data.video[:2], data.text[:2])

    poisoned = np.array(data.video[:32])
    poisoned[0, 0] = np.nan
    batches = iter([
        {"video": data.video[:32], "text": data.text[:32]},
        {"video": poisoned, "text": data.text[:32]},
        {"video": data.video[32:64], "text": data.text[32:64]},
    ])
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        tr.fit(st, batches, steps=3, log_every=1)

    # opting out keeps the old keep-going behavior
    tr2 = Trainer(vc, tc, TrainConfig(loss="crossclr_intra", total_steps=10,
                                      warmup_steps=2,
                                      abort_on_nonfinite=False))
    st2 = tr2.init_state(data.video[:2], data.text[:2])
    batches = iter([
        {"video": poisoned, "text": data.text[:32]},
        {"video": data.video[32:64], "text": data.text[32:64]},
    ])
    _, history = tr2.fit(st2, batches, steps=2, log_every=1)
    assert len(history) == 2


def test_prestacked_fit_matches_sequential():
    """fit(prestacked=True) over data.stack_batches chunks == sequential
    single steps, including a limit-trimmed final chunk (5 steps from
    2-step chunks)."""
    import itertools

    from crossclr_tpu.data import SyntheticPairs, stack_batches

    data = SyntheticPairs(num_pairs=128, video_dim=24, text_dim=16, seed=4)
    vc = TowerConfig(kind="mlp", input_dim=24, embed_dim=16, hidden_dim=32,
                     dtype=jnp.float32)
    tc = TowerConfig(kind="mlp", input_dim=16, embed_dim=16, hidden_dim=32,
                     dtype=jnp.float32)

    def build(spc):
        cfg = TrainConfig(loss="crossclr_intra", total_steps=20,
                          warmup_steps=2, steps_per_call=spc)
        tr = Trainer(vc, tc, cfg, mesh=None)
        return tr, tr.init_state(data.video[:2], data.text[:2])

    batches = list(itertools.islice(infinite_batches(data, 32, seed=0), 6))

    tr1, st1 = build(1)
    for b in batches[:5]:
        st1, m1 = tr1.train_step(st1, b)

    tr2, st2 = build(2)
    st2, history = tr2.fit(
        st2, stack_batches(iter(batches), 2), steps=5, log_every=2,
        prestacked=True,
    )
    assert int(st2.step) == 5  # 2 + 2 + limit-trimmed 1
    for a, b in zip(jax.tree.leaves(st1.params), jax.tree.leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(history[-1]["loss"], float(m1["loss"]),
                               rtol=1e-6)


def test_stack_batches_groups_and_tail():
    from crossclr_tpu.data import stack_batches

    batches = [
        {"video": np.full((4, 3), i, np.float32),
         "text": np.full((4, 2), -i, np.float32)}
        for i in range(5)
    ]
    chunks = list(stack_batches(iter(batches), 2))
    assert [c["video"].shape for c in chunks] == [(2, 4, 3)] * 2 + [(1, 4, 3)]
    np.testing.assert_array_equal(chunks[1]["video"][1], batches[3]["video"])
    np.testing.assert_array_equal(chunks[2]["text"][0], batches[4]["text"])


def _grads_close(tr_a, st_a, tr_b, st_b, batch, rtol=1e-5, atol=1e-6):
    st_a2, m_a = tr_a.train_step(st_a, batch)
    st_b2, m_b = tr_b.train_step(st_b, batch)
    np.testing.assert_allclose(
        float(m_a["loss"]), float(m_b["loss"]), rtol=rtol
    )
    np.testing.assert_allclose(
        float(m_a["grad_norm"]), float(m_b["grad_norm"]), rtol=1e-4
    )
    for a, b in zip(jax.tree.leaves(st_a2.params), jax.tree.leaves(st_b2.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=atol
        )


@pytest.mark.parametrize("loss", ["crossclr_intra", "crossclr"])
def test_embedding_chunk_matches_plain_step(loss):
    """GradCache-style two-pass gradients == the ordinary step: the
    contrastive coupling spans the FULL batch either way (unlike gradient
    accumulation, which would shrink the negative pool)."""
    from crossclr_tpu.data import SyntheticPairs

    data = SyntheticPairs(num_pairs=64, video_dim=24, text_dim=16, seed=5)
    vc = TowerConfig(kind="mlp", input_dim=24, embed_dim=16, hidden_dim=32,
                     dtype=jnp.float32)
    tc = TowerConfig(kind="mlp", input_dim=16, embed_dim=16, hidden_dim=32,
                     dtype=jnp.float32)

    def build(chunk):
        cfg = TrainConfig(loss=loss, total_steps=10, warmup_steps=2,
                          embedding_chunk=chunk)
        tr = Trainer(vc, tc, cfg, mesh=None)
        return tr, tr.init_state(data.video[:2], data.text[:2])

    batch = {"video": data.video[:32], "text": data.text[:32]}
    tr_p, st_p = build(None)
    tr_c, st_c = build(8)  # 4 chunks
    _grads_close(tr_p, st_p, tr_c, st_c, batch)


def test_embedding_chunk_learnable_temperature():
    """logit_scale gradients flow through pass 2 (the loss differentiates
    w.r.t. the parameter directly, not through the towers)."""
    from crossclr_tpu.data import SyntheticPairs

    data = SyntheticPairs(num_pairs=32, video_dim=24, text_dim=16, seed=6)
    vc = TowerConfig(kind="mlp", input_dim=24, embed_dim=16, hidden_dim=32,
                     dtype=jnp.float32)
    tc = TowerConfig(kind="mlp", input_dim=16, embed_dim=16, hidden_dim=32,
                     dtype=jnp.float32)

    def build(chunk):
        cfg = TrainConfig(loss="crossclr_intra", total_steps=10,
                          warmup_steps=2, learnable_temperature=True,
                          embedding_chunk=chunk)
        tr = Trainer(vc, tc, cfg, mesh=None)
        return tr, tr.init_state(data.video[:2], data.text[:2])

    batch = {"video": data.video, "text": data.text}
    tr_p, st_p = build(None)
    tr_c, st_c = build(16)
    for _ in range(3):  # past the 2-step lr warmup so the param moves
        st_p, _ = tr_p.train_step(st_p, batch)
        st_c, _ = tr_c.train_step(st_c, batch)
    # the scale parameter moved, and identically on both paths
    assert float(st_c.params["logit_scale"]) != 0.0
    np.testing.assert_allclose(
        float(st_p.params["logit_scale"]),
        float(st_c.params["logit_scale"]),
        rtol=1e-6,
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_embedding_chunk_with_global_negatives():
    """Two-pass composes with the shard_map global-negative step: chunking
    happens per device shard, the loss still couples the GLOBAL batch."""
    from crossclr_tpu.data import SyntheticPairs, epoch_batches
    from crossclr_tpu.parallel import make_mesh

    mesh = make_mesh()
    data = SyntheticPairs(num_pairs=128, video_dim=24, text_dim=16, seed=7)
    vc = TowerConfig(kind="mlp", input_dim=24, embed_dim=16, hidden_dim=32,
                     dtype=jnp.float32)
    tc = TowerConfig(kind="mlp", input_dim=16, embed_dim=16, hidden_dim=32,
                     dtype=jnp.float32)

    def build(chunk, use_mesh):
        cfg = TrainConfig(loss="crossclr_intra", total_steps=10,
                          warmup_steps=2, embedding_chunk=chunk)
        tr = Trainer(vc, tc, cfg, mesh=use_mesh)
        return tr, tr.init_state(data.video[:2], data.text[:2])

    batch = next(epoch_batches(data, 64, shuffle=False))
    # 64 rows / 8 devices = 8 per shard; chunk 4 -> 2 chunks per shard
    tr_g, st_g = build(4, mesh)
    tr_1, st_1 = build(None, None)
    _grads_close(tr_g, st_g, tr_1, st_1, batch, rtol=2e-5, atol=1e-6)


def test_embedding_chunk_must_divide_batch():
    from crossclr_tpu.data import SyntheticPairs

    data = SyntheticPairs(num_pairs=32, video_dim=24, text_dim=16, seed=8)
    vc = TowerConfig(kind="mlp", input_dim=24, embed_dim=16, hidden_dim=32,
                     dtype=jnp.float32)
    tc = TowerConfig(kind="mlp", input_dim=16, embed_dim=16, hidden_dim=32,
                     dtype=jnp.float32)
    tr = Trainer(vc, tc, TrainConfig(loss="crossclr_intra", total_steps=10,
                                     warmup_steps=2, embedding_chunk=7))
    st = tr.init_state(data.video[:2], data.text[:2])
    with pytest.raises(ValueError, match="does not divide"):
        tr.train_step(st, {"video": data.video, "text": data.text})


def test_embedding_chunk_is_an_upper_bound():
    """chunk >= per-device batch (the k=1 degenerate) runs the PLAIN step:
    the memory cap already holds and a two-pass would only re-run the
    towers.  One config therefore stays valid across slice sizes — e.g.
    podslice_32k's chunk=1024 on a 64-chip slice (512 rows/device) must
    not raise, and must match the unchunked step bitwise (it IS the
    unchunked step)."""
    from crossclr_tpu.data import SyntheticPairs

    data = SyntheticPairs(num_pairs=32, video_dim=24, text_dim=16, seed=8)
    vc = TowerConfig(kind="mlp", input_dim=24, embed_dim=16, hidden_dim=32,
                     dtype=jnp.float32)
    tc = TowerConfig(kind="mlp", input_dim=16, embed_dim=16, hidden_dim=32,
                     dtype=jnp.float32)
    batch = {"video": data.video[:16], "text": data.text[:16]}

    def run(chunk):
        tr = Trainer(vc, tc, TrainConfig(loss="crossclr_intra",
                                         total_steps=10, warmup_steps=2,
                                         embedding_chunk=chunk))
        st = tr.init_state(data.video[:2], data.text[:2])
        st, m = tr.train_step(st, batch)
        return st, m

    # 24 > 16 rows and 24 does NOT divide 16 — the old semantics raised
    st_c, m_c = run(24)
    st_p, m_p = run(None)
    assert float(m_c["loss"]) == float(m_p["loss"])
    for a, b in zip(jax.tree.leaves(st_c.params), jax.tree.leaves(st_p.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_embedding_chunk_transformer_dropout_deterministic():
    """Two-pass with dropout: pass 3's vjp regenerates pass 1's exact
    masks (keys are pure functions of seed/step/chunk), so repeated steps
    from identical state produce identical updates, and training is
    finite with sequence towers + masks."""
    rng = np.random.default_rng(9)
    n, s, dv = 32, 5, 16
    video = rng.standard_normal((n, s, dv)).astype(np.float32)
    text = rng.standard_normal((n, 12)).astype(np.float32)
    mask = np.ones((n, s), np.float32)
    mask[:, 4:] = 0.0

    vc = TowerConfig(kind="transformer", input_dim=dv, embed_dim=16,
                     hidden_dim=32, num_layers=1, num_heads=2,
                     max_seq_len=s, dropout=0.3, dtype=jnp.float32)
    tc = TowerConfig(kind="mlp", input_dim=12, embed_dim=16, hidden_dim=32,
                     dtype=jnp.float32)
    cfg = TrainConfig(loss="crossclr_intra", total_steps=10, warmup_steps=1,
                      embedding_chunk=8)
    batch = {"video": video, "text": text, "video_mask": mask}

    def run():
        tr = Trainer(vc, tc, cfg, mesh=None)
        st = tr.init_state(video[:2], text[:2])
        st, m = tr.train_step(st, batch)
        return st, float(m["loss"])

    st_a, loss_a = run()
    st_b, loss_b = run()
    assert np.isfinite(loss_a)
    assert loss_a == loss_b
    for a, b in zip(jax.tree.leaves(st_a.params), jax.tree.leaves(st_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_checkpoint_restores_across_mesh_topologies(tmp_path):
    """A checkpoint written under one mesh restores into a DIFFERENT
    topology — dp=8 → dp=4×tp=2 (Megatron-sharded params/moments) and
    dp=8 → single device.  Orbax reshards on load from the template's
    shardings, so changing pod topology between runs is a restore, not a
    retrain; the resumed step is numerically identical either way."""
    from crossclr_tpu.data import SyntheticPairs, epoch_batches
    from crossclr_tpu.parallel import data_sharding, make_mesh

    data = SyntheticPairs(num_pairs=128, video_dim=48, text_dim=32, seed=0)
    vc = TowerConfig(kind="mlp", input_dim=48, embed_dim=32, hidden_dim=64,
                     dtype=jnp.float32)
    tc = TowerConfig(kind="mlp", input_dim=32, embed_dim=32, hidden_dim=64,
                     dtype=jnp.float32)
    cfg = TrainConfig(total_steps=10, warmup_steps=2)
    batches = list(epoch_batches(data, 32, shuffle=False))[:3]

    def put(mesh, b):
        if mesh is None:
            return b
        sh = data_sharding(mesh)
        return {k: jax.device_put(jnp.asarray(v), sh) for k, v in b.items()}

    mesh_a = make_mesh(n_data=8, n_model=1)
    tr_a = Trainer(vc, tc, cfg, mesh=mesh_a)
    st = tr_a.init_state(batches[0]["video"], batches[0]["text"])
    for b in batches[:2]:
        st, _ = tr_a.train_step(st, put(mesh_a, b))
    mngr = CheckpointManager(tmp_path / "ckpt")
    mngr.save(2, st, wait=True)
    # the step after the checkpoint, still on topology A (train_step
    # donates its input state, so this must come after the save)
    _, m_a = tr_a.train_step(st, put(mesh_a, batches[2]))
    mngr.close()

    for n_data, n_model in ((4, 2), (1, 1)):
        mesh_b = (
            make_mesh(n_data=n_data, n_model=n_model)
            if n_data * n_model > 1
            else None
        )
        tr_b = Trainer(vc, tc, cfg, mesh=mesh_b)
        template = tr_b.init_state(batches[0]["video"], batches[0]["text"])
        if n_model > 1:  # template really is Megatron-sharded
            assert "model" in str(
                template.params["video_tower"]["fc1"]["kernel"].sharding.spec
            )
        st_b = CheckpointManager(tmp_path / "ckpt").restore(template)
        assert int(st_b.step) == 2
        if n_model > 1:  # restore kept the template's TP sharding
            assert "model" in str(
                st_b.params["video_tower"]["fc1"]["kernel"].sharding.spec
            )
        _, m_b = tr_b.train_step(st_b, put(mesh_b, batches[2]))
        np.testing.assert_allclose(
            float(m_b["loss"]), float(m_a["loss"]), rtol=1e-5,
            err_msg=f"resume on dp={n_data},tp={n_model}",
        )


def test_lamb_optimizer_trains_and_shards():
    """TrainConfig.optimizer='lamb' (large-batch regime, config 5): the
    step trains the loss down, and under a dp x tp mesh the LAMB moment
    tree shards like the params (same param-shaped mu/nu structure the
    generic moment-placement walks)."""
    from crossclr_tpu.parallel import data_sharding, make_mesh

    data = SyntheticPairs(num_pairs=256, video_dim=48, text_dim=32, seed=0)
    vc = TowerConfig(kind="mlp", input_dim=48, embed_dim=32, hidden_dim=64,
                     dtype=jnp.float32)
    tc = TowerConfig(kind="mlp", input_dim=32, embed_dim=32, hidden_dim=64,
                     dtype=jnp.float32)
    cfg = TrainConfig(optimizer="lamb", learning_rate=1e-3, warmup_steps=5,
                      total_steps=100, temperature=0.1)
    trainer = Trainer(vc, tc, cfg, mesh=None)
    batch = next(epoch_batches(data, 64, shuffle=False))
    state = trainer.init_state(batch["video"], batch["text"])
    first = None
    for _ in range(40):
        state, m = trainer.train_step(state, batch)
        if first is None:
            first = float(m["loss"])
    last = float(m["loss"])
    assert np.isfinite(last) and last < first - 0.3, (first, last)

    mesh = make_mesh(n_data=4, n_model=2)
    tr_tp = Trainer(vc, tc, cfg, mesh=mesh)
    st_tp = tr_tp.init_state(batch["video"], batch["text"])
    # a TP-sharded param implies its LAMB moments are sharded the same
    # way (apply_gradients would otherwise insert resharding copies)
    kernel_spec = str(
        st_tp.params["video_tower"]["fc1"]["kernel"].sharding.spec
    )
    assert "model" in kernel_spec
    mu_leaves = [
        leaf
        for leaf in jax.tree.leaves(
            st_tp.opt_state,
            is_leaf=lambda x: hasattr(x, "sharding"),
        )
        if hasattr(x := leaf, "sharding")
        and x.shape == st_tp.params["video_tower"]["fc1"]["kernel"].shape
    ]
    assert mu_leaves and all(
        "model" in str(leaf.sharding.spec) for leaf in mu_leaves
    )
    sh = data_sharding(mesh)
    dbatch = {k: jax.device_put(jnp.asarray(v), sh) for k, v in batch.items()}
    _, m_tp = tr_tp.train_step(st_tp, dbatch)
    assert np.isfinite(float(m_tp["loss"]))


def test_unknown_optimizer_raises():
    from crossclr_tpu.training.trainer import make_optimizer

    with pytest.raises(ValueError, match="adamw"):
        make_optimizer(TrainConfig(optimizer="sgd"))
