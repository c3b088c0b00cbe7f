"""Blockwise (flash) and ring attention tests (SURVEY.md §5 long-context).

Flash kernels run through the Pallas interpreter on CPU; ring attention
runs on the real 8-virtual-device mesh from conftest.  The oracle is
``ops.flash_attention.mha_reference`` (plain jnp attention).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crossclr_tpu.ops.flash_attention import (
    flash_attention,
    flash_supported,
    mha_reference,
)

ON_TPU = jax.default_backend() == "tpu"
INTERPRET = not ON_TPU

needs_multidevice = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _qkv(rng, b=2, h=4, s=64, dh=24):
    mk = lambda: jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    return mk(), mk(), mk()


@pytest.mark.parametrize("masked", [False, True])
def test_flash_matches_reference(rng, masked):
    q, k, v = _qkv(rng)
    mask = None
    if masked:
        mask = jnp.asarray(rng.random((2, 64)) > 0.3, jnp.float32)
        mask = mask.at[1, :].set(0.0)  # fully-masked sequence -> zeros
    want = mha_reference(q, k, v, mask)
    got = flash_attention(q, k, v, mask, use_pallas=True,
                          interpret=INTERPRET, precision="highest")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("masked", [False, True])
def test_flash_gradients_match_reference(rng, masked):
    q, k, v = _qkv(rng, s=32)
    mask = (
        jnp.asarray(rng.random((2, 32)) > 0.3, jnp.float32) if masked else None
    )

    def loss(fn):
        return lambda *a: jnp.sum(jnp.sin(fn(*a, mask)))

    want = jax.grad(loss(mha_reference), argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(
        loss(
            lambda q_, k_, v_, m_: flash_attention(
                q_, k_, v_, m_, use_pallas=True, interpret=INTERPRET,
                precision="highest",
            )
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    # compiled Mosaic's VPU exp is ~1e-5 rel off XLA's and the remat
    # backward amplifies it on small entries (same allowance as the loss
    # kernel tests); interpret mode matches tightly
    rtol, atol = (5e-3, 2e-4) if ON_TPU else (1e-4, 1e-5)
    for g_w, g_g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g_g), np.asarray(g_w),
                                   rtol=rtol, atol=atol)


@pytest.mark.parametrize("masked", [False, True])
def test_flash_dropout_matches_oracle(rng, masked):
    """Attention-probability dropout: the kernel's in-tile hash mask must
    reproduce the jnp oracle (which materializes the SAME mask via
    dropout_keep_mask) bit-for-bit in which entries it drops."""
    q, k, v = _qkv(rng)
    mask = None
    if masked:
        mask = jnp.asarray(rng.random((2, 64)) > 0.3, jnp.float32)
        mask = mask.at[1, :].set(0.0)  # fully-masked row stays zero
    want = mha_reference(q, k, v, mask, dropout_rate=0.3, dropout_seed=7)
    got = flash_attention(q, k, v, mask, use_pallas=True,
                          interpret=INTERPRET, precision="highest",
                          dropout_rate=0.3, dropout_seed=7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    if masked:
        assert np.all(np.asarray(got)[1] == 0.0)


@pytest.mark.parametrize("masked", [False, True])
def test_flash_dropout_gradients_match_oracle(rng, masked):
    """dq/dk/dv under probability dropout: the dq and transposed dk/dv
    kernels each regenerate the forward's mask from their own tile index
    grids; autodiff through the oracle (same mask) is ground truth."""
    q, k, v = _qkv(rng, s=32)
    mask = (
        jnp.asarray(rng.random((2, 32)) > 0.3, jnp.float32) if masked else None
    )

    def loss(fn):
        return lambda *a: jnp.sum(jnp.sin(fn(*a)))

    want = jax.grad(
        loss(lambda q_, k_, v_: mha_reference(
            q_, k_, v_, mask, dropout_rate=0.25, dropout_seed=11)),
        argnums=(0, 1, 2),
    )(q, k, v)
    got = jax.grad(
        loss(lambda q_, k_, v_: flash_attention(
            q_, k_, v_, mask, use_pallas=True, interpret=INTERPRET,
            precision="highest", dropout_rate=0.25, dropout_seed=11)),
        argnums=(0, 1, 2),
    )(q, k, v)
    rtol, atol = (5e-3, 2e-4) if ON_TPU else (1e-4, 1e-5)
    for g_w, g_g in zip(want, got):
        assert np.all(np.isfinite(np.asarray(g_g)))
        np.testing.assert_allclose(np.asarray(g_g), np.asarray(g_w),
                                   rtol=rtol, atol=atol)


def test_flash_dropout_mask_statistics():
    """The hash mask behaves like iid Bernoulli(1-rate): drop fraction
    within 3 sigma at every rate, different seeds decorrelate, and the
    per-(batch*head) term decorrelates heads."""
    from crossclr_tpu.ops.flash_attention import dropout_keep_mask

    b, h, s = 2, 4, 128
    n = b * h * s * s
    for rate in (0.1, 0.5, 0.9):
        keep = np.asarray(dropout_keep_mask(b, h, s, 3, rate))
        frac = 1.0 - keep.mean()
        sigma = (rate * (1 - rate) / n) ** 0.5
        assert abs(frac - rate) < 3.5 * sigma, (rate, frac)
    k1 = np.asarray(dropout_keep_mask(b, h, s, 1, 0.5))
    k2 = np.asarray(dropout_keep_mask(b, h, s, 2, 0.5))
    agree = (k1 == k2).mean()
    assert 0.45 < agree < 0.55  # independent masks agree ~50% at rate 0.5
    heads = np.asarray(dropout_keep_mask(1, 2, s, 1, 0.5))
    agree_h = (heads[0, 0] == heads[0, 1]).mean()
    assert 0.45 < agree_h < 0.55


def test_flash_dropout_zero_rate_is_identity(rng):
    q, k, v = _qkv(rng)
    base = flash_attention(q, k, v, use_pallas=True, interpret=INTERPRET,
                           precision="highest")
    got = flash_attention(q, k, v, use_pallas=True, interpret=INTERPRET,
                          precision="highest", dropout_rate=0.0,
                          dropout_seed=123)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(base))
    with pytest.raises(ValueError, match="dropout_rate"):
        flash_attention(q, k, v, dropout_rate=1.0)


def test_flash_dropout_seed_is_traced(rng):
    """One compiled kernel serves every step's fresh mask: the seed is a
    traced SMEM scalar, so new seeds hit the jit cache."""
    q, k, v = _qkv(rng, s=32)
    f = jax.jit(
        lambda seed: flash_attention(
            q, k, v, use_pallas=True, interpret=INTERPRET,
            dropout_rate=0.5, dropout_seed=seed,
        )
    )
    o1 = f(jnp.asarray(1, jnp.int32))
    o2 = f(jnp.asarray(2, jnp.int32))
    assert f._cache_size() == 1
    assert not np.array_equal(np.asarray(o1), np.asarray(o2))


def test_tower_flash_probability_dropout(rng):
    """The flash tower path applies probability dropout under train=True
    (rng-keyed, so two rng keys differ) and is deterministic/identical to
    the dropout-free tower at eval."""
    from crossclr_tpu.models import TowerConfig, TransformerTower

    cfg = TowerConfig(
        kind="transformer", input_dim=20, embed_dim=32, hidden_dim=48,
        num_heads=4, max_seq_len=16, dtype=jnp.float32, attention="flash",
        dropout=0.4,
    )
    cfg_nodrop = TowerConfig(
        kind="transformer", input_dim=20, embed_dim=32, hidden_dim=48,
        num_heads=4, max_seq_len=16, dtype=jnp.float32, attention="flash",
    )
    x = jnp.asarray(rng.standard_normal((4, 16, 20)), jnp.float32)
    mask = jnp.asarray(rng.random((4, 16)) > 0.2, jnp.float32)

    tower = TransformerTower(cfg)
    params = tower.init(jax.random.PRNGKey(0), x, mask)["params"]
    out_eval = tower.apply({"params": params}, x, mask)
    out_plain = TransformerTower(cfg_nodrop).apply({"params": params}, x, mask)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(out_plain))

    t1 = tower.apply({"params": params}, x, mask, train=True,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    t2 = tower.apply({"params": params}, x, mask, train=True,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    t1b = tower.apply({"params": params}, x, mask, train=True,
                      rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.all(np.isfinite(np.asarray(t1)))
    assert not np.array_equal(np.asarray(t1), np.asarray(out_eval))
    assert not np.array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t1b))


def test_flash_supported_shapes():
    assert flash_supported(64, backend="tpu")
    assert flash_supported(4096, backend="tpu")
    assert not flash_supported(63, backend="tpu")  # no block divides it
    assert not flash_supported(64, backend="cpu")


@needs_multidevice
@pytest.mark.parametrize("masked", [False, True])
def test_ring_attention_matches_full(rng, masked):
    from crossclr_tpu.parallel import make_mesh, sequence_parallel_attention

    mesh = make_mesh(n_data=1, n_model=8)
    q, k, v = _qkv(rng)
    mask = (
        jnp.asarray(rng.random((2, 64)) > 0.3, jnp.float32) if masked else None
    )
    want = mha_reference(q, k, v, mask)
    got = sequence_parallel_attention(q, k, v, mask, mesh=mesh, axis="model")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@needs_multidevice
@pytest.mark.parametrize("masked", [False, True])
def test_ring_attention_gradients_match_full(rng, masked):
    from crossclr_tpu.parallel import make_mesh, sequence_parallel_attention

    mesh = make_mesh(n_data=1, n_model=8)
    q, k, v = _qkv(rng, s=32)
    mask = (
        jnp.asarray(rng.random((2, 32)) > 0.2, jnp.float32) if masked else None
    )

    want = jax.grad(
        lambda *a: jnp.sum(jnp.sin(mha_reference(*a, mask))), argnums=(0, 1, 2)
    )(q, k, v)
    got = jax.grad(
        lambda *a: jnp.sum(
            jnp.sin(
                sequence_parallel_attention(*a, mask, mesh=mesh, axis="model")
            )
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for g_w, g_g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g_g), np.asarray(g_w),
                                   rtol=1e-4, atol=1e-5)


@needs_multidevice
@pytest.mark.parametrize("masked", [False, True])
def test_ring_flash_blocks_match_full(rng, masked):
    """Ring-of-flash: every ring step runs the Pallas blockwise kernels
    (interpreted on CPU) on the visiting K/V block; partials merge via
    (out, logsumexp).  Must equal dense attention exactly like the jnp
    block path does."""
    from crossclr_tpu.parallel import make_mesh, sequence_parallel_attention

    mesh = make_mesh(n_data=1, n_model=8)
    q, k, v = _qkv(rng)  # s=64 -> s_loc=8 per device
    mask = (
        jnp.asarray(rng.random((2, 64)) > 0.3, jnp.float32) if masked else None
    )
    want = mha_reference(q, k, v, mask)
    got = sequence_parallel_attention(
        q, k, v, mask, mesh=mesh, axis="model",
        block_impl="flash", interpret=INTERPRET,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@needs_multidevice
@pytest.mark.parametrize("masked", [False, True])
def test_ring_flash_blocks_gradients_match_full(rng, masked):
    """The flash-block ring backward feeds each block the GLOBAL
    (out, lse) so per-block probabilities are globally normalized; the
    summed block contributions must equal dense-attention gradients."""
    from crossclr_tpu.parallel import make_mesh, sequence_parallel_attention

    mesh = make_mesh(n_data=1, n_model=8)
    q, k, v = _qkv(rng)  # s=64 -> s_loc=8, the kernels' minimum tile
    mask = (
        jnp.asarray(rng.random((2, 64)) > 0.2, jnp.float32) if masked else None
    )

    want = jax.grad(
        lambda *a: jnp.sum(jnp.sin(mha_reference(*a, mask))), argnums=(0, 1, 2)
    )(q, k, v)
    got = jax.grad(
        lambda *a: jnp.sum(
            jnp.sin(
                sequence_parallel_attention(
                    *a, mask, mesh=mesh, axis="model",
                    block_impl="flash", interpret=INTERPRET,
                )
            )
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for g_w, g_g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g_g), np.asarray(g_w),
                                   rtol=1e-4, atol=1e-5)


@needs_multidevice
def test_ring_flash_blocks_other_shapes(rng):
    """Shape sweep for the flash-block ring: s_loc=16 (different kernel
    tiling than the s_loc=8 tests) and a lane-aligned head dim (no
    padding path), plus bf16 inputs (per-block outputs round to bf16 at
    the merge boundary — looser tolerance)."""
    from crossclr_tpu.parallel import make_mesh, sequence_parallel_attention

    mesh = make_mesh(n_data=1, n_model=8)
    for dh, s in ((128, 128), (24, 128)):
        q, k, v = _qkv(rng, s=s, dh=dh)
        mask = jnp.asarray(rng.random((2, s)) > 0.3, jnp.float32)
        want = mha_reference(q, k, v, mask)
        got = sequence_parallel_attention(
            q, k, v, mask, mesh=mesh, axis="model",
            block_impl="flash", interpret=INTERPRET,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    q, k, v = (x.astype(jnp.bfloat16) for x in _qkv(rng))
    want = mha_reference(q, k, v, None)
    got = sequence_parallel_attention(
        q, k, v, None, mesh=mesh, axis="model",
        block_impl="flash", interpret=INTERPRET,
    )
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.02,
    )


@needs_multidevice
def test_ring_attention_fully_masked_rows(rng):
    """A batch row whose ENTIRE global key set is masked must emit zeros
    forward and finite zero gradients backward — the hand-written ring
    backward re-forms probabilities from lse = m + log(l), which hits the
    _MAX_FLOOR guard exactly here."""
    from crossclr_tpu.parallel import make_mesh, sequence_parallel_attention

    mesh = make_mesh(n_data=1, n_model=8)
    q, k, v = _qkv(rng, s=32)
    mask = jnp.asarray(rng.random((2, 32)) > 0.2, jnp.float32)
    mask = mask.at[1].set(0.0)  # row 1: every key on every device masked

    out, grads = jax.value_and_grad(
        lambda *a: jnp.sum(
            sequence_parallel_attention(*a, mask, mesh=mesh, axis="model")
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    fwd = sequence_parallel_attention(q, k, v, mask, mesh=mesh, axis="model")
    assert np.all(np.asarray(fwd)[1] == 0.0)
    for g in grads:
        g = np.asarray(g)
        assert np.all(np.isfinite(g))
        assert np.all(g[1] == 0.0)  # no key visible -> no gradient flows
    # unmasked row still matches the dense reference
    want = mha_reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(fwd)[0], np.asarray(want)[0],
                               rtol=1e-5, atol=1e-5)


@needs_multidevice
def test_tower_flash_and_ring_share_params_and_agree(rng):
    """The flash and ring attention cores are drop-in replacements: same
    _MHA parameter tree, same outputs (flash falls back to the jnp oracle
    on CPU; ring runs the real 8-device ring)."""
    from crossclr_tpu.models import TowerConfig, TransformerTower
    from crossclr_tpu.parallel import make_mesh

    mesh = make_mesh(n_data=1, n_model=8)
    cfg_flash = TowerConfig(
        kind="transformer", input_dim=20, embed_dim=32, hidden_dim=48,
        num_heads=4, max_seq_len=16, dtype=jnp.float32, attention="flash",
    )
    cfg_ring = TowerConfig(
        kind="transformer", input_dim=20, embed_dim=32, hidden_dim=48,
        num_heads=4, max_seq_len=16, dtype=jnp.float32, attention="ring",
    )
    x = jnp.asarray(rng.standard_normal((4, 16, 20)), jnp.float32)
    mask = jnp.asarray(rng.random((4, 16)) > 0.2, jnp.float32)

    tower_flash = TransformerTower(cfg_flash)
    params = tower_flash.init(jax.random.PRNGKey(0), x, mask)["params"]
    out_flash = tower_flash.apply({"params": params}, x, mask)

    tower_ring = TransformerTower(cfg_ring, mesh, "model")
    out_ring = tower_ring.apply({"params": params}, x, mask)
    np.testing.assert_allclose(
        np.asarray(out_ring), np.asarray(out_flash), rtol=1e-5, atol=1e-5
    )


@needs_multidevice
@pytest.mark.parametrize("block_impl", ["auto", "flash"])
def test_trainer_sequence_parallel_matches_single_device(rng, block_impl):
    """Full train step with ring-attention transformer towers on a
    dp=4 x sp=2 mesh reproduces the single-device step — with jnp block
    math ("auto" resolves to it on CPU) and with the Pallas flash kernels
    per ring block (interpreted)."""
    from crossclr_tpu.data import epoch_batches
    from crossclr_tpu.models import TowerConfig
    from crossclr_tpu.parallel import data_sharding, make_mesh
    from crossclr_tpu.training import TrainConfig, Trainer

    # flash blocks need s_loc = S/sp >= 8, so S=16 for that variant
    s = 8 if block_impl == "auto" else 16
    interp = block_impl == "flash"
    n = 64
    video = rng.standard_normal((n, s, 20)).astype(np.float32)
    text = rng.standard_normal((n, s, 12)).astype(np.float32)

    class SeqData:
        pass

    SeqData.video, SeqData.text = video, text
    SeqData.__len__ = lambda self: n
    data = SeqData()

    vc = TowerConfig(kind="transformer", input_dim=20, embed_dim=16,
                     hidden_dim=32, num_heads=2, max_seq_len=s,
                     dtype=jnp.float32, attention="ring",
                     ring_block_impl=block_impl, ring_interpret=interp)
    tc = TowerConfig(kind="transformer", input_dim=12, embed_dim=16,
                     hidden_dim=32, num_heads=2, max_seq_len=s,
                     dtype=jnp.float32, attention="ring",
                     ring_block_impl=block_impl, ring_interpret=interp)
    cfg = TrainConfig(loss="crossclr_intra", total_steps=10)

    mesh_sp = make_mesh(n_data=4, n_model=2)
    mesh_1 = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])

    batch = next(epoch_batches(data, 64, shuffle=False))
    tr_sp = Trainer(vc, tc, cfg, mesh=mesh_sp)
    tr_1 = Trainer(vc, tc, cfg, mesh=mesh_1)
    st_sp = tr_sp.init_state(batch["video"][:4], batch["text"][:4])
    st_1 = tr_1.init_state(batch["video"][:4], batch["text"][:4])

    batch_sp = {
        k: jax.device_put(jnp.asarray(v), data_sharding(mesh_sp))
        for k, v in batch.items()
    }
    _, m_sp = tr_sp.train_step(st_sp, batch_sp)
    _, m_1 = tr_1.train_step(st_1, batch)
    np.testing.assert_allclose(
        float(m_sp["loss"]), float(m_1["loss"]), rtol=2e-5, atol=2e-5
    )

def test_dropout_keep_mask_window_offsets():
    """dropout_keep_mask with (q_offset, k_offset) is exactly the
    corresponding window of the full-sequence mask — the property the
    ring path relies on to reproduce the single-chip mask per block."""
    from crossclr_tpu.ops.flash_attention import dropout_keep_mask

    b, h, s = 2, 3, 64
    full = np.asarray(dropout_keep_mask(b, h, s, 9, 0.35))
    for qo, ko, sq, sk in ((0, 32, 16, 16), (48, 0, 16, 64), (8, 40, 8, 24)):
        win = np.asarray(
            dropout_keep_mask(b, h, sq, 9, 0.35, sk=sk, q_offset=qo,
                              k_offset=ko)
        )
        np.testing.assert_array_equal(
            win, full[:, :, qo:qo + sq, ko:ko + sk]
        )


@needs_multidevice
@pytest.mark.parametrize("impl", ["jnp", "flash"])
def test_ring_dropout_matches_full(rng, impl):
    """Sequence-sharded probability dropout drops EXACTLY the entries a
    single-chip run would: each ring step keys the hash mask on its
    block's global (q_offset, k_offset) window."""
    from crossclr_tpu.parallel import make_mesh, sequence_parallel_attention

    mesh = make_mesh(n_data=1, n_model=8)
    q, k, v = _qkv(rng)
    mask = jnp.asarray(rng.random((2, 64)) > 0.3, jnp.float32)
    mask = mask.at[1, :].set(0.0)  # fully-masked row stays zero
    want = mha_reference(q, k, v, mask, dropout_rate=0.3, dropout_seed=7)
    got = sequence_parallel_attention(
        q, k, v, mask, mesh=mesh, axis="model", block_impl=impl,
        interpret=INTERPRET, dropout_rate=0.3, dropout_seed=7,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    assert np.all(np.asarray(got)[1] == 0.0)


@needs_multidevice
@pytest.mark.parametrize("impl", ["jnp", "flash"])
def test_ring_dropout_gradients_match_full(rng, impl):
    """Both ring backwards (jnp blocks and the flash kernels) regenerate
    the forward's global dropout mask; gradients must equal autodiff
    through the dense oracle with the same seed."""
    from crossclr_tpu.parallel import make_mesh, sequence_parallel_attention

    mesh = make_mesh(n_data=1, n_model=8)
    q, k, v = _qkv(rng)
    mask = jnp.asarray(rng.random((2, 64)) > 0.2, jnp.float32)

    def loss(fn):
        return lambda *a: jnp.sum(jnp.sin(fn(*a)))

    want = jax.grad(
        loss(lambda q_, k_, v_: mha_reference(
            q_, k_, v_, mask, dropout_rate=0.25, dropout_seed=11)),
        argnums=(0, 1, 2),
    )(q, k, v)
    got = jax.grad(
        loss(lambda q_, k_, v_: sequence_parallel_attention(
            q_, k_, v_, mask, mesh=mesh, axis="model", block_impl=impl,
            interpret=INTERPRET, dropout_rate=0.25, dropout_seed=11)),
        argnums=(0, 1, 2),
    )(q, k, v)
    for g_w, g_g in zip(want, got):
        assert np.all(np.isfinite(np.asarray(g_g)))
        np.testing.assert_allclose(np.asarray(g_g), np.asarray(g_w),
                                   rtol=1e-4, atol=1e-5)


@needs_multidevice
def test_tower_ring_dropout_matches_flash_tower(rng):
    """Ring towers now apply TRUE probability dropout: with identical
    params and dropout rng, the ring tower's train-mode output equals the
    flash tower's bit pattern of dropped attention entries (both draw the
    same seed and hash the same global indices)."""
    from crossclr_tpu.models import TowerConfig, TransformerTower
    from crossclr_tpu.parallel import make_mesh

    mesh = make_mesh(n_data=1, n_model=8)
    common = dict(kind="transformer", input_dim=20, embed_dim=32,
                  hidden_dim=48, num_heads=4, max_seq_len=16,
                  dtype=jnp.float32, dropout=0.35)
    cfg_flash = TowerConfig(attention="flash", **common)
    cfg_ring = TowerConfig(attention="ring", **common)
    x = jnp.asarray(rng.standard_normal((4, 16, 20)), jnp.float32)
    mask = jnp.asarray(rng.random((4, 16)) > 0.2, jnp.float32)

    tower_flash = TransformerTower(cfg_flash)
    params = tower_flash.init(jax.random.PRNGKey(0), x, mask)["params"]
    t_flash = tower_flash.apply({"params": params}, x, mask, train=True,
                                rngs={"dropout": jax.random.PRNGKey(5)})

    tower_ring = TransformerTower(cfg_ring, mesh, "model")
    t_ring = tower_ring.apply({"params": params}, x, mask, train=True,
                              rngs={"dropout": jax.random.PRNGKey(5)})
    np.testing.assert_allclose(np.asarray(t_ring), np.asarray(t_flash),
                               rtol=1e-5, atol=1e-5)
    # and eval mode stays dropout-free/deterministic
    e_ring = tower_ring.apply({"params": params}, x, mask)
    e_flash = tower_flash.apply({"params": params}, x, mask)
    np.testing.assert_allclose(np.asarray(e_ring), np.asarray(e_flash),
                               rtol=1e-5, atol=1e-5)
    assert not np.array_equal(np.asarray(t_ring), np.asarray(e_ring))


def test_dropout_bh_offset_is_global_row_slice():
    """``bh_offset`` places a shard's rows in the GLOBAL folded batch·head
    range: a (b_loc, h) mask at offset b_loc·h must equal the tail slice
    of the (2·b_loc, h) full mask — the exactness property the dp×sp
    wrapper relies on so data-parallel shards reproduce the single-chip
    drop pattern instead of each re-drawing rows 0..b_loc·h."""
    from crossclr_tpu.ops.flash_attention import dropout_keep_mask

    b, h, s = 4, 3, 32
    full = np.asarray(dropout_keep_mask(b, h, s, 13, 0.4))
    lo = np.asarray(dropout_keep_mask(2, h, s, 13, 0.4))
    hi = np.asarray(dropout_keep_mask(2, h, s, 13, 0.4, bh_offset=2 * h))
    np.testing.assert_array_equal(lo, full[:2])
    np.testing.assert_array_equal(hi, full[2:])
    # the two shards draw genuinely different bits (offset 0 on both
    # would alias them — the correlated-noise failure mode)
    assert not np.array_equal(hi, lo)


def test_dropout_seed_fold_large_seed_kernel_matches_oracle(rng):
    """Seeds at/above 2^24 round in the kernels' fp32 SMEM carrier; both
    paths canonicalize through ``fold_seed`` (fp32 round, then mod 2^23)
    so the pallas kernels and the jnp oracle still drop IDENTICAL
    entries for any seed value."""
    from crossclr_tpu.ops.flash_attention import fold_seed

    big = 2**25 + 3  # not fp32-representable: rounds before the fold
    f = float(fold_seed(big))
    assert 0.0 <= f < 2**23 and f == int(f)

    q, k, v = _qkv(rng)
    want = mha_reference(q, k, v, None, dropout_rate=0.3, dropout_seed=big)
    got = flash_attention(q, k, v, use_pallas=True, interpret=INTERPRET,
                          precision="highest", dropout_rate=0.3,
                          dropout_seed=big)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_hash_keep_no_lattice_collisions():
    """The per-index nonlinear pre-mix kills the linear scheme's lattice
    collisions.  Under plain ``q·C1 + k·C2`` mixing, every index pair
    offset by a lattice vector (Δq, Δk) with Δq·C1 + Δk·C2 ≡ 0 (mod 2^32)
    produced the SAME hash word for every seed — perfectly correlated
    drop decisions along that direction on long sequences.  Find the
    shortest such vector and check the keep bits at (q, k) and
    (q+Δq, k+Δk) now agree only at the independent-Bernoulli rate."""
    from crossclr_tpu.ops.flash_attention import _hash_keep

    C1, C2, M = 0x9E3779B1, 0x85EBCA77, 1 << 32
    inv_c1 = pow(C1, -1, M)
    best = None
    for dk in range(1, 1 << 17):
        dq = (-dk * C2 * inv_c1) % M
        if dq > M // 2:
            dq -= M
        cand = max(abs(dq), dk)
        if best is None or cand < best[0]:
            best = (cand, dq, dk)
    norm, dq, dk = best
    # determinant-2^32 lattice: shortest max-norm vector is ~2^16, i.e.
    # inside a realistic long-context index range
    assert norm < 1 << 18
    assert (dq * C1 + dk * C2) % M == 0

    n = 4096
    g = np.random.default_rng(0)
    base = 1 << 19  # keep q+dq positive for any sign of dq
    qs = g.integers(base, base + (1 << 20), size=n)
    ks = g.integers(0, 1 << 20, size=n)

    def keeps(qi, ki):
        return np.asarray(
            _hash_keep(jnp.asarray(qi, jnp.int32), jnp.asarray(ki, jnp.int32),
                       jnp.uint32(12345), jnp.uint32(7), 0.5)
        )

    agree = float(np.mean(keeps(qs, ks) == keeps(qs + dq, ks + dk)))
    # independent fair bits agree w.p. 0.5; the linear scheme agreed
    # with probability 1.0 along exactly this direction
    assert 0.45 < agree < 0.55


@needs_multidevice
@pytest.mark.parametrize("impl", ["jnp", "flash"])
def test_dp_sp_dropout_matches_single_chip(rng, impl):
    """dp×sp composition: with the batch sharded over ``data`` AND the
    sequence ring-sharded over ``model``, probability dropout must drop
    exactly what the single-chip run would — the wrapper passes each dp
    shard's global batch·head offset so shards neither alias each other
    nor diverge from the dense oracle."""
    from crossclr_tpu.parallel import make_mesh, sequence_parallel_attention

    mesh = make_mesh(n_data=2, n_model=4)
    q, k, v = _qkv(rng, b=4, h=2, s=64, dh=16)
    mask = jnp.asarray(rng.random((4, 64)) > 0.2, jnp.float32)
    want = mha_reference(q, k, v, mask, dropout_rate=0.3, dropout_seed=7)
    got = sequence_parallel_attention(
        q, k, v, mask, mesh=mesh, axis="model", block_impl=impl,
        interpret=INTERPRET, dropout_rate=0.3, dropout_seed=7,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
