"""Distributed tests on a faked 8-device CPU mesh (SURVEY.md §4 item 3).

conftest.py sets ``--xla_force_host_platform_device_count=8``, so a real
``jax.sharding.Mesh`` with 8 devices exists without TPU hardware.  The
invariant under test: the all-gathered global-negative loss equals the
single-device loss on the concatenated batch — values AND gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crossclr_tpu.losses import cross_clr_intra
from crossclr_tpu.parallel import (
    data_sharding,
    global_cross_clr_intra,
    make_mesh,
)

needs_multidevice = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@needs_multidevice
def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("data", "model")


@needs_multidevice
@pytest.mark.parametrize("b_global,d", [(64, 32), (128, 64)])
def test_global_loss_matches_single_device(rng, b_global, d):
    mesh = make_mesh()
    v = jnp.asarray(rng.standard_normal((b_global, d)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((b_global, d)), jnp.float32)

    want = float(cross_clr_intra(v, t))

    sharding = data_sharding(mesh)
    v_sh = jax.device_put(v, sharding)
    t_sh = jax.device_put(t, sharding)
    got = float(global_cross_clr_intra(v_sh, t_sh, mesh=mesh))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@needs_multidevice
@pytest.mark.quick
def test_global_loss_gradients_match_single_device(rng):
    mesh = make_mesh()
    b, d = 64, 32
    v = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)

    want_v, want_t = jax.grad(lambda a, b_: cross_clr_intra(a, b_), argnums=(0, 1))(
        v, t
    )

    sharding = data_sharding(mesh)
    v_sh = jax.device_put(v, sharding)
    t_sh = jax.device_put(t, sharding)
    got_v, got_t = jax.grad(
        lambda a, b_: global_cross_clr_intra(a, b_, mesh=mesh), argnums=(0, 1)
    )(v_sh, t_sh)

    np.testing.assert_allclose(
        np.asarray(got_v), np.asarray(want_v), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got_t), np.asarray(want_t), rtol=1e-4, atol=1e-6
    )


@needs_multidevice
def test_global_loss_under_jit(rng):
    mesh = make_mesh()
    b, d = 64, 32
    v = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    sharding = data_sharding(mesh)
    v_sh = jax.device_put(v, sharding)
    t_sh = jax.device_put(t, sharding)

    jitted = jax.jit(lambda a, b_: global_cross_clr_intra(a, b_, mesh=mesh))
    got = float(jitted(v_sh, t_sh))
    want = float(cross_clr_intra(v, t))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@needs_multidevice
def test_global_loss_nondefault_hparams(rng):
    mesh = make_mesh()
    b, d = 64, 48
    v = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    sharding = data_sharding(mesh)
    got = float(
        global_cross_clr_intra(
            jax.device_put(v, sharding),
            jax.device_put(t, sharding),
            mesh=mesh,
            temperature=0.1,
            negative_weight=0.5,
        )
    )
    want = float(cross_clr_intra(v, t, temperature=0.1, negative_weight=0.5))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@needs_multidevice
def test_fused_global_loss_matches_single_device(rng):
    """Rectangular Pallas kernels (interpret mode on CPU) under shard_map
    + all_gather reproduce the single-device loss and gradients."""
    mesh = make_mesh()
    b, d = 64, 32
    v = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    sharding = data_sharding(mesh)
    vs, ts = jax.device_put(v, sharding), jax.device_put(t, sharding)

    want = float(cross_clr_intra(v, t))
    got = float(
        global_cross_clr_intra(vs, ts, mesh=mesh, use_fused=True, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    gw = jax.grad(lambda a, b_: cross_clr_intra(a, b_), argnums=(0, 1))(v, t)
    gg = jax.grad(
        lambda a, b_: global_cross_clr_intra(
            a, b_, mesh=mesh, use_fused=True, interpret=True
        ),
        argnums=(0, 1),
    )(vs, ts)
    np.testing.assert_allclose(np.asarray(gg[0]), np.asarray(gw[0]), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gg[1]), np.asarray(gw[1]), rtol=1e-4, atol=1e-6)


@needs_multidevice
def test_fused_global_nondefault_hparams(rng):
    mesh = make_mesh()
    b, d = 64, 48
    v = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    sharding = data_sharding(mesh)
    got = float(
        global_cross_clr_intra(
            jax.device_put(v, sharding),
            jax.device_put(t, sharding),
            mesh=mesh,
            temperature=0.2,
            negative_weight=0.4,
            use_fused=True,
            interpret=True,
        )
    )
    want = float(cross_clr_intra(v, t, temperature=0.2, negative_weight=0.4))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# full CrossCLR (paper variant) at global scale — VERDICT r1 missing #3
# ---------------------------------------------------------------------------


@needs_multidevice
@pytest.mark.parametrize("chunk", [None, 16])
def test_global_cross_clr_matches_single_device(rng, chunk):
    """Global full CrossCLR == single-device cross_clr on the concatenated
    batch: connectivity, pruning quantile, and positive weights are all
    computed on the GLOBAL batch; chunked candidate streaming is exact."""
    from crossclr_tpu.losses import cross_clr
    from crossclr_tpu.parallel import global_cross_clr

    mesh = make_mesh()
    b, d = 64, 32
    v = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    vi = jnp.asarray(rng.standard_normal((b, 40)), jnp.float32)
    ti = jnp.asarray(rng.standard_normal((b, 24)), jnp.float32)

    want = float(cross_clr(v, t, vi, ti))
    sharding = data_sharding(mesh)
    got = float(
        global_cross_clr(
            jax.device_put(v, sharding),
            jax.device_put(t, sharding),
            jax.device_put(vi, sharding),
            jax.device_put(ti, sharding),
            mesh=mesh,
            candidate_chunk=chunk,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@needs_multidevice
def test_global_cross_clr_gradients_match_single_device(rng):
    from crossclr_tpu.losses import cross_clr
    from crossclr_tpu.parallel import global_cross_clr

    mesh = make_mesh()
    b, d = 64, 32
    v = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    vi = jnp.asarray(rng.standard_normal((b, 40)), jnp.float32)
    ti = jnp.asarray(rng.standard_normal((b, 24)), jnp.float32)

    want = jax.grad(lambda a, b_: cross_clr(a, b_, vi, ti), argnums=(0, 1))(v, t)
    sharding = data_sharding(mesh)
    got = jax.grad(
        lambda a, b_: global_cross_clr(
            a, b_,
            jax.device_put(vi, sharding),
            jax.device_put(ti, sharding),
            mesh=mesh,
            candidate_chunk=16,
        ),
        argnums=(0, 1),
    )(jax.device_put(v, sharding), jax.device_put(t, sharding))
    for g_got, g_want in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_want), rtol=1e-4, atol=1e-6
        )


@needs_multidevice
def test_global_cross_clr_embeddings_as_inputs(rng):
    """Two-argument form: connectivity scored on the embeddings themselves,
    matching the single-device default."""
    from crossclr_tpu.losses import cross_clr
    from crossclr_tpu.parallel import global_cross_clr

    mesh = make_mesh()
    b, d = 64, 32
    v = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    want = float(cross_clr(v, t))
    sharding = data_sharding(mesh)
    got = float(
        global_cross_clr(
            jax.device_put(v, sharding), jax.device_put(t, sharding), mesh=mesh
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@needs_multidevice
@pytest.mark.quick
def test_trainer_global_cross_clr_matches_single_device(rng):
    """Trainer step with loss='crossclr' + global_negatives on the 8-device
    mesh reproduces the single-device step (loss and grad norm)."""
    from crossclr_tpu.data import SyntheticPairs, epoch_batches
    from crossclr_tpu.models import TowerConfig
    from crossclr_tpu.training import TrainConfig, Trainer

    data = SyntheticPairs(num_pairs=128, video_dim=24, text_dim=16, seed=0)
    vc = TowerConfig(kind="mlp", input_dim=24, embed_dim=16, hidden_dim=32,
                     dtype=jnp.float32)
    tc = TowerConfig(kind="mlp", input_dim=16, embed_dim=16, hidden_dim=32,
                     dtype=jnp.float32)
    cfg = TrainConfig(loss="crossclr", global_negatives=True, total_steps=10)

    mesh = make_mesh(n_data=8, n_model=1)
    tr_sh = Trainer(vc, tc, cfg, mesh=mesh)
    tr_1 = Trainer(vc, tc, cfg, mesh=None)

    batch = next(epoch_batches(data, 64, shuffle=False))
    state_sh = tr_sh.init_state(batch["video"][:8], batch["text"][:8])
    state_1 = tr_1.init_state(batch["video"][:8], batch["text"][:8])

    sharding = data_sharding(mesh)
    batch_sh = {k: jax.device_put(jnp.asarray(v), sharding) for k, v in batch.items()}
    _, m_sh = tr_sh.train_step(state_sh, batch_sh)
    _, m_1 = tr_1.train_step(state_1, batch)
    np.testing.assert_allclose(
        float(m_sh["loss"]), float(m_1["loss"]), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        float(m_sh["grad_norm"]), float(m_1["grad_norm"]), rtol=1e-3
    )


@needs_multidevice
def test_global_cross_clr_fused_matches_single_device(rng):
    """Full CrossCLR over the mesh with use_fused=True (pruned rect
    kernels, interpret mode on CPU): loss AND gradients equal the
    single-device losses.cross_clr on the concatenated batch."""
    from crossclr_tpu.losses import cross_clr
    from crossclr_tpu.parallel import global_cross_clr

    mesh = make_mesh()
    b, d = 64, 32
    v = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    vi = jnp.asarray(rng.standard_normal((b, 40)), jnp.float32)
    ti = jnp.asarray(rng.standard_normal((b, 24)), jnp.float32)
    sharding = data_sharding(mesh)
    vs, ts = jax.device_put(v, sharding), jax.device_put(t, sharding)
    vis, tis = jax.device_put(vi, sharding), jax.device_put(ti, sharding)

    def fused(a, b_):
        return global_cross_clr(
            a, b_, vis, tis, mesh=mesh, use_fused=True, interpret=True
        )

    want_v, want_g = jax.value_and_grad(
        lambda a, b_: cross_clr(a, b_, vi, ti), argnums=(0, 1)
    )(v, t)
    got_v, got_g = jax.value_and_grad(fused, argnums=(0, 1))(vs, ts)
    np.testing.assert_allclose(float(got_v), float(want_v), rtol=2e-5, atol=2e-5)
    for g_got, g_want, name in zip(got_g, want_g, ("d_v", "d_t")):
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_want), rtol=1e-4, atol=1e-6,
            err_msg=name,
        )


# ---------------------------------------------------------------------------
# hybrid (multi-slice / DCN) mesh layout + order-independent stitching


def test_hybrid_mesh_layout_keeps_model_axis_inside_a_slice():
    """`make_mesh(dcn=...)` must lay devices out so the model axis (TP /
    ring collectives, per-layer latency-bound) never crosses a DCN
    granule, and the data axis is granule-major (only its OUTER segments
    cross DCN).  Verified on stub devices carrying `slice_index` — real
    multi-slice hardware is not reachable here, but the layout logic is
    the same `create_hybrid_device_mesh` call either way."""
    from dataclasses import dataclass

    from crossclr_tpu.parallel.mesh import make_mesh

    @dataclass(frozen=True)
    class Stub:
        id: int
        slice_index: int
        process_index: int = 0
        platform: str = "cpu"
        device_kind: str = "cpu"

    devs = [Stub(id=i, slice_index=i // 4) for i in range(8)]
    mesh = make_mesh(n_model=2, devices=devs)  # dcn="auto" → 2 slices
    assert mesh.devices.shape == (4, 2)
    # every model-axis row lives inside one slice
    for row in mesh.devices:
        assert len({d.slice_index for d in row}) == 1
    # data axis is slice-major: slice 0's rows first, then slice 1's
    assert [row[0].slice_index for row in mesh.devices] == [0, 0, 1, 1]

    # n_data not divisible by granules is a config error, not silent skew
    with pytest.raises(ValueError, match="DCN granules"):
        make_mesh(n_model=2, devices=devs, dcn=3)  # n_data=4, granules=3

    # single slice (all slice_index equal) degenerates to the plain grid
    flat = [Stub(id=i, slice_index=0) for i in range(8)]
    plain = make_mesh(n_model=2, devices=flat)
    assert [d.id for d in plain.devices[:, 0]] == [0, 2, 4, 6]

    # granule="contiguous": forced granule split for single-process
    # testing — same layout contract (model axis inside a granule, data
    # axis granule-major), no device attributes consulted
    cont = make_mesh(n_model=2, devices=devs, dcn=2, granule="contiguous")
    assert cont.devices.shape == (4, 2)
    for row in cont.devices:
        assert len({d.id // 4 for d in row}) == 1  # granule = id block
    assert [row[0].id // 4 for row in cont.devices] == [0, 0, 1, 1]
    with pytest.raises(ValueError, match="explicit dcn"):
        make_mesh(devices=devs, granule="contiguous")
    with pytest.raises(ValueError, match="divisible"):
        make_mesh(n_model=2, devices=devs, dcn=3, granule="contiguous")


@needs_multidevice
def test_stitched_encode_is_correct_under_permuted_device_order(rng):
    """Eval-encode stitching must place each global row on whatever device
    the sharding says owns it — even when the mesh's device order is NOT
    process/id-sorted (the situation hybrid multi-slice layouts create).
    Build a deliberately shuffled mesh and check both the stitch helper's
    round trip and that sharded Trainer.encode output matches the
    unsharded tower output row for row."""
    from crossclr_tpu.parallel.mesh import DATA_AXIS
    from crossclr_tpu.training.trainer import stitch_host_replicated

    perm = np.random.default_rng(3).permutation(8)
    devices = [jax.devices()[i] for i in perm]
    mesh = make_mesh(devices=devices)

    full = np.asarray(rng.standard_normal((16, 6)), np.float32)
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(DATA_AXIS)
    )
    stitched = stitch_host_replicated(sharding, full, full.shape)
    np.testing.assert_array_equal(np.asarray(stitched), full)

    from crossclr_tpu.models import TowerConfig
    from crossclr_tpu.training import TrainConfig, Trainer

    cfgs = dict(
        video_cfg=TowerConfig(
            kind="mlp", input_dim=12, embed_dim=8, hidden_dim=16,
            dtype=jnp.float32,
        ),
        text_cfg=TowerConfig(
            kind="mlp", input_dim=10, embed_dim=8, hidden_dim=16,
            dtype=jnp.float32,
        ),
    )
    batch = {
        "video": np.asarray(rng.standard_normal((16, 12)), np.float32),
        "text": np.asarray(rng.standard_normal((16, 10)), np.float32),
    }
    sharded_tr = Trainer(
        cfgs["video_cfg"], cfgs["text_cfg"], TrainConfig(), mesh=mesh
    )
    state = sharded_tr.init_state(batch["video"][:2], batch["text"][:2])
    v_sharded, t_sharded = sharded_tr.encode(state, batch)

    plain_tr = Trainer(
        cfgs["video_cfg"], cfgs["text_cfg"], TrainConfig(), mesh=None
    )
    state_p = plain_tr.init_state(batch["video"][:2], batch["text"][:2])
    v_plain, t_plain = plain_tr.encode(state_p, batch)

    np.testing.assert_allclose(
        np.asarray(v_sharded), np.asarray(v_plain), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(t_sharded), np.asarray(t_plain), rtol=1e-5, atol=1e-6
    )
