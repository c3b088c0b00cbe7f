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
