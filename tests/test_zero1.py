"""ZeRO-1 optimizer-state sharding (TrainConfig.zero1).

The scaling-book optimizer-state-sharding recipe: AdamW/LAMB moments (and
the EMA tree) shard over the DATA mesh axis instead of replicating —
per-device optimizer HBM drops ~n_data× while the update math is
unchanged (elementwise on sharded moments; GSPMD inserts the weight
all-gather).  The reference has no distributed training at all
(SURVEY.md §2.5); this is capability-envelope widening for big towers,
where fp32 moments are 2× params and dominate state memory.

Pinned here: numerical equality with the replicated step across every
composing layout (plain dp, global negatives via shard_map, dp×tp,
GradCache, LAMB, EMA), the moments actually being sharded (sharding
specs + per-device byte counts), and checkpoint round-trips in and
across the zero1 setting.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from crossclr_tpu.models import TowerConfig
from crossclr_tpu.parallel import data_sharding, make_mesh
from crossclr_tpu.training import TrainConfig, Trainer

needs_multidevice = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

pytestmark = needs_multidevice

B, DV, DT, E = 64, 24, 16, 32


def _towers(**kw):
    base = dict(kind="mlp", embed_dim=E, hidden_dim=64, dtype=jnp.float32)
    base.update(kw)
    return (
        TowerConfig(input_dim=DV, **base),
        TowerConfig(input_dim=DT, **base),
    )


def _batch(rng, b=B):
    return {
        "video": jnp.asarray(rng.standard_normal((b, DV)), jnp.float32),
        "text": jnp.asarray(rng.standard_normal((b, DT)), jnp.float32),
    }


def _run(mesh, cfg_kw, rng_seed=0, steps=4, tower_kw=None, shard_batch=True):
    rng = np.random.default_rng(rng_seed)
    vc, tc = _towers(**(tower_kw or {}))
    cfg = TrainConfig(
        temperature=0.03, learning_rate=3e-3, warmup_steps=2,
        total_steps=steps, seed=0, **cfg_kw,
    )
    trainer = Trainer(vc, tc, cfg, mesh=mesh)
    batch = _batch(rng)
    state = trainer.init_state(batch["video"][:2], batch["text"][:2])
    if mesh is not None and shard_batch:
        batch = {
            k: jax.device_put(v, data_sharding(mesh)) for k, v in batch.items()
        }
    losses = []
    for _ in range(steps):
        state, m = trainer.train_step(state, batch)
        losses.append(float(m["loss"]))
    return trainer, state, losses


def _moment_leaves(state):
    """All array leaves of the adam/lamb mu+nu trees (dict-of-params
    structured subtrees of the optax state)."""
    leaves = []

    def walk(node):
        if isinstance(node, dict):
            leaves.extend(jax.tree.leaves(node))
            return
        if isinstance(node, tuple):
            for child in node:
                walk(child)

    walk(state.opt_state)
    return leaves


def _assert_params_close(a, b, rtol=2e-6, atol=2e-6):
    def cmp(path, va, vb):
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), rtol=rtol, atol=atol,
            err_msg=str(path),
        )

    jax.tree_util.tree_map_with_path(cmp, a, b)


@pytest.mark.parametrize(
    "cfg_kw",
    [
        dict(loss="crossclr_intra"),  # plain dp under GSPMD
        dict(loss="crossclr_intra", global_negatives=True),  # shard_map
        dict(loss="crossclr_intra", optimizer="lamb"),
        dict(loss="crossclr_intra", ema_decay=0.9),
        dict(loss="crossclr_intra", global_negatives=True,
             embedding_chunk=8),  # GradCache inside the shard_map
        dict(loss="crossclr", prune_percent=0.25),  # full loss, dp
    ],
)
def test_zero1_matches_replicated(cfg_kw):
    """zero1=True reproduces the replicated run exactly (same data, same
    seeds) in every composing layout — the update is the same math on a
    sharded layout."""
    mesh = make_mesh(n_data=8, n_model=1)
    _, st_rep, l_rep = _run(mesh, cfg_kw)
    _, st_z1, l_z1 = _run(mesh, dict(cfg_kw, zero1=True))
    np.testing.assert_allclose(l_z1, l_rep, rtol=1e-6)
    _assert_params_close(st_z1.params, st_rep.params)
    if st_rep.ema_params is not None:
        _assert_params_close(st_z1.ema_params, st_rep.ema_params)


def test_zero1_composes_with_tensor_parallel():
    """dp=4×tp=2: moments carry BOTH axes — the model axis on the
    Megatron-split dim, the data axis on another — and the step still
    reproduces the dp-only replicated run."""
    mesh_tp = make_mesh(n_data=4, n_model=2)
    mesh_dp = make_mesh(n_data=8, n_model=1)
    _, st_rep, l_rep = _run(mesh_dp, dict(loss="crossclr_intra"))
    _, st_z1, l_z1 = _run(
        mesh_tp, dict(loss="crossclr_intra", zero1=True)
    )
    np.testing.assert_allclose(l_z1, l_rep, rtol=1e-5, atol=1e-6)
    _assert_params_close(st_z1.params, st_rep.params, rtol=1e-5, atol=1e-5)
    # at least one moment leaf is sharded over data AND model together
    specs = {
        getattr(leaf.sharding, "spec", None)
        for leaf in _moment_leaves(st_z1)
    }
    assert any(
        s is not None and "data" in jax.tree.leaves(tuple(s))
        and "model" in jax.tree.leaves(tuple(s))
        for s in specs
    ), specs


def test_zero1_moments_are_sharded_and_smaller():
    """The point of the feature: moment leaves big enough to split carry
    the data axis in their sharding, and the per-device moment bytes are
    a fraction of the replicated run's."""
    mesh = make_mesh(n_data=8, n_model=1)
    _, st_rep, _ = _run(mesh, dict(loss="crossclr_intra"), steps=1)
    _, st_z1, _ = _run(
        mesh, dict(loss="crossclr_intra", zero1=True), steps=1
    )

    def device_bytes(leaves):
        total = 0
        for leaf in leaves:
            shard = max(
                (s.data.size for s in leaf.addressable_shards), default=0
            )
            total += shard * leaf.dtype.itemsize
        return total

    rep_b = device_bytes(_moment_leaves(st_rep))
    z1_b = device_bytes(_moment_leaves(st_z1))
    # every kernel/bias dim here divides 8 except scalars; expect ~8x less
    assert z1_b < rep_b / 4, (z1_b, rep_b)
    sharded = [
        leaf
        for leaf in _moment_leaves(st_z1)
        if "data" in jax.tree.leaves(tuple(leaf.sharding.spec))
    ]
    assert sharded, "no moment leaf carries the data axis"


def test_zero1_sharding_survives_the_step():
    """with_sharding_constraint pins the UPDATED moments: after N steps
    the moments still carry the data axis (GSPMD didn't quietly replicate
    the donated outputs)."""
    mesh = make_mesh(n_data=8, n_model=1)
    _, st, _ = _run(
        mesh, dict(loss="crossclr_intra", zero1=True, ema_decay=0.9),
        steps=3,
    )
    assert any(
        "data" in jax.tree.leaves(tuple(leaf.sharding.spec))
        for leaf in _moment_leaves(st)
    )
    assert any(
        "data" in jax.tree.leaves(tuple(leaf.sharding.spec))
        for leaf in jax.tree.leaves(st.ema_params)
    )


def test_zero1_checkpoint_roundtrip(tmp_path):
    """Orbax round-trip in AND across the zero1 setting: a zero1 run's
    checkpoint restores into a zero1 template (shardings from the
    template) and into a replicated one, and both resume identically."""
    from crossclr_tpu.training import CheckpointManager

    mesh = make_mesh(n_data=8, n_model=1)
    rng = np.random.default_rng(0)
    batch = {
        k: jax.device_put(v, data_sharding(mesh))
        for k, v in _batch(rng).items()
    }

    def make(zero1):
        vc, tc = _towers()
        trainer = Trainer(
            vc, tc,
            TrainConfig(
                loss="crossclr_intra", temperature=0.03, learning_rate=3e-3,
                warmup_steps=2, total_steps=6, seed=0, zero1=zero1,
            ),
            mesh=mesh,
        )
        state = trainer.init_state(batch["video"][:2], batch["text"][:2])
        return trainer, state

    trainer, state = make(zero1=True)
    for _ in range(2):
        state, _ = trainer.train_step(state, batch)
    mngr = CheckpointManager(tmp_path / "ck", max_to_keep=1)
    mngr.save(2, state, wait=True)

    results = {}
    for zero1 in (True, False):
        tr, template = make(zero1)
        restored = mngr.restore(template)
        assert int(restored.step) == 2
        st = restored
        for _ in range(2):
            st, m = tr.train_step(st, batch)
        results[zero1] = (float(m["loss"]), st)
    mngr.close()
    np.testing.assert_allclose(
        results[True][0], results[False][0], rtol=1e-6
    )
    _assert_params_close(results[True][1].params, results[False][1].params)


def test_zero1_noop_without_mesh_or_single_data():
    """zero1 on a single-device mesh (or no mesh) must be inert — specs
    stay replicated, training runs."""
    mesh1 = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    _, st, losses = _run(
        mesh1, dict(loss="crossclr_intra", zero1=True), shard_batch=False
    )
    assert np.isfinite(losses).all()
    for leaf in _moment_leaves(st):
        assert tuple(leaf.sharding.spec) in ((), (None,) * leaf.ndim)
