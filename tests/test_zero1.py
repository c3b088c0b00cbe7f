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
        # global_negatives defaults to True, so turning it OFF is what
        # exercises the non-shard_map plain-GSPMD dp path
        dict(loss="crossclr_intra", global_negatives=False),  # plain dp
        dict(loss="crossclr_intra", global_negatives=True),  # shard_map
        dict(loss="crossclr_intra", optimizer="lamb"),
        dict(loss="crossclr_intra", ema_decay=0.9),
        dict(loss="crossclr_intra", global_negatives=True,
             embedding_chunk=8),  # GradCache inside the shard_map
        dict(loss="crossclr", prune_percent=0.25,
             global_negatives=False),  # full loss, plain dp
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


def test_ema_state_replaces_to_param_shardings():
    """trainer.ema_state() must hand back EMA params with the PARAM
    shardings (replicated here), not the ZeRO-1 data-sharded layout —
    otherwise every encode/serve dispatch compiles a per-call all-gather
    of the whole tower."""
    mesh = make_mesh(n_data=8, n_model=1)
    trainer, st, _ = _run(
        mesh, dict(loss="crossclr_intra", zero1=True, ema_decay=0.9),
        steps=2,
    )
    # precondition: the stored EMA tree IS data-sharded under zero1
    assert any(
        "data" in jax.tree.leaves(tuple(leaf.sharding.spec))
        for leaf in jax.tree.leaves(st.ema_params)
    )
    ema = trainer.ema_state(st)
    for path, leaf in jax.tree_util.tree_flatten_with_path(ema.params)[0]:
        assert "data" not in jax.tree.leaves(tuple(leaf.sharding.spec)), (
            f"{path} still data-sharded after ema_state()"
        )
    _assert_params_close(ema.params, st.ema_params, rtol=0, atol=0)


def test_map_param_structured_recurses_dicts_and_lists():
    """Optax states wrapped in dict/list-bearing containers (e.g.
    inject_hyperparams) must still have their moment trees found — a
    silent miss would turn zero1 into a no-op."""
    params = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
    moments = {"w": jnp.full((4,), 2.0), "b": jnp.full((2,), 3.0)}
    wrapped = {"hyperparams": {"lr": jnp.float32(0.1)},
               "inner": [({"mu": moments, "count": jnp.int32(0)},)]}
    # dict node carrying a params-structured subtree under a list+tuple
    out = Trainer._map_param_structured(
        wrapped["inner"], params,
        lambda node: jax.tree.map(lambda v: v * 10, node),
        require="test",
    )
    np.testing.assert_allclose(np.asarray(out[0][0]["mu"]["w"]), 20.0)
    np.testing.assert_allclose(np.asarray(out[0][0]["mu"]["b"]), 30.0)
    assert int(out[0][0]["count"]) == 0

    with pytest.raises(ValueError, match="no params-structured"):
        Trainer._map_param_structured(
            {"nothing": jnp.zeros(3)}, params, lambda n: n, require="test"
        )


def test_zero1_params_stay_replicated_across_steps():
    """constrain_zero1 must pin the UPDATED params back to the param
    specs: without it, GSPMD propagates the data-sharded optimizer
    update into the params output after step 1 — a silently changed
    layout that forces a full recompile on the second dispatch and
    defeats donation."""
    mesh = make_mesh(n_data=8, n_model=1)
    for gn in (False, True):
        _, st, _ = _run(
            mesh,
            dict(loss="crossclr_intra", global_negatives=gn, zero1=True,
                 ema_decay=0.9),
            steps=3,
        )
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            st.params
        )[0]:
            assert "data" not in jax.tree.leaves(
                tuple(leaf.sharding.spec)
            ), f"params leaf {path} data-sharded after the step (gn={gn})"
