"""Jitted contrastive train step and training loop.

The reference implies (but does not ship) a loop: README.md:24-38 sketches
``loss = criterion(video_features, text_features)`` inside a user-written
step, and the criterion's ``logit_scale`` parameter (loss.py:52) implies
the criterion's params join the optimizer.  This module supplies the real
thing, TPU-first:

* one ``jax.jit``-compiled train step over a ``Mesh`` — batch sharded on
  the ``data`` axis, params replicated; XLA inserts the gradient psums
* loss selectable from the criterion registry (CrossCLR variants, fused
  Pallas path, InfoNCE, max-margin), with all-gathered global negatives
  when the mesh has >1 data shard
* bf16 encoder matmuls / fp32 params, AdamW with warmup-cosine schedule,
  global-norm clipping
* scalar metrics (loss, grad norm, logit-scale, throughput) out of the
  jitted step as a dict of device scalars
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..losses import functional as F
from ..models import DualEncoder, TowerConfig
from ..ops import cross_clr_intra_fused
from ..parallel.global_loss import local_rows_cross_clr_intra
from ..parallel.mesh import DATA_AXIS

__all__ = ["TrainConfig", "TrainState", "Trainer", "make_loss_fn"]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    loss: str = "crossclr_intra"  # crossclr_intra|crossclr_intra_fused|crossclr|info_nce|max_margin
    temperature: float = 0.03  # loss.py:50 default
    negative_weight: float = 0.8  # loss.py:50 default
    weight_temperature: float = 0.0035
    prune_percent: float = 0.10
    margin: float = 0.1  # loss.py:23 default
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    warmup_steps: int = 100
    total_steps: int = 10_000
    clip_norm: float = 1.0
    global_negatives: bool = True
    seed: int = 0


class TrainState(train_state.TrainState):
    """Flax TrainState; model params include the towers only — the
    criterion's vestigial ``logit_scale`` is carried as an extra leaf so
    checkpoints mirror the reference's optimizer surface."""


def make_loss_fn(cfg: TrainConfig, mesh: Mesh | None = None) -> Callable:
    """Return ``loss_fn(v_emb, t_emb, v_raw, t_raw) -> scalar``.

    When ``mesh`` spans >1 data-axis devices and ``cfg.global_negatives``,
    the CrossCLR-intra loss is computed with the globally-gathered
    candidate set inside ``shard_map`` (see parallel.global_loss); the
    returned callable must then be invoked *inside* the sharded region.
    """
    kw = dict(temperature=cfg.temperature, negative_weight=cfg.negative_weight)
    if cfg.loss == "crossclr_intra":
        return lambda v, t, vr=None, tr=None: F.cross_clr_intra(v, t, **kw)
    if cfg.loss == "crossclr_intra_fused":
        return lambda v, t, vr=None, tr=None: cross_clr_intra_fused(v, t, **kw)
    if cfg.loss == "crossclr":
        return lambda v, t, vr=None, tr=None: F.cross_clr(
            v,
            t,
            vr,
            tr,
            temperature=cfg.temperature,
            negative_weight=cfg.negative_weight,
            weight_temperature=cfg.weight_temperature,
            prune_percent=cfg.prune_percent,
        )
    if cfg.loss == "info_nce":
        return lambda v, t, vr=None, tr=None: F.info_nce(
            v, t, temperature=cfg.temperature
        )
    if cfg.loss == "max_margin":
        return lambda v, t, vr=None, tr=None: F.max_margin(v, t, margin=cfg.margin)
    raise ValueError(f"unknown loss {cfg.loss!r}")


def _global_rows_loss(
    v_emb: jax.Array,
    t_emb: jax.Array,
    cfg: TrainConfig,
    axis: str,
) -> jax.Array:
    """CrossCLR-intra over the global batch, called inside shard_map/jit
    with sharded activations: gathers normalized features over ``axis``."""
    v = F.l2_normalize(v_emb, axis=1)
    t = F.l2_normalize(t_emb, axis=1)
    v_all = jax.lax.all_gather(v, axis, tiled=True)
    t_all = jax.lax.all_gather(t, axis, tiled=True)
    b_loc = v.shape[0]
    n = v_all.shape[0]
    offset = jax.lax.axis_index(axis) * b_loc
    loss_v = local_rows_cross_clr_intra(
        v, v_all, t_all, offset,
        temperature=cfg.temperature, negative_weight=cfg.negative_weight,
    )
    loss_t = local_rows_cross_clr_intra(
        t, t_all, v_all, offset,
        temperature=cfg.temperature, negative_weight=cfg.negative_weight,
    )
    return jax.lax.psum(jnp.sum(loss_v) + jnp.sum(loss_t), axis) / (2 * n)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.learning_rate,
        warmup_steps=cfg.warmup_steps,
        decay_steps=max(cfg.total_steps, cfg.warmup_steps + 1),
    )
    return optax.chain(
        optax.clip_by_global_norm(cfg.clip_norm),
        optax.adamw(schedule, weight_decay=cfg.weight_decay),
    )


class Trainer:
    """Owns model init, the jitted sharded train step, and eval encoding."""

    def __init__(
        self,
        video_cfg: TowerConfig,
        text_cfg: TowerConfig,
        train_cfg: TrainConfig,
        mesh: Mesh | None = None,
    ):
        self.model = DualEncoder(video_cfg, text_cfg)
        self.video_cfg = video_cfg
        self.text_cfg = text_cfg
        self.cfg = train_cfg
        self.mesh = mesh
        self._train_step = None
        self._encode = None

    # -- init ---------------------------------------------------------------

    def init_state(self, sample_video: jax.Array, sample_text: jax.Array) -> TrainState:
        rng = jax.random.PRNGKey(self.cfg.seed)
        params = self.model.init(rng, sample_video, sample_text)["params"]
        # vestigial criterion parameter, kept for reference-API parity
        params = dict(params, logit_scale=jnp.ones(()))
        state = TrainState.create(
            apply_fn=self.model.apply,
            params=params,
            tx=make_optimizer(self.cfg),
        )
        if self.mesh is not None:
            state = jax.device_put(
                state, NamedSharding(self.mesh, P())
            )
        return state

    # -- the step -----------------------------------------------------------

    def _build_step(self):
        cfg = self.cfg
        mesh = self.mesh
        model = self.model
        plain_loss = make_loss_fn(cfg, mesh)
        use_global = (
            mesh is not None
            and cfg.global_negatives
            and mesh.shape[DATA_AXIS] > 1
            and cfg.loss in ("crossclr_intra", "crossclr_intra_fused")
        )

        def loss_for_batch(params, batch):
            towers = {k: v for k, v in params.items() if k != "logit_scale"}
            v_emb, t_emb = model.apply(
                {"params": towers},
                batch["video"],
                batch["text"],
                batch.get("video_mask"),
                batch.get("text_mask"),
                train=True,
            )
            if use_global:
                loss = _global_rows_loss(v_emb, t_emb, cfg, DATA_AXIS)
            else:
                loss = plain_loss(v_emb, t_emb, batch["video"], batch["text"])
            return loss, (v_emb, t_emb)

        def step(state: TrainState, batch):
            (loss, (v_emb, t_emb)), grads = jax.value_and_grad(
                loss_for_batch, has_aux=True
            )(state.params, batch)
            if use_global:
                # inside shard_map each device holds only its batch rows'
                # gradient contribution; the true gradient is their sum
                grads = jax.tree.map(
                    lambda g: jax.lax.psum(g, DATA_AXIS), grads
                )
            gnorm = optax.global_norm(grads)
            new_state = state.apply_gradients(grads=grads)
            v_norm = jnp.mean(jnp.linalg.norm(v_emb, axis=1))
            t_norm = jnp.mean(jnp.linalg.norm(t_emb, axis=1))
            if use_global:
                v_norm = jax.lax.pmean(v_norm, DATA_AXIS)
                t_norm = jax.lax.pmean(t_norm, DATA_AXIS)
            metrics = {
                "loss": loss,
                "grad_norm": gnorm,
                "video_emb_norm": v_norm,
                "text_emb_norm": t_norm,
            }
            return new_state, metrics

        if use_global:
            # shard_map so lax.all_gather/psum see the data axis; params
            # replicated, batch sharded on leading dim
            batch_spec = P(DATA_AXIS)

            def sharded_step(state, batch):
                inner = jax.shard_map(
                    step,
                    mesh=mesh,
                    in_specs=(P(), batch_spec),
                    out_specs=(P(), P()),
                    check_vma=False,
                )
                return inner(state, batch)

            return jax.jit(sharded_step, donate_argnums=(0,))
        return jax.jit(step, donate_argnums=(0,))

    def train_step(self, state: TrainState, batch: dict) -> tuple[TrainState, dict]:
        if self._train_step is None:
            self._train_step = self._build_step()
        return self._train_step(state, batch)

    # -- eval ---------------------------------------------------------------

    def encode(self, state: TrainState, batch: dict) -> tuple[jax.Array, jax.Array]:
        if self._encode is None:
            model = self.model

            @jax.jit
            def _enc(params, batch):
                towers = {k: v for k, v in params.items() if k != "logit_scale"}
                return model.apply(
                    {"params": towers},
                    batch["video"],
                    batch["text"],
                    batch.get("video_mask"),
                    batch.get("text_mask"),
                    train=False,
                )

            self._encode = _enc
        return self._encode(state.params, batch)

    # -- loop ---------------------------------------------------------------

    def fit(
        self,
        state: TrainState,
        batches,
        *,
        steps: int,
        log_every: int = 50,
        writer: Any = None,
    ) -> tuple[TrainState, list[dict]]:
        history = []
        it = iter(batches)
        t0 = time.perf_counter()
        for i in range(steps):
            batch = next(it)
            state, metrics = self.train_step(state, batch)
            if (i + 1) % log_every == 0 or i == steps - 1:
                metrics = {k: float(v) for k, v in metrics.items()}
                dt = time.perf_counter() - t0
                metrics["steps_per_sec"] = (i + 1) / dt
                metrics["step"] = i + 1
                history.append(metrics)
                if writer is not None:
                    writer(metrics)
        return state, history
