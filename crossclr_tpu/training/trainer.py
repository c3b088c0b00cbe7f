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
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..losses import functional as F
from ..models import DualEncoder, TowerConfig
from ..ops import cross_clr_intra_fused
from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

__all__ = ["TrainConfig", "TrainState", "Trainer", "make_loss_fn"]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    loss: str = "crossclr_intra"  # crossclr_intra|crossclr_intra_fused|crossclr|info_nce|max_margin
    temperature: float = 0.03  # loss.py:50 default
    negative_weight: float = 0.8  # loss.py:50 default
    weight_temperature: float = 0.0035
    prune_percent: float = 0.10
    # positive-weight normalization for the full-CrossCLR losses: "raw"
    # (the paper's softmax(conn/τ_w), whose usable τ_w range depends on
    # the connectivity SCALE of the dataset) or "standardized" (z-scored
    # connectivity — scale-robust; pair with weight_temperature ≈ 1.0).
    # fit() measures the weights' effective-sample-size fraction on the
    # first batch and warns loudly when the softmax is near-one-hot —
    # see losses.functional.normalized_connectivity.
    weight_norm: str = "raw"
    margin: float = 0.1  # loss.py:23 default
    learning_rate: float = 1e-4
    # ZeRO-1: shard the optimizer moments (and the EMA tree) over the
    # DATA mesh axis instead of replicating them — the scaling-book
    # optimizer-state-sharding recipe.  Each moment leaf gets the data
    # axis on its first divisible dim (composes with the tensor-parallel
    # specs, which shard a different dim over `model`); the update stays
    # elementwise so only the weight application pays an all-gather,
    # which XLA/GSPMD inserts.  Cuts optimizer HBM by ~n_data× (AdamW
    # moments are 2× params in fp32 — the dominant state for big towers).
    # Numerics are exactly the replicated step's (tested).
    zero1: bool = False
    # "adamw" (default) or "lamb": LAMB (You et al. 2020, public
    # technique) layer-wise-rescales the adam update by ‖param‖/‖update‖,
    # the standard optimizer for very large batches — the 32k global-
    # negative configuration (BASELINE.json config 5) is exactly the
    # regime it was built for.  Same warmup-cosine schedule, clipping,
    # decay mask, and state shape (param-shaped mu/nu moments, so the
    # tensor-parallel moment sharding applies unchanged).
    optimizer: str = "adamw"
    weight_decay: float = 0.01
    warmup_steps: int = 100
    total_steps: int = 10_000
    clip_norm: float = 1.0
    global_negatives: bool = True
    # candidate-axis chunk for the global full-CrossCLR loss: bounds each
    # device's logit block to [b_loc, chunk] (None = unchunked); set to
    # e.g. 4096 for 32k global batches
    global_candidate_chunk: int | None = None
    # kernel precision for the fused loss paths: None/"highest" =
    # parity-grade, "default" = the fast training tier (fwd inside fp32
    # tolerance, grads ~1e-3 rel; bf16 operand fetch inside the kernels,
    # fp32 accumulation and gradients).  "bf16" is an accepted alias of
    # "default" (the historical storage-cast distinction moved inside
    # the kernels' vjp).
    loss_precision: str | None = None
    # GradCache-style two-pass step (Gao et al. 2021, "Scaling Deep
    # Contrastive Learning Batch Size under Memory Limited Setup"; public
    # technique): compute embeddings chunk-by-chunk without storing tower
    # activations, differentiate the loss w.r.t. the EMBEDDINGS over the
    # FULL batch, then re-run each chunk's towers under vjp for exact
    # parameter gradients.  Unlike gradient accumulation — which is
    # semantically WRONG for contrastive losses (each microbatch only
    # sees its own negatives) — this reproduces the large-batch loss and
    # gradients exactly, while activation memory falls from O(batch) to
    # O(chunk) at the cost of one extra tower forward.  The value is an
    # UPPER BOUND on rows encoded at once: when the per-device batch
    # (global batch / data-axis size under global_negatives) is <= chunk,
    # the plain single-pass step runs instead — the memory cap already
    # holds, and a k=1 two-pass would only pay the extra forward.  So one
    # config stays valid across slice sizes; a chunk that is smaller than
    # but does not divide the per-device batch still raises.  None
    # disables.  With dropout the chunked
    # path draws per-chunk keys (a different — equally valid — dropout
    # realization than the unchunked step; pass 3 regenerates pass 1's
    # exact masks, so the gradients are consistent either way).
    embedding_chunk: int | None = None
    # fail fast on a poisoned run: when the loss read at a log boundary is
    # non-finite, fit() raises FloatingPointError instead of silently
    # burning the remaining steps (the last good checkpoint on disk is the
    # recovery point; granularity = log_every, which already pays the
    # host sync — per-step checking would serialize dispatch).  For
    # root-causing use utils.profiling.nan_debug / checked instead.
    abort_on_nonfinite: bool = True
    # train steps executed per dispatch: >1 runs a lax.scan of that many
    # steps inside ONE jitted call, so per-dispatch host/runtime latency
    # amortizes across the chunk (measured on the v5e tunnel: the bare
    # loss chain drops from 3.2 to 1.5 ms/step between 20- and 100-step
    # dispatches).  Data for the chunk is stacked to [n, b, ...] and
    # shipped in one transfer; multi-host runs stack per-process shards
    # on the host and stitch the global chunk (data.stack_batches +
    # fit(prestacked=True), wired by the train CLI — fit's own in-dispatch
    # stacking is the only piece that requires a single process).
    # Trade-offs: metrics/should_stop granularity becomes n steps, each
    # resident data chunk costs n× the batch HBM footprint (the CLI
    # prefetches one chunk ahead), and a final tail shorter than n pays
    # one extra scan compile.
    steps_per_call: int = 1
    # stacked-chunk H2D byte budget for steps_per_call > 1.  A stacked
    # [n, b, ...] chunk is ONE resident transfer of n x batch-bytes (and
    # the CLI prefetches a second chunk ahead), so a large steps_per_call
    # with sequence towers can exceed HBM before the step even traces
    # (e.g. 8 x 4096 x [S, D] fp32 ~ 13 GiB — BASELINE.md, GradCache
    # section).  None (default) derives a budget of bytes_limit/4 from
    # the device's memory stats (2 GiB when the backend reports none);
    # any positive int overrides it; 0 disables the guard.  fit() falls
    # back to sequential single-step dispatch with a warning when the
    # chunk would blow the budget; a direct train_steps() call (and the
    # prestacked multi-host path, whose chunks are stacked upstream)
    # raises with the computed sizes instead.
    max_stacked_bytes: int | None = None
    # CLIP-style learnable temperature: the criterion's logit_scale
    # parameter (vestigial in the reference, loss.py:52) becomes live —
    # effective temperature = cfg.temperature / exp(logit_scale), starting
    # at cfg.temperature (logit_scale init 0 under this option).  Works
    # with the jnp losses and with crossclr_intra_fused (the dual Pallas
    # kernel takes τ as a traced SMEM scalar).
    learnable_temperature: bool = False
    # Polyak/exponential moving average of the parameters (e.g. 0.999):
    # each step ema = d·ema + (1−d)·params.  The EMA tree rides the
    # TrainState (checkpointed, sharded like the live params) and is what
    # `eval --ema` / `serve --ema` encode with — the standard trick for
    # smoother retrieval numbers late in training.  Initialized AT the
    # initial params (no zero-init bias); enable it from step 0, since a
    # checkpoint without the EMA tree cannot restore into a state that
    # has one.  None (default) carries no EMA and costs nothing.
    ema_decay: float | None = None
    # model selection: rank the eval-boundary checkpoints by this eval
    # metric (e.g. "v2t/R@1") and retain the best under
    # <checkpoint_dir>/best — a separate ranked manager, so the resume
    # checkpoints' latest-N retention is untouched.  Point eval/serve at
    # <dir>/best to use the selected model.  None (default) disables it.
    keep_best_metric: str | None = None
    # evaluate (and rank keep_best_metric) with the EMA parameters
    # instead of the live ones at each eval boundary; requires ema_decay
    eval_with_ema: bool = False
    seed: int = 0


class TrainState(train_state.TrainState):
    """Flax TrainState; model params include the towers only — the
    criterion's vestigial ``logit_scale`` is carried as an extra leaf so
    checkpoints mirror the reference's optimizer surface.

    ``ema_params``: exponential moving average of ``params`` when
    ``TrainConfig.ema_decay`` is set, else None (an empty pytree — no
    checkpoint or sharding footprint)."""

    ema_params: Any = None

    def as_ema(self) -> "TrainState":
        """This state with the EMA tree swapped in as the live params —
        what ``eval --ema`` / ``serve --ema`` encode with.  Requires
        ``TrainConfig.ema_decay`` to have been set (the restore template
        must carry the EMA tree for the checkpoint to load it)."""
        if self.ema_params is None:
            raise ValueError(
                "state carries no EMA tree: set train.ema_decay in the "
                "config (from step 0 of training)"
            )
        return self.replace(params=self.ema_params)


def make_loss_fn(cfg: TrainConfig, mesh: Mesh | None = None) -> Callable:
    """Return ``loss_fn(v_emb, t_emb, v_raw, t_raw) -> scalar``.

    When ``mesh`` spans >1 data-axis devices and ``cfg.global_negatives``,
    the CrossCLR-intra loss is computed with the globally-gathered
    candidate set inside ``shard_map`` (see parallel.global_loss); the
    returned callable must then be invoked *inside* the sharded region.
    """
    def temp_or(default):
        return lambda override: default if override is None else override

    _temp = temp_or(cfg.temperature)
    if cfg.loss == "crossclr_intra":
        return lambda v, t, vr=None, tr=None, temperature=None: F.cross_clr_intra(
            v, t,
            temperature=_temp(temperature),
            negative_weight=cfg.negative_weight,
        )
    if cfg.loss == "crossclr_intra_fused":
        # a pallas_call cannot be partitioned by GSPMD: when the step runs
        # under plain jit over a multi-device mesh (tensor parallelism, or
        # global_negatives=False with a sharded batch) the fused kernel
        # would force resharding or fail — use the XLA-fused jnp math
        # there; the shard_map path feeds the kernel per-device instead
        multi_device_gspmd = mesh is not None and mesh.devices.size > 1
        if multi_device_gspmd:
            return lambda v, t, vr=None, tr=None, temperature=None: F.cross_clr_intra(
                v, t,
                temperature=_temp(temperature),
                negative_weight=cfg.negative_weight,
            )
        return lambda v, t, vr=None, tr=None, temperature=None: cross_clr_intra_fused(
            v, t,
            temperature=_temp(temperature),  # traced τ: SMEM operand
            negative_weight=cfg.negative_weight,
            precision=cfg.loss_precision,
        )
    if cfg.loss in ("crossclr", "crossclr_fused"):
        # same GSPMD caveat as crossclr_intra_fused: under plain jit over a
        # multi-device mesh a pallas_call cannot be partitioned — the jnp
        # math runs there; shard_map (global negatives) feeds kernels
        # per-device instead
        multi_device_gspmd = mesh is not None and mesh.devices.size > 1
        if cfg.loss == "crossclr_fused" and not multi_device_gspmd:
            from ..ops.fused_global import cross_clr_fused

            return lambda v, t, vr=None, tr=None, temperature=None: cross_clr_fused(
                v,
                t,
                vr,
                tr,
                temperature=_temp(temperature),
                negative_weight=cfg.negative_weight,
                weight_temperature=cfg.weight_temperature,
                prune_percent=cfg.prune_percent,
                weight_norm=cfg.weight_norm,
                interpret=jax.default_backend() != "tpu",
                precision=cfg.loss_precision,
            )
        return lambda v, t, vr=None, tr=None, temperature=None: F.cross_clr(
            v,
            t,
            vr,
            tr,
            temperature=_temp(temperature),
            negative_weight=cfg.negative_weight,
            weight_temperature=cfg.weight_temperature,
            prune_percent=cfg.prune_percent,
            weight_norm=cfg.weight_norm,
        )
    if cfg.loss == "info_nce":
        return lambda v, t, vr=None, tr=None, temperature=None: F.info_nce(
            v, t, temperature=_temp(temperature)
        )
    if cfg.loss == "max_margin":
        return lambda v, t, vr=None, tr=None, temperature=None: F.max_margin(
            v, t, margin=cfg.margin
        )
    raise ValueError(f"unknown loss {cfg.loss!r}")


# losses that accept a traced (learnable) temperature: the jnp paths take
# it as a plain scalar; the fused path feeds it to the dual Pallas kernel
# as an SMEM operand with an exact hand-written temperature gradient
_TRACED_TEMP_LOSSES = (
    "crossclr_intra",
    "crossclr",
    "crossclr_fused",
    "info_nce",
    "crossclr_intra_fused",
)

# CLIP clamps exp(logit_scale) at 100 to prevent temperature collapse
# (sharper softmax monotonically decreases the loss on separable batches,
# so an unbounded scale diverges); same bound here, symmetric
_LOGIT_SCALE_BOUND = 4.6051702  # ln(100)


def _global_cross_clr_loss(
    v_emb: jax.Array,
    t_emb: jax.Array,
    v_raw: jax.Array,
    t_raw: jax.Array,
    cfg: TrainConfig,
    axis: str,
    temperature=None,
) -> jax.Array:
    """This shard's contribution to the global full-CrossCLR loss (paper
    variant: pruning + positive weighting over the GLOBAL batch), called
    inside the step's shard_map.  Local-contribution contract as
    :func:`_global_rows_loss`: the step psums loss and grads itself."""
    from ..parallel.global_loss import global_cross_clr_row_terms

    total, n = global_cross_clr_row_terms(
        v_emb, t_emb, v_raw, t_raw, axis,
        temperature=cfg.temperature if temperature is None else temperature,
        negative_weight=cfg.negative_weight,
        weight_temperature=cfg.weight_temperature,
        prune_percent=cfg.prune_percent,
        weight_norm=cfg.weight_norm,
        candidate_chunk=cfg.global_candidate_chunk,
        use_fused=cfg.loss == "crossclr_fused",
        precision=cfg.loss_precision,
    )
    return total / (2 * n)


def _global_rows_loss(
    v_emb: jax.Array,
    t_emb: jax.Array,
    cfg: TrainConfig,
    axis: str,
    use_fused: bool = False,
    temperature=None,
) -> jax.Array:
    """This shard's contribution to the global-negative CrossCLR loss,
    called inside the step's shard_map (row losses via the shared
    parallel.global_loss.global_row_losses; ``use_fused`` routes through
    the rectangular Pallas kernels).

    Returns the LOCAL contribution only — differentiating through a psum
    inside a shard_map body re-psums the cotangent (each device would see
    an n_devices-times gradient), so the step psums loss and grads itself.
    (The standalone global_cross_clr_intra API instead differentiates
    through the shard_map boundary, where the in-body psum is correct.)
    """
    from ..parallel.global_loss import global_row_losses

    loss_v, loss_t, n = global_row_losses(
        v_emb, t_emb, axis,
        temperature=cfg.temperature if temperature is None else temperature,
        negative_weight=cfg.negative_weight,
        use_fused=use_fused,
        precision=cfg.loss_precision,
    )
    return (jnp.sum(loss_v) + jnp.sum(loss_t)) / (2 * n)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.learning_rate,
        warmup_steps=cfg.warmup_steps,
        decay_steps=max(cfg.total_steps, cfg.warmup_steps + 1),
    )
    def decay_mask(params):
        # CLIP-style: never weight-decay the temperature parameter — decay
        # would bias the learned temperature toward its init (and drift the
        # vestigial parity value); everything else decays
        return jax.tree_util.tree_map_with_path(
            lambda path, _: not (
                len(path) == 1
                and getattr(path[0], "key", None) == "logit_scale"
            ),
            params,
        )

    if cfg.optimizer == "adamw":
        tx = optax.adamw(
            schedule, weight_decay=cfg.weight_decay, mask=decay_mask
        )
    elif cfg.optimizer == "lamb":
        tx = optax.lamb(
            schedule, weight_decay=cfg.weight_decay, mask=decay_mask
        )
    else:
        raise ValueError(
            f"TrainConfig.optimizer must be 'adamw' or 'lamb', got "
            f"{cfg.optimizer!r}"
        )
    return optax.chain(optax.clip_by_global_norm(cfg.clip_norm), tx)


def stitch_host_replicated(sharding, full: np.ndarray, global_shape):
    """Globally-sharded array from a HOST-REPLICATED numpy batch.

    Each addressable device receives exactly the global rows the sharding
    assigns to it (``addressable_devices_indices_map``), so placement is
    correct under ANY mesh device order — including hybrid multi-slice
    layouts (``make_mesh(dcn=...)``) where a process's rows are neither
    contiguous nor process-sorted.  Row identity matters here (eval
    embeddings must line up with host-side ids), unlike the train stream,
    where each host feeds its own shard and the global batch is an
    unordered union (data/datasets.py prefetch path).
    """
    arrs = [
        jax.device_put(full[idx], d)
        for d, idx in sharding.addressable_devices_indices_map(
            tuple(global_shape)
        ).items()
    ]
    return jax.make_array_from_single_device_arrays(
        tuple(global_shape), sharding, arrs
    )


def process_local_rows(
    n_rows: int, process_index: int, process_count: int
) -> tuple[int, int]:
    """Row block ``[start, stop)`` of a host-replicated batch owned by one
    process under a leading-axis data sharding over PROCESS-SORTED device
    order (plain ``make_mesh``; hybrid meshes need
    :func:`stitch_host_replicated` instead).  Requires
    ``n_rows % process_count == 0`` so blocks are equal-sized.
    """
    if n_rows % process_count:
        raise ValueError(
            f"{n_rows} rows not divisible by {process_count} processes"
        )
    per = n_rows // process_count
    return process_index * per, (process_index + 1) * per


def _tp_spec_for_param(path: tuple, value) -> P:
    """Tensor-parallel PartitionSpec for one tower parameter.

    Megatron-style column/row split of the MLP pair over the ``model``
    axis: the hidden dimension is sharded, activations stay sharded
    between fc1 and fc2, and XLA inserts the reducing collective after
    the row-parallel matmul.  Attention is split over heads.  Everything
    unmatched (biases, layernorms, embeddings) is replicated.
    """
    names = tuple(str(p) for p in path)
    leaf = names[-1]
    parent = names[-2] if len(names) >= 2 else ""
    if leaf == "kernel":
        if parent in ("fc1", "skip", "input_proj"):
            return P(None, MODEL_AXIS)  # column-parallel: shard output dim
        if parent in ("fc2", "output_proj"):
            return P(MODEL_AXIS, None)  # row-parallel: shard input dim
        if parent in ("query", "key", "value"):
            return P(None, MODEL_AXIS, None)  # shard attention heads
        if parent == "out":
            return P(MODEL_AXIS, None, None)
        if parent.startswith("Dense_") and hasattr(value, "shape"):
            # transformer block MLP: (embed, hidden) then (hidden, embed)
            if value.shape[0] < value.shape[-1]:
                return P(None, MODEL_AXIS)
            if value.shape[0] > value.shape[-1]:
                return P(MODEL_AXIS, None)
    if leaf == "bias" and parent in ("fc1", "input_proj"):
        return P(MODEL_AXIS)
    return P()


def _zero1_spec(base: P, value, n_data: int) -> P:
    """ZeRO-1 PartitionSpec for one optimizer-moment / EMA leaf: ``base``
    (the parameter's tensor-parallel spec, or P()) with the DATA axis
    added on the first dim it divides that isn't already sharded.  Leaves
    with no qualifying dim (scalars like logit_scale, tiny biases) stay
    on ``base`` — replicating them costs nothing."""
    shape = getattr(value, "shape", ())
    if not shape or n_data <= 1:
        return base
    parts = list(base) + [None] * (len(shape) - len(base))
    for i, dim in enumerate(shape):
        if parts[i] is None and dim >= n_data and dim % n_data == 0:
            parts[i] = DATA_AXIS
            return P(*parts)
    return base


class Trainer:
    """Owns model init, the jitted sharded train step, and eval encoding.

    Parallelism layout over the mesh (see parallel.mesh):
      * ``data`` axis — batch sharding (+ all-gathered global negatives
        through shard_map when the loss is a CrossCLR-intra variant)
      * ``model`` axis — Megatron-style tensor parallelism of the tower
        matmuls via parameter PartitionSpecs; XLA/GSPMD inserts the
        collectives.  When the model axis is active the step runs under
        plain jit (GSPMD), which also computes global negatives
        implicitly since the loss sees the full (sharded) batch.
    """

    def __init__(
        self,
        video_cfg: TowerConfig,
        text_cfg: TowerConfig,
        train_cfg: TrainConfig,
        mesh: Mesh | None = None,
    ):
        # attention="flash" is a pallas_call: GSPMD cannot partition it, so
        # under a multi-device mesh (towers run under plain jit for TP /
        # non-global losses, and ALWAYS for Trainer.encode) it would force
        # resharding or fail to compile — same constraint make_loss_fn
        # routes around for the loss kernels.  Fall back to the numerically
        # identical XLA attention and say so.
        if mesh is not None and mesh.devices.size > 1:
            import dataclasses as _dc
            import sys as _sys

            def _demote_flash(cfg_, name):
                if cfg_.attention != "flash":
                    return cfg_
                if jax.process_index() == 0:
                    print(
                        f"{name}: attention='flash' cannot run under GSPMD "
                        "on a multi-device mesh; using 'xla' (identical "
                        "values; dropout masks are drawn differently but "
                        "both are iid Bernoulli). For sequence parallelism "
                        "use attention='ring'.",
                        file=_sys.stderr,
                    )
                return _dc.replace(cfg_, attention="xla")

            video_cfg = _demote_flash(video_cfg, "video_cfg")
            text_cfg = _demote_flash(text_cfg, "text_cfg")
        # mesh/seq_axis reach the towers for attention="ring" (sequence
        # parallelism over the model axis); inert otherwise
        self.model = DualEncoder(
            video_cfg, text_cfg, mesh=mesh, seq_axis=MODEL_AXIS
        )
        self.video_cfg = video_cfg
        self.text_cfg = text_cfg
        self.cfg = train_cfg
        self.mesh = mesh
        self._train_step = None
        self._train_multi = None
        self._raw_step = None
        self._encode = None
        self._encode_one: dict = {}
        # once-per-fit decision: stacked chunks over budget -> sequential
        self._seq_fallback: bool | None = None
        # once-per-Trainer: the fit()-startup weighting diagnostic
        self._weight_diag_done = False

    # -- diagnostics ---------------------------------------------------------

    def weight_degeneracy_check(
        self, batch: dict, *, max_rows: int = 4096
    ) -> dict[str, float] | None:
        """Effective-sample-size fraction of the full-CrossCLR positive
        weights on a real batch (per modality, in (0, 1]; 1.0 = flat,
        → 1/B = one-hot).  Returns None for losses without a weighting
        channel.  Runs the SAME connectivity/weight arithmetic as the loss
        (losses.functional.connectivity_keep_and_weights) on up to
        ``max_rows`` rows — a distributional diagnostic, cheap enough to
        run once at fit() startup even for 32k batches."""
        if self.cfg.loss not in ("crossclr", "crossclr_fused"):
            return None
        fracs = {}
        for name in ("video", "text"):
            x = jnp.asarray(batch[name][:max_rows], jnp.float32)
            mask = batch.get(f"{name}_mask")
            if mask is not None:
                mask = jnp.asarray(mask[:max_rows])
            conn = F.connectivity_scores(F.masked_mean_pool(x, mask))
            _, w = F.connectivity_keep_and_weights(
                conn,
                prune_percent=self.cfg.prune_percent,
                weight_temperature=self.cfg.weight_temperature,
                weight_norm=getattr(self.cfg, "weight_norm", "raw"),
            )
            fracs[name] = float(F.weight_effective_fraction(w))
        return fracs

    # ESS fraction below this on the first batch = the weight softmax is
    # spending most of the batch's gradient on a handful of pairs
    _WEIGHT_ESS_WARN = 0.02

    def _warn_if_degenerate_weights(self, batch: dict) -> None:
        try:
            fracs = self.weight_degeneracy_check(batch)
        except Exception:  # noqa: BLE001 — a diagnostic must not kill fit
            return
        if not fracs or min(fracs.values()) >= self._WEIGHT_ESS_WARN:
            return
        if jax.process_index() != 0:
            return
        import sys as _sys

        detail = ", ".join(f"{k} ESS={v:.4f}" for k, v in fracs.items())
        print(
            "WARNING: the full-CrossCLR positive-weight softmax is "
            f"near-one-hot on the first batch ({detail}; 1.0 = flat "
            "weights): weight_temperature="
            f"{self.cfg.weight_temperature} is far below this data's "
            "connectivity spread, so most pairs contribute almost no "
            "gradient.  Raise train.weight_temperature, or set "
            'train.weight_norm="standardized" (z-scored connectivity) '
            "with weight_temperature ~ 1.0 for a scale-robust weighting "
            "channel.",
            file=_sys.stderr,
        )

    # -- init ---------------------------------------------------------------

    def init_state(self, sample_video: jax.Array, sample_text: jax.Array) -> TrainState:
        rng = jax.random.PRNGKey(self.cfg.seed)
        # int8-store samples: init only uses the samples for shape/dtype
        # propagation through the towers, so a plain float cast stands in
        # for dequantization (scales never change shapes).  Read .dtype
        # without jnp.asarray — that would commit the whole sample batch
        # to the device just to inspect its dtype
        def _is_int(x):
            return jnp.issubdtype(
                getattr(x, "dtype", None) or np.asarray(x).dtype, jnp.integer
            )

        if _is_int(sample_video):
            sample_video = jnp.asarray(sample_video, jnp.float32)
        if _is_int(sample_text):
            sample_text = jnp.asarray(sample_text, jnp.float32)
        params = self.model.init(rng, sample_video, sample_text)["params"]
        # criterion parameter: vestigial by default (reference-API parity,
        # loss.py:52), live when cfg.learnable_temperature — then it must
        # start at 0 so exp(logit_scale) = 1 reproduces cfg.temperature
        init_scale = 0.0 if self.cfg.learnable_temperature else 1.0
        params = dict(params, logit_scale=jnp.asarray(init_scale, jnp.float32))
        state = TrainState.create(
            apply_fn=self.model.apply,
            params=params,
            tx=make_optimizer(self.cfg),
        )
        if self.cfg.ema_decay is not None:
            if not 0.0 < self.cfg.ema_decay < 1.0:
                raise ValueError(
                    f"ema_decay must be in (0, 1), got {self.cfg.ema_decay}"
                )
            # start AT the initial params: no zero-init bias to correct.
            # A REAL copy, not an alias — the donated train step would
            # otherwise receive the same buffer twice
            state = state.replace(
                ema_params=jax.tree.map(jnp.copy, params)
            )
        if self.mesh is not None:
            state = self._place_state(state)
        return state

    def _state_specs(self, params) -> tuple[Any, Any]:
        """(param_specs, moment_specs) pytrees for a params-structured tree.

        ``param_specs``: tensor-parallel PartitionSpecs over the model axis
        when it is active, else replicated.  ``moment_specs``: what the
        optimizer moments and the EMA tree get — the param specs, plus
        (under ``TrainConfig.zero1``) the DATA axis on each leaf's first
        divisible unsharded dim (ZeRO-1 optimizer-state sharding).  Uses
        only leaf shapes, so it works on tracers inside the jitted step."""
        mesh = self.mesh
        if mesh.shape[MODEL_AXIS] > 1:
            param_specs = jax.tree_util.tree_map_with_path(
                lambda path, v: _tp_spec_for_param(
                    tuple(
                        getattr(p, "key", getattr(p, "idx", p)) for p in path
                    ),
                    v,
                ),
                params,
            )
        else:
            param_specs = jax.tree.map(lambda _: P(), params)
        n_data = mesh.shape[DATA_AXIS] if self.cfg.zero1 else 1
        if n_data > 1:
            moment_specs = jax.tree.map(
                lambda s, v: _zero1_spec(s, v, n_data), param_specs, params
            )
        else:
            moment_specs = param_specs
        return param_specs, moment_specs

    @staticmethod
    def _map_param_structured(opt_state, params, fn, fallback=None,
                              require: str | None = None):
        """Apply ``fn`` to every subtree of the optax state whose pytree
        structure equals the params' (the moment trees — adam/lamb mu and
        nu); ``fallback`` (optional) to any other array leaf.  Recurses
        through tuples (optax NamedTuple states), lists, and dicts (e.g.
        ``inject_hyperparams`` wraps the inner state under a dict-bearing
        node).  ``require``: if set and ``fn`` never fired, raise — a
        silent miss here would make ZeRO-1 a no-op with no warning."""
        params_structure = jax.tree.structure(params)
        hits = 0

        def walk(node):
            nonlocal hits
            if jax.tree.structure(node) == params_structure:
                hits += 1
                return fn(node)
            if isinstance(node, tuple):  # includes optax NamedTuple states
                placed = [walk(child) for child in node]
                return (
                    type(node)(*placed)
                    if hasattr(node, "_fields")
                    else tuple(placed)
                )
            if isinstance(node, list):
                return [walk(child) for child in node]
            if isinstance(node, dict):
                return {k: walk(v) for k, v in node.items()}
            if fallback is not None and hasattr(node, "shape"):
                return fallback(node)
            return node

        out = walk(opt_state)
        if require is not None and hits == 0:
            raise ValueError(
                f"no params-structured subtree found in the optimizer "
                f"state while {require}: the moment trees were not "
                f"located, so their sharding would silently not apply"
            )
        return out

    def _place_state(self, state: TrainState) -> TrainState:
        """Place the TrainState on the mesh: params with tensor-parallel
        PartitionSpecs (model axis active) or replicated; optimizer
        moments and the EMA tree with the same specs, data-axis-sharded on
        top under ZeRO-1 (TrainConfig.zero1); every other leaf (step,
        optimizer counters) replicated."""
        mesh = self.mesh
        param_specs, moment_specs = self._state_specs(state.params)

        def place(tree, specs):
            return jax.tree.map(
                lambda v, s: jax.device_put(v, NamedSharding(mesh, s)),
                tree,
                specs,
            )

        # moments mirror the param tree; shard them deliberately or every
        # apply_gradients inserts resharding copies
        opt_state = self._map_param_structured(
            state.opt_state,
            state.params,
            lambda node: place(node, moment_specs),
            fallback=lambda v: jax.device_put(v, NamedSharding(mesh, P())),
            require="placing optimizer moments on the mesh",
        )
        state = state.replace(
            params=place(state.params, param_specs),
            opt_state=opt_state,
            step=jax.device_put(state.step, NamedSharding(mesh, P())),
        )
        if state.ema_params is not None:
            # the EMA tree mirrors params — shard it like the moments (it
            # is consumed only at eval/serve boundaries, where GSPMD
            # gathers on demand) or every step's EMA update reshards
            state = state.replace(
                ema_params=place(state.ema_params, moment_specs)
            )
        return state

    def ema_state(self, state: TrainState) -> TrainState:
        """``state.as_ema()`` with the swapped-in tree re-placed to the
        PARAM shardings when ZeRO-1 sharded it over the data axis.
        Without the re-placement, every encode/serve dispatch that jits
        the EMA tree as its params argument compiles an all-gather of the
        whole tower that runs per call; one ``device_put`` here pays the
        gather once.  Use this (not ``state.as_ema()`` directly) wherever
        a Trainer is in hand."""
        out = state.as_ema()
        if (
            self.mesh is not None
            and self.cfg.zero1
            and self.mesh.shape[DATA_AXIS] > 1
        ):
            param_specs, _ = self._state_specs(out.params)
            out = out.replace(
                params=jax.tree.map(
                    lambda v, s: jax.device_put(
                        v, NamedSharding(self.mesh, s)
                    ),
                    out.params,
                    param_specs,
                )
            )
        return out

    # -- the step -----------------------------------------------------------

    def _build_step(self):
        from ..data.quantize import dequantize_batch

        cfg = self.cfg
        mesh = self.mesh
        model = self.model
        plain_loss = make_loss_fn(cfg, mesh)
        use_global = (
            mesh is not None
            and cfg.global_negatives
            and mesh.shape[DATA_AXIS] > 1
            and mesh.shape[MODEL_AXIS] == 1  # tp runs under plain GSPMD jit
            and cfg.loss in (
                "crossclr_intra", "crossclr_intra_fused",
                "crossclr", "crossclr_fused",
            )
        )

        needs_dropout = (
            self.video_cfg.dropout > 0 or self.text_cfg.dropout > 0
        )

        if use_global and "ring" in (
            self.video_cfg.attention, self.text_cfg.attention
        ):
            raise ValueError(
                "attention='ring' (sequence parallelism over the model "
                "axis) cannot run inside the data-axis global-negative "
                "shard_map; use n_model>1 (GSPMD computes global "
                "negatives implicitly) or global_negatives=False"
            )

        if cfg.learnable_temperature and cfg.loss not in _TRACED_TEMP_LOSSES:
            raise ValueError(
                f"learnable_temperature is not meaningful for loss "
                f"{cfg.loss!r}; use one of {_TRACED_TEMP_LOSSES}"
            )

        def apply_towers(towers, batch, step, chunk_idx=None):
            rngs = None
            if needs_dropout:
                # per-step dropout key, deterministic in (seed, step); inside
                # shard_map additionally fold in the shard index, or every
                # data shard would reuse the identical mask.  The two-pass
                # path folds in the chunk index too — and because the key
                # is a pure function of (seed, step, shard, chunk), the
                # vjp recompute in pass 3 regenerates pass 1's exact masks
                key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), step)
                if use_global:
                    key = jax.random.fold_in(
                        key, jax.lax.axis_index(DATA_AXIS)
                    )
                if chunk_idx is not None:
                    key = jax.random.fold_in(key, chunk_idx)
                rngs = {"dropout": key}
            return model.apply(
                {"params": towers},
                batch["video"],
                batch["text"],
                batch.get("video_mask"),
                batch.get("text_mask"),
                train=True,
                rngs=rngs,
            )

        def loss_from_embs(params, v_emb, t_emb, batch):
            temp = None
            if cfg.learnable_temperature:
                # effective τ = cfg.temperature / exp(logit_scale); traced
                # losses accept a traced temperature.  The RAW parameter is
                # used here — the step clamps the stored value after the
                # optimizer update (CLIP-style), so an in-graph clip (whose
                # gradient is zero outside the bound, latching the
                # temperature with no path back) is never needed
                temp = cfg.temperature / jnp.exp(params["logit_scale"])
            # connectivity inputs for the full-CrossCLR variants: pool
            # ragged sequences with their key-padding masks HERE, so the
            # loss layer scores only valid steps (a plain mean over S
            # would count padding frames — only accidentally harmless
            # when padding is exactly zero)
            v_raw = F.masked_mean_pool(batch["video"], batch.get("video_mask"))
            t_raw = F.masked_mean_pool(batch["text"], batch.get("text_mask"))
            if use_global:
                if cfg.loss in ("crossclr", "crossclr_fused"):
                    return _global_cross_clr_loss(
                        v_emb, t_emb, v_raw, t_raw,
                        cfg, DATA_AXIS, temperature=temp,
                    )
                # rect Pallas kernels take τ as a traced SMEM scalar
                # with an exact dτ, so learnable temperature composes
                return _global_rows_loss(
                    v_emb, t_emb, cfg, DATA_AXIS,
                    use_fused=cfg.loss == "crossclr_intra_fused",
                    temperature=temp,
                )
            return plain_loss(v_emb, t_emb, v_raw, t_raw, temperature=temp)

        def loss_for_batch(params, batch, step):
            towers = {k: v for k, v in params.items() if k != "logit_scale"}
            v_emb, t_emb = apply_towers(towers, batch, step)
            return loss_from_embs(params, v_emb, t_emb, batch), (v_emb, t_emb)

        def value_and_grad_two_pass(params, batch, step):
            """GradCache-style exact large-batch gradients (see
            TrainConfig.embedding_chunk).  Pass 1 encodes chunk-by-chunk
            under ``lax.scan`` (only each chunk's activations live);
            pass 2 differentiates the batch-coupled loss w.r.t. the
            embeddings (+ logit_scale); pass 3 re-runs each chunk's
            towers under ``jax.vjp`` with its embedding cotangent and
            accumulates parameter gradients."""
            towers = {k: v for k, v in params.items() if k != "logit_scale"}
            n = batch["video"].shape[0]
            c = cfg.embedding_chunk
            if n % c != 0:
                raise ValueError(
                    f"embedding_chunk {c} does not divide the "
                    f"(per-device) batch {n}"
                )
            k = n // c
            chunked = {
                key_: v.reshape((k, c) + v.shape[1:])
                for key_, v in batch.items()
            }
            idxs = jnp.arange(k)

            def enc(_, args):
                idx, chunk = args
                return None, apply_towers(towers, chunk, step, chunk_idx=idx)

            _, (v_emb, t_emb) = jax.lax.scan(enc, None, (idxs, chunked))
            v_emb = v_emb.reshape((n,) + v_emb.shape[2:])
            t_emb = t_emb.reshape((n,) + t_emb.shape[2:])

            (loss, (d_v, d_t, d_params)) = jax.value_and_grad(
                lambda v_e, t_e, p: loss_from_embs(p, v_e, t_e, batch),
                argnums=(0, 1, 2),
            )(v_emb, t_emb, params)
            # d_params carries the loss's direct parameter gradients
            # (logit_scale under learnable temperature; tower leaves are
            # zeros) — pass 3 adds the through-the-embeddings tower part

            d_v_c = d_v.reshape((k, c) + d_v.shape[1:])
            d_t_c = d_t.reshape((k, c) + d_t.shape[1:])

            def bwd(acc, args):
                idx, chunk, dv, dt = args
                _, vjp = jax.vjp(
                    lambda tw: apply_towers(tw, chunk, step, chunk_idx=idx),
                    towers,
                )
                (g,) = vjp((dv, dt))
                return jax.tree.map(jnp.add, acc, g), None

            g_towers, _ = jax.lax.scan(
                bwd,
                jax.tree.map(jnp.zeros_like, towers),
                (idxs, chunked, d_v_c, d_t_c),
            )
            grads = dict(d_params)
            for name, g in g_towers.items():
                grads[name] = jax.tree.map(jnp.add, d_params[name], g)
            return (loss, (v_emb, t_emb)), grads

        def compute_grads(params, step_no, batch):
            """Loss + parameter gradients + embedding-norm metrics.  Under
            use_global this is the shard_map body (each device sees its
            batch rows; psum makes loss/grads the true global ones) —
            crucially it touches only the PARAMS, never the optimizer
            moments, so ZeRO-1-sharded moments stay out of the shard_map
            and the optimizer update below runs under GSPMD."""
            # int8 feature stores: dequantize ON DEVICE (H2D moved int8
            # bytes; XLA fuses payload*scale into the first tower matmul's
            # operand fetch).  No-op for float batches — a trace-time
            # key check (see data.quantize)
            batch = dequantize_batch(batch)
            # embedding_chunk is an upper bound on rows encoded at once:
            # when the per-device batch already fits (chunk >= batch, the
            # k=1 degenerate), the two-pass would recompute the towers
            # for zero memory benefit — run the plain step.  Shapes are
            # static under jit, so this is a trace-time decision.
            if cfg.embedding_chunk and cfg.embedding_chunk < batch[
                "video"
            ].shape[0]:
                (loss, (v_emb, t_emb)), grads = value_and_grad_two_pass(
                    params, batch, step_no
                )
            else:
                (loss, (v_emb, t_emb)), grads = jax.value_and_grad(
                    loss_for_batch, has_aux=True
                )(params, batch, step_no)
            if use_global:
                # inside shard_map each device holds only its batch rows'
                # loss/gradient contribution; the true values are their sums
                loss = jax.lax.psum(loss, DATA_AXIS)
                grads = jax.tree.map(
                    lambda g: jax.lax.psum(g, DATA_AXIS), grads
                )
            v_norm = jnp.mean(jnp.linalg.norm(v_emb, axis=1))
            t_norm = jnp.mean(jnp.linalg.norm(t_emb, axis=1))
            if use_global:
                v_norm = jax.lax.pmean(v_norm, DATA_AXIS)
                t_norm = jax.lax.pmean(t_norm, DATA_AXIS)
            return loss, grads, {
                "video_emb_norm": v_norm, "text_emb_norm": t_norm,
            }

        zero1_on = (
            mesh is not None and cfg.zero1 and mesh.shape[DATA_AXIS] > 1
        )

        def constrain_zero1(new_state):
            """Pin the updated moments/EMA to their ZeRO-1 shardings so
            GSPMD keeps them data-sharded across steps (and scan
            iterations) instead of electing to replicate them — and pin
            the updated PARAMS back to the param specs, or GSPMD
            propagates the sharded optimizer update into the params
            output (data-sharded params after step 1 → a full recompile
            on the second dispatch, defeated donation, and a layout that
            violates the replicated-params contract encode/serve and
            checkpoints rely on)."""
            if not zero1_on:
                return new_state
            param_specs, moment_specs = self._state_specs(new_state.params)

            def cons(tree, specs):
                return jax.tree.map(
                    lambda v, s: jax.lax.with_sharding_constraint(
                        v, NamedSharding(mesh, s)
                    ),
                    tree,
                    specs,
                )

            new_state = new_state.replace(
                params=cons(new_state.params, param_specs),
                opt_state=self._map_param_structured(
                    new_state.opt_state,
                    new_state.params,
                    lambda node: cons(node, moment_specs),
                    require="pinning ZeRO-1 moment shardings",
                ),
            )
            if new_state.ema_params is not None:
                new_state = new_state.replace(
                    ema_params=cons(new_state.ema_params, moment_specs)
                )
            return new_state

        def finish(state: TrainState, loss, grads, aux):
            """Optimizer + EMA update from replicated gradients — always
            under plain jit/GSPMD so sharded moments work in every
            layout."""
            gnorm = optax.global_norm(grads)
            new_state = state.apply_gradients(grads=grads)
            if cfg.learnable_temperature:
                # clamp the STORED parameter after the optimizer step (as
                # CLIP does) so exp(logit_scale) stays in [1/100, 100] while
                # the loss always differentiates through an unclipped value
                new_state = new_state.replace(
                    params=dict(
                        new_state.params,
                        logit_scale=jnp.clip(
                            new_state.params["logit_scale"],
                            -_LOGIT_SCALE_BOUND,
                            _LOGIT_SCALE_BOUND,
                        ),
                    )
                )
            if cfg.ema_decay is not None:
                d = cfg.ema_decay
                # after the clamp so the EMA tracks the STORED logit_scale
                new_state = new_state.replace(
                    ema_params=jax.tree.map(
                        lambda e, p: d * e + (1.0 - d) * p,
                        new_state.ema_params,
                        new_state.params,
                    )
                )
            new_state = constrain_zero1(new_state)
            metrics = {"loss": loss, "grad_norm": gnorm, **aux}
            if cfg.learnable_temperature:
                # stored value is already clamped above
                metrics["logit_scale"] = new_state.params["logit_scale"]
                metrics["effective_temperature"] = cfg.temperature / jnp.exp(
                    new_state.params["logit_scale"]
                )
            return new_state, metrics

        def step(state: TrainState, batch):
            loss, grads, aux = compute_grads(state.params, state.step, batch)
            return finish(state, loss, grads, aux)

        if use_global:
            # shard_map so lax.all_gather/psum see the data axis; params
            # and step replicated, batch sharded on leading dim.  Only the
            # gradient computation runs inside — the optimizer update
            # (finish) stays under GSPMD, see compute_grads docstring.
            batch_spec = P(DATA_AXIS)
            grads_inner = jax.shard_map(
                compute_grads,
                mesh=mesh,
                in_specs=(P(), P(), batch_spec),
                out_specs=(P(), P(), P()),
                check_vma=False,
            )

            def sharded_step(state, batch):
                loss, grads, aux = grads_inner(state.params, state.step, batch)
                return finish(state, loss, grads, aux)

            self._raw_step = sharded_step
        else:
            self._raw_step = step
        return jax.jit(self._raw_step, donate_argnums=(0,))

    def train_step(self, state: TrainState, batch: dict) -> tuple[TrainState, dict]:
        if self._train_step is None:
            self._train_step = self._build_step()
        return self._train_step(state, batch)

    # -- stacked-chunk byte guard (see TrainConfig.max_stacked_bytes) -------

    def _stacked_budget(self) -> int:
        """Byte budget for ONE stacked ``[n, b, ...]`` chunk; 0 = unguarded."""
        if self.cfg.max_stacked_bytes is not None:
            return self.cfg.max_stacked_bytes
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            limit = int(stats.get("bytes_limit", 0))
        except Exception:  # noqa: BLE001 — backends without memory stats
            limit = 0
        # the chunk plus the prefetched next one should stay well under
        # half of HBM, leaving room for params/moments/activations
        return limit // 4 if limit else 2 << 30

    @staticmethod
    def _batch_bytes(batch: dict) -> int:
        """Resident bytes of a batch dict on the busiest device.  Host
        numpy (not yet sharded) counts in full — a conservative estimate
        for single-host multi-device meshes; override the budget if the
        guard is too tight for such a layout."""
        total = 0
        for v in batch.values():
            shards = getattr(v, "addressable_shards", None)
            n = max(s.data.size for s in shards) if shards else v.size
            total += int(n) * v.dtype.itemsize
        return total

    def train_steps(
        self,
        state: TrainState,
        stacked_batch: dict,
        limit: int | None = None,
    ) -> tuple[TrainState, dict]:
        """Run ``n`` chained train steps in ONE dispatch.

        ``stacked_batch``: dict of ``[n, b, ...]`` arrays (n batches
        stacked on a new leading axis).  Executes ``lax.scan`` over the
        exact same step function ``train_step`` jits, so the resulting
        state matches n sequential ``train_step`` calls; per-dispatch
        host/runtime latency is paid once for the whole chunk.  Returned
        metrics are stacked device arrays per key.

        ``limit``: run only the first ``limit`` steps of the chunk (the
        tail of a run whose remaining steps don't fill a chunk).  The
        slice happens inside the jit, so it works on globally-sharded
        multi-host chunks too; the trailing batches are discarded.  A
        distinct ``limit`` is a new static specialization — one extra
        scan compile, paid once at the very end of training.
        """
        if self._train_multi is None:
            if self._train_step is None:
                self._train_step = self._build_step()
            raw = self._raw_step

            def multi(state, batches, limit):
                if limit is not None:
                    batches = jax.tree.map(lambda v: v[:limit], batches)
                return jax.lax.scan(raw, state, batches)

            # jit respecializes per (stacked shape, static limit), so one
            # callable serves any chunk length
            self._train_multi = jax.jit(
                multi, static_argnums=(2,), donate_argnums=(0,)
            )
        n = next(iter(stacked_batch.values())).shape[0]
        if limit is not None and not (0 < limit <= n):
            raise ValueError(f"limit {limit} outside chunk length {n}")
        budget = self._stacked_budget()
        chunk_bytes = self._batch_bytes(stacked_batch)
        if budget and chunk_bytes > budget:
            # trace-time, not runtime: the whole chunk transfers (limit
            # slicing happens inside the jit), so an oversized chunk OOMs
            # before any compute — fail with the arithmetic instead
            raise ValueError(
                f"stacked chunk is {chunk_bytes / 2**30:.2f} GiB "
                f"({n} steps x {chunk_bytes / n / 2**20:.0f} MiB/batch), "
                f"over the {budget / 2**30:.2f} GiB chunk budget "
                "(device bytes_limit/4; the chunk plus the prefetched "
                "next one must leave HBM for params and activations) — "
                "lower train.steps_per_call, or raise/disable the guard "
                "via train.max_stacked_bytes (0 disables)"
            )
        return self._train_multi(state, stacked_batch, limit)

    # -- eval ---------------------------------------------------------------

    def encode(self, state: TrainState, batch: dict) -> tuple[jax.Array, jax.Array]:
        if self._encode is None:
            model = self.model
            mesh = self.mesh

            def _enc(params, batch):
                from ..data.quantize import dequantize_batch

                batch = dequantize_batch(batch)  # int8 stores (see step())
                towers = {k: v for k, v in params.items() if k != "logit_scale"}
                return model.apply(
                    {"params": towers},
                    batch["video"],
                    batch["text"],
                    batch.get("video_mask"),
                    batch.get("text_mask"),
                    train=False,
                )

            plain = jax.jit(_enc)
            if mesh is not None:
                # large eval sets: shard the batch over the data axis and
                # let GSPMD run the towers in parallel (embeddings come
                # back sharded the same way — fine for on-device metrics);
                # fall back to the replicated path when the eval batch
                # doesn't divide evenly
                batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
                sharded = jax.jit(_enc, in_shardings=(None, batch_sharding))
                n_data = mesh.shape[DATA_AXIS]

                def _dispatch(params, batch):
                    n = batch["video"].shape[0]
                    if n % n_data != 0:
                        return plain(params, batch)
                    if jax.process_count() > 1:
                        # host-local numpy cannot be consumed by a jit whose
                        # in_sharding spans non-addressable devices: place
                        # on each local device exactly the global rows the
                        # sharding assigns it (correct under any device
                        # order, incl. hybrid multi-slice meshes)
                        batch = {
                            k: stitch_host_replicated(
                                batch_sharding,
                                np.asarray(v),
                                (n,) + tuple(v.shape[1:]),
                            )
                            for k, v in batch.items()
                        }
                    return sharded(params, batch)

                self._encode = _dispatch
            else:
                self._encode = plain
        return self._encode(state.params, batch)

    def encode_modality_raw(self, side: str):
        """Un-jitted single-tower encode body ``(params, features, mask) ->
        emb``.  The ONE source of the tower-apply contract (logit_scale
        filtering, eval-mode apply) shared by :meth:`encode_modality`'s
        jit and the serving fused search — keep them from drifting."""
        if side not in ("video", "text"):
            raise ValueError(f"side must be 'video' or 'text', got {side!r}")
        model = self.model
        method = f"encode_{side}"

        def fn(params, features, mask):
            towers = {k: v for k, v in params.items() if k != "logit_scale"}
            return model.apply(
                {"params": towers}, features, mask, train=False, method=method
            )

        return fn

    def encode_modality(
        self,
        state: TrainState,
        side: str,
        features: jax.Array,
        mask: jax.Array | None = None,
    ) -> jax.Array:
        """Encode ONE modality through its own tower only.

        The serving hot path: a text query must not pay for the video tower
        (and vice versa), so this jits ``DualEncoder.encode_video`` /
        ``encode_text`` directly instead of the paired ``__call__``.
        Matches ``encode``'s embeddings exactly — same params, same tower.
        """
        fn = self._encode_one.get(side)
        if fn is None:
            fn = jax.jit(self.encode_modality_raw(side))
            self._encode_one[side] = fn
        return fn(state.params, features, mask)

    # -- loop ---------------------------------------------------------------

    def fit(
        self,
        state: TrainState,
        batches,
        *,
        steps: int,
        log_every: int = 50,
        writer: Any = None,
        step_offset: int | None = None,
        should_stop: Any = None,
        prestacked: bool = False,
    ) -> tuple[TrainState, list[dict]]:
        """Run ``steps`` train steps.  ``step_offset`` sets the global step
        reported in metrics (defaults to the state's own step counter, so
        chunked/resumed runs log a monotonically increasing step).
        ``should_stop``: optional zero-arg callable polled before each
        dispatch; returning True ends the loop early (preemption handling
        — the caller checkpoints whatever state comes back).

        With ``cfg.steps_per_call > 1`` (single-host), that many steps run
        inside each dispatch via :meth:`train_steps`; metrics are logged
        from the chunk's final step and the stop flag is polled once per
        chunk.  ``prestacked``: the iterator yields ``[n, b, ...]``
        chunks already stacked upstream (``data.stack_batches``, the
        multi-host path — host shards stack locally and prefetch stitches
        the global chunk); fit then dispatches whole chunks, trimming the
        final one to the remaining step count."""
        history = []
        it = iter(batches)
        if (
            self.cfg.loss in ("crossclr", "crossclr_fused")
            and steps > 0
            and not self._weight_diag_done
        ):
            # one-time weighting-channel diagnostic on the first batch —
            # a degenerate (near-one-hot) positive-weight softmax should
            # warn loudly instead of silently training on one pair.  The
            # guard is per-Trainer: train.py calls fit() once per eval
            # chunk, and re-running here would re-print the warning and
            # pay a blocking device sync every chunk
            self._weight_diag_done = True
            try:
                first = next(it)
            except StopIteration:
                first = None
            if first is not None:
                import itertools as _itertools

                diag = (
                    {k: v[0] for k, v in first.items()}
                    if prestacked
                    else first
                )
                self._warn_if_degenerate_weights(diag)
                it = _itertools.chain([first], it)
        if step_offset is None:
            step_offset = int(state.step)
        spc = max(1, getattr(self.cfg, "steps_per_call", 1))
        if spc > 1 and not prestacked and jax.process_count() > 1:
            # in-fit jnp.stack of globally-sharded per-process batches is
            # not possible eagerly — multi-host uses the prestacked path
            spc = 1
        t_start = time.perf_counter()
        t_steady = t_start  # reset after the first (compiling) dispatch
        steady_base = 0  # steps finished before the steady clock started
        done = 0
        while done < steps:
            if should_stop is not None and should_stop():
                break
            if prestacked:
                chunk = next(it)
                m = chunk["video"].shape[0]
                n = min(m, steps - done)
                state, stacked_metrics = self.train_steps(
                    state, chunk, limit=n if n < m else None
                )
                metrics = {k: v[-1] for k, v in stacked_metrics.items()}
                batch_rows = chunk["video"].shape[1]
            else:
                n = min(spc, steps - done)
                group = None
                if n > 1:
                    group = [next(it)]
                    if self._seq_fallback is None:
                        budget = self._stacked_budget()
                        per = self._batch_bytes(group[0])
                        self._seq_fallback = bool(budget) and spc * per > budget
                        if self._seq_fallback:
                            import sys as _sys

                            print(
                                f"steps_per_call={spc}: a stacked chunk "
                                f"would be {spc * per / 2**30:.2f} GiB "
                                f"({per / 2**20:.0f} MiB/batch), over the "
                                f"{budget / 2**30:.2f} GiB chunk budget — "
                                "falling back to sequential single-step "
                                "dispatch (raise train.max_stacked_bytes "
                                "to override; 0 disables the guard)",
                                file=_sys.stderr,
                            )
                    if self._seq_fallback:
                        n = 1
                if n == 1:
                    batch = group[0] if group else next(it)
                    state, metrics = self.train_step(state, batch)
                    batch_rows = batch["video"].shape[0]
                else:
                    group += [next(it) for _ in range(n - 1)]
                    stacked = {
                        k: jnp.stack([g[k] for g in group]) for k in group[0]
                    }
                    state, stacked_metrics = self.train_steps(state, stacked)
                    metrics = {k: v[-1] for k, v in stacked_metrics.items()}
                    batch_rows = group[0]["video"].shape[0]
            first_dispatch = done == 0
            prev_done, done = done, done + n
            if first_dispatch:
                # the first dispatch includes compilation; restart the
                # clock so steps/sec reflects steady-state throughput
                jax.block_until_ready(metrics["loss"])
                t_steady = time.perf_counter()
                steady_base = done
            crossed_log = (done // log_every) > (prev_done // log_every)
            if crossed_log or done >= steps:
                metrics = {k: float(v) for k, v in metrics.items()}
                if getattr(self.cfg, "abort_on_nonfinite", True) and not np.isfinite(
                    metrics["loss"]
                ):
                    raise FloatingPointError(
                        f"non-finite loss {metrics['loss']} at step "
                        f"{step_offset + done}; aborting (resume from the "
                        "last checkpoint; set train.abort_on_nonfinite="
                        "false to continue anyway, or use nan_debug to "
                        "locate the source)"
                    )
                if first_dispatch:
                    # only the compiling dispatch has run: report its
                    # honest (compile-inclusive) rate, not 1/epsilon
                    rate = n / max(t_steady - t_start, 1e-9)
                else:
                    rate = (done - steady_base) / max(
                        time.perf_counter() - t_steady, 1e-9
                    )
                metrics["steps_per_sec"] = rate
                metrics["pairs_per_sec"] = rate * batch_rows
                metrics["step"] = step_offset + done
                history.append(metrics)
                if writer is not None:
                    writer(metrics)
        return state, history
