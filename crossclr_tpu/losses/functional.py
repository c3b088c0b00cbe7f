"""Pure-functional CrossCLR losses in jnp — the numerical parity core.

Everything here is stateless, jit-friendly (static shapes, no Python control
flow on traced values), and differentiable with plain ``jax.grad``.

Parity surface (reference: ``/root/reference/trainer/loss.py``):

* :func:`cross_clr_intra_per_row` / :func:`cross_clr_intra` reproduce
  ``CrossCLR_onlyIntraModality.forward`` (loss.py:68-113) exactly, including
  the zeroed-diagonal quirk: the intra-modal self-similarity logit is
  *zeroed*, not excluded, so each softmax denominator carries a spurious
  ``exp(0) = 1`` term (loss.py:95-97).  The reference runs its softmax tail
  in float64 (numpy-eye masks promote, loss.py:102-104); we accumulate in
  fp32 by default, which matches within fp32 tolerance, and the functions
  honor float64 inputs when ``jax_enable_x64`` is on for bit-tight tests.
* :func:`max_margin` is the *intended* behavior of ``MaxMargin_coot``
  (loss.py:17-41) — the shipped class cannot be instantiated (NameError at
  loss.py:24: ``super(ContrastiveLoss_coot, ...)`` references an undefined
  name).
* :func:`cross_clr` is the full CrossCLR loss (inter+intra with
  influential-sample pruning and positive weighting).  The reference repo
  never shipped it (README.md:19 — only the onlyIntraModality variant was
  released); semantics follow the paper (arXiv 2109.14910): connectivity
  scores from *input* features, pruning of highly-connected samples from
  negative sets, and connectivity-softmax positive weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Similarity matmuls run at HIGHEST precision: JAX's default matmul precision
# may use bf16 passes (on TPU *and* the oneDNN CPU backend), which breaks the
# fp32-tolerance parity contract with the torch reference.  With fp32 inputs
# HIGHEST is true fp32 on the MXU; callers wanting bf16 speed pass bf16
# features (accumulation stays fp32 via preferred_element_type semantics).
_SIM_PRECISION = jax.lax.Precision.HIGHEST


def _matmul(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.matmul(a, b, precision=_SIM_PRECISION)


__all__ = [
    "l2_normalize",
    "cosine_sim",
    "cross_clr_intra",
    "cross_clr_intra_per_row",
    "cross_clr",
    "connectivity_scores",
    "connectivity_keep_and_weights",
    "normalized_connectivity",
    "weight_effective_fraction",
    "masked_mean_pool",
    "pooled_unit_inputs",
    "max_margin",
    "info_nce",
]


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2-normalize along ``axis`` with torch.nn.functional.normalize semantics.

    torch clamps the norm at ``eps`` (default 1e-12) rather than adding it,
    so we do the same for parity (reference normalizes at loss.py:79-80).
    """
    norm = jnp.linalg.norm(x, ord=2, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def cosine_sim(emb1: jax.Array, emb2: jax.Array) -> jax.Array:
    """Raw dot-product similarity matrix ``[B1, B2]``.

    Mirrors ``cosine_sim`` (loss.py:7-15), which — despite its docstring —
    does NOT normalize: it is cosine similarity only if inputs already are.
    """
    return _matmul(emb1, emb2.T)


def _intra_logit_rows(
    anchor_sim: jax.Array,
    inter_sim: jax.Array,
    temperature: float,
    negative_weight: float,
) -> jax.Array:
    """Per-row loss for one direction of CrossCLR_onlyIntraModality.

    ``inter_sim``: [B, B] cross-modal similarities (anchor rows).
    ``anchor_sim``: [B, B] intra-modal similarities of the anchor modality.

    Row i's candidate set is the 2B-column concatenation
    ``[inter / τ  ‖  w · ((anchor_sim / τ) ⊙ (1 − I))]`` (loss.py:90-100);
    the loss is ``−log softmax`` picked at the inter diagonal
    (loss.py:59-60,102-112).  Implemented as ``logsumexp(row) − z_ii`` —
    identical math, numerically stable.  The zeroed (NOT −inf) diagonal of
    the intra block is deliberate parity with loss.py:95-97.
    """
    b = inter_sim.shape[0]
    inter = inter_sim / temperature
    eye = jnp.eye(b, dtype=anchor_sim.dtype)
    intra = negative_weight * (anchor_sim / temperature) * (1.0 - eye)
    logits = jnp.concatenate([inter, intra], axis=1)  # [B, 2B]
    lse = jax.scipy.special.logsumexp(logits, axis=1)
    pos = jnp.diagonal(inter)
    return lse - pos


def cross_clr_intra_per_row(
    video_features: jax.Array,
    text_features: jax.Array,
    *,
    temperature: float = 0.03,
    negative_weight: float = 0.8,
) -> tuple[jax.Array, jax.Array]:
    """Per-row (video-anchored, text-anchored) CrossCLR-onlyIntraModality losses.

    Inputs are raw ``[B, D]`` features; both are L2-normalized internally
    (loss.py:79-80).  Defaults mirror loss.py:50.
    """
    with jax.named_scope("crossclr/normalize"):
        v = l2_normalize(video_features, axis=1)
        t = l2_normalize(text_features, axis=1)
    with jax.named_scope("crossclr/similarities"):
        sim_vt = _matmul(v, t.T)  # logits_per_vid (loss.py:83)
        sim_tv = sim_vt.T  # reference recomputes t @ v.T (loss.py:84); equal up to fp assoc
        sim_vv = _matmul(v, v.T)
        sim_tt = _matmul(t, t.T)
    with jax.named_scope("crossclr/row_losses"):
        loss_v = _intra_logit_rows(sim_vv, sim_vt, temperature, negative_weight)
        loss_t = _intra_logit_rows(sim_tt, sim_tv, temperature, negative_weight)
    return loss_v, loss_t


def cross_clr_intra(
    video_features: jax.Array,
    text_features: jax.Array,
    *,
    temperature: float = 0.03,
    negative_weight: float = 0.8,
) -> jax.Array:
    """CrossCLR-onlyIntraModality scalar loss (loss.py:44-113 parity).

    Returns ``(mean_i L^v_i + mean_i L^t_i) / 2`` (loss.py:113).
    """
    loss_v, loss_t = cross_clr_intra_per_row(
        video_features,
        text_features,
        temperature=temperature,
        negative_weight=negative_weight,
    )
    return (jnp.mean(loss_v) + jnp.mean(loss_t)) / 2


def info_nce(
    video_features: jax.Array,
    text_features: jax.Array,
    *,
    temperature: float = 0.03,
) -> jax.Array:
    """Symmetric InfoNCE (CLIP-style) over inter-modal logits only.

    Property anchor for tests: ``cross_clr_intra`` with ``negative_weight=0``
    equals InfoNCE whose denominator carries B extra ``exp(0)=1`` terms —
    see tests/test_properties.py.  This plain version is the standard loss
    offered alongside CrossCLR for ablation configs.
    """
    v = l2_normalize(video_features, axis=1)
    t = l2_normalize(text_features, axis=1)
    logits = _matmul(v, t.T) / temperature
    labels = jnp.arange(logits.shape[0])
    loss_v = _cross_entropy_rows(logits, labels)
    loss_t = _cross_entropy_rows(logits.T, labels)
    return (jnp.mean(loss_v) + jnp.mean(loss_t)) / 2


def _cross_entropy_rows(logits: jax.Array, labels: jax.Array) -> jax.Array:
    lse = jax.scipy.special.logsumexp(logits, axis=1)
    pos = jnp.take_along_axis(logits, labels[:, None], axis=1)[:, 0]
    return lse - pos


def pooled_unit_inputs(input_features: jax.Array) -> jax.Array:
    """Stop-gradient, mean-pooled, L2-normalized connectivity-scoring inputs.

    Shared by the single-device and global (shard_map) connectivity paths so
    both score on identical vectors.  Sequence inputs ``[B, S, D]`` are
    mean-pooled over time; scores come from FIXED input statistics per the
    paper — letting gradients flow (e.g. when embeddings double as scoring
    features) would open a loss-gaming channel through the near-one-hot
    weight softmax.
    """
    x = input_features.astype(jnp.float32)
    if x.ndim == 3:
        x = jnp.mean(x, axis=1)
    return jax.lax.stop_gradient(l2_normalize(x, axis=1))


def masked_mean_pool(x: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """Mean-pool ``[B, S, D]`` sequences to ``[B, D]``; with a ``[B, S]``
    key-padding mask (1 = valid), average only the valid steps.

    The connectivity-scoring entry point for ragged inputs: plain mean
    over all S steps is only padding-invariant when padded positions are
    exactly zero (and even then mis-scales by valid/S before the
    normalize), and real feature stores commonly pad by repeating the
    last frame.  Pooled ``[B, D]`` inputs pass through unchanged.
    """
    if x.ndim != 3:
        return x
    if mask is None:
        return jnp.mean(x.astype(jnp.float32), axis=1)
    w = mask.astype(jnp.float32)[:, :, None]
    denom = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    return jnp.sum(x.astype(jnp.float32) * w, axis=1) / denom


def connectivity_scores(input_features: jax.Array) -> jax.Array:
    """Per-sample connectivity (influence) score within one modality.

    Mean cosine similarity of sample i to the *other* samples of the batch,
    computed on input-space features (pre-encoder), per the CrossCLR paper:
    highly-connected samples are semantically entangled with many others and
    make harmful negatives.  Returns ``[B]``.

    Computed as ``(x_i · Σ_j x_j − ‖x_i‖²) / (B − 1)`` — one matrix-VECTOR
    product, O(B·D), instead of materializing the ``[B, B]`` similarity
    matrix and row-summing it (O(B²·D)): identical math up to fp
    association, and at the 4096×512 flagship shape the [B, B] form (two
    HIGHEST-precision B²D matmuls per step across the modalities) cost
    almost as much MXU time as the entire fused loss.
    """
    x = pooled_unit_inputs(input_features)
    b = x.shape[0]
    total = jnp.sum(x, axis=0)  # [D]
    off_sum = (
        jnp.matmul(x, total, precision=_SIM_PRECISION)
        - jnp.sum(x * x, axis=1)
    )
    return off_sum / jnp.maximum(b - 1, 1)


def normalized_connectivity(conn: jax.Array, weight_norm: str) -> jax.Array:
    """Connectivity scores as fed to the positive-weight softmax.

    ``"raw"`` is the paper's formula (softmax directly on the mean-cosine
    connectivity).  Its usable τ_w range depends on the SCALE of the
    connectivity spread: the paper default τ_w=0.0035 assumes real
    video/text feature statistics, and on inputs whose connectivity spread
    is wide (≫ τ_w) the softmax degenerates to near-one-hot — the batch
    effectively trains on one pair.  ``"standardized"`` divides out that
    scale first (``(c − mean) / max(std, 1e-6)``), making the weighting
    channel invariant to affine rescaling of the connectivity; pair it
    with τ_w ≈ 1.0 (a z-score softmax).  See weight_effective_fraction
    for the degeneracy diagnostic.
    """
    if weight_norm == "raw":
        return conn
    if weight_norm == "standardized":
        mu = jnp.mean(conn)
        sd = jnp.std(conn)
        return (conn - mu) / jnp.maximum(sd, 1e-6)
    raise ValueError(
        f"unknown weight_norm {weight_norm!r}: expected 'raw' or 'standardized'"
    )


def weight_effective_fraction(weights: jax.Array) -> jax.Array:
    """Effective-sample-size fraction of the positive weights, in (0, 1].

    ``ESS = (Σw)² / Σw²`` divided by N: 1.0 means flat weights (every pair
    contributes), → 1/N means a one-hot softmax (the batch trains on ONE
    pair).  Used by the trainer's startup diagnostic to refuse to train
    silently in the degenerate regime.
    """
    n = weights.shape[0]
    return jnp.square(jnp.sum(weights)) / (n * jnp.sum(jnp.square(weights)))


def connectivity_keep_and_weights(
    conn: jax.Array,
    *,
    prune_percent: float,
    weight_temperature: float,
    weight_norm: str = "raw",
) -> tuple[jax.Array, jax.Array]:
    """Keep mask + mean-one positive weights from a connectivity vector.

    Samples above the ``1 − prune_percent`` quantile are influential →
    pruned from the negative sets (``keep = False``); weights are
    ``softmax(norm(conn) / τ_w) · N`` so the weighted row-loss mean stays
    scaled like a plain mean.  ``weight_norm``: ``"raw"`` (paper formula,
    default) or ``"standardized"`` (scale-robust z-scores — see
    :func:`normalized_connectivity`).  SINGLE source of truth for this
    arithmetic — the jnp loss (cross_clr), the fused kernels
    (ops.cross_clr_fused), and the global-batch path
    (parallel.global_cross_clr_row_terms) must all stay numerically
    identical.
    """
    n = conn.shape[0]
    if prune_percent > 0.0:
        keep = conn <= jnp.quantile(conn, 1.0 - prune_percent)
    else:
        keep = jnp.ones((n,), dtype=bool)
    scores = normalized_connectivity(conn, weight_norm)
    weights = jax.nn.softmax(scores / weight_temperature) * n
    return keep, weights


def _pruned_direction_rows(
    inter_sim: jax.Array,
    anchor_sim: jax.Array,
    keep_inter_cols: jax.Array,
    keep_intra_cols: jax.Array,
    temperature: float,
    negative_weight: float,
) -> jax.Array:
    """Per-row full-CrossCLR loss for one direction with pruned negatives.

    Each negative column is pruned by ITS OWN modality's keep mask:
    ``keep_inter_cols`` is the other modality's (the inter columns are
    other-modality samples), ``keep_intra_cols`` the anchor modality's.
    False marks influential samples to drop.  The positive (diagonal)
    inter term is always kept.  Unlike the onlyIntraModality parity path,
    exclusion here is true −inf masking (no shipped reference dictates the
    exp(0) quirk for this variant).
    """
    b = inter_sim.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, dtype=inter_sim.dtype)
    eye = jnp.eye(b, dtype=bool)

    inter = inter_sim / temperature
    # negatives pruned; positives (diagonal) always kept
    inter_masked = jnp.where(keep_inter_cols[None, :] | eye, inter, neg_inf)

    intra = negative_weight * (anchor_sim / temperature)
    # self-similarity excluded outright; influential columns pruned
    intra_masked = jnp.where(keep_intra_cols[None, :] & ~eye, intra, neg_inf)

    logits = jnp.concatenate([inter_masked, intra_masked], axis=1)
    lse = jax.scipy.special.logsumexp(logits, axis=1)
    pos = jnp.diagonal(inter)
    return lse - pos


def cross_clr(
    video_features: jax.Array,
    text_features: jax.Array,
    video_inputs: jax.Array | None = None,
    text_inputs: jax.Array | None = None,
    *,
    temperature: float = 0.03,
    negative_weight: float = 0.8,
    weight_temperature: float = 0.0035,
    prune_percent: float = 0.10,
    weight_norm: str = "raw",
) -> jax.Array:
    """Full CrossCLR: inter+intra InfoNCE with influential-sample pruning
    and connectivity-weighted positives (paper arXiv 2109.14910; NOT in the
    released reference file — README.md:19 ships only onlyIntraModality).

    Args:
      video_features / text_features: learned embeddings ``[B, D]``.
      video_inputs / text_inputs: raw input-space features used for
        connectivity scoring.  Default to the embeddings themselves when
        omitted (the two-argument criterion signature still works).
      weight_temperature: softmax temperature for positive weights.
      prune_percent: fraction of the batch (per modality) treated as
        influential and removed from negative sets.  0 disables pruning.
      weight_norm: "raw" (paper formula) or "standardized" (scale-robust
        z-scored connectivity — see :func:`normalized_connectivity`).

    Per modality m with connectivity c^m: samples above the
    ``1 − prune_percent`` quantile of c^m are pruned from m's negative
    columns; per-row losses are averaged with weights
    ``softmax(c^m / τ_w) · B`` (mean-one normalization) so prototypical
    pairs pull harder.
    """
    if video_inputs is None:
        video_inputs = video_features
    if text_inputs is None:
        text_inputs = text_features

    v = l2_normalize(video_features, axis=1)
    t = l2_normalize(text_features, axis=1)
    sim_vt = _matmul(v, t.T)
    sim_vv = _matmul(v, v.T)
    sim_tt = _matmul(t, t.T)

    c_v = connectivity_scores(video_inputs)
    c_t = connectivity_scores(text_inputs)
    keep_v, w_v = connectivity_keep_and_weights(
        c_v, prune_percent=prune_percent,
        weight_temperature=weight_temperature, weight_norm=weight_norm,
    )
    keep_t, w_t = connectivity_keep_and_weights(
        c_t, prune_percent=prune_percent,
        weight_temperature=weight_temperature, weight_norm=weight_norm,
    )

    # video anchors: inter columns are text samples (prune by keep_t),
    # intra columns are video samples (prune by keep_v); symmetric for text
    loss_v = _pruned_direction_rows(
        sim_vt, sim_vv, keep_t, keep_v, temperature, negative_weight
    )
    loss_t = _pruned_direction_rows(
        sim_vt.T, sim_tt, keep_v, keep_t, temperature, negative_weight
    )
    return (jnp.mean(w_v * loss_v) + jnp.mean(w_t * loss_t)) / 2


def max_margin(
    im: jax.Array,
    s: jax.Array,
    *,
    margin: float = 0.1,
) -> jax.Array:
    """COOT bidirectional max-margin ranking loss — the *intended* behavior
    of ``MaxMargin_coot`` (loss.py:17-41; unrunnable as shipped — NameError
    at loss.py:24).

    ``scores = im @ s.T`` (raw dot products, loss.py:30 via cosine_sim);
    hinge costs against the diagonal in both directions with the diagonal
    zeroed (loss.py:34-40), summed and scaled by ``1/(B_im · B_s)``
    (loss.py:41).  Margin default mirrors loss.py:23.
    """
    if im.shape[0] != s.shape[0]:
        raise ValueError(
            f"max_margin needs paired batches (diagonal positives); got "
            f"{im.shape[0]} vs {s.shape[0]} rows"
        )
    scores = cosine_sim(im, s)
    diag = jnp.diagonal(scores)
    cost_s = jnp.clip(margin + scores - diag[:, None], min=0)
    cost_im = jnp.clip(margin + scores - diag[None, :], min=0)
    off = 1.0 - jnp.eye(scores.shape[0], dtype=scores.dtype)
    total = jnp.sum(cost_s * off) + jnp.sum(cost_im * off)
    return total / (im.shape[0] * s.shape[0])
