"""Dual video/text encoder towers (Flax linen).

The reference ships no model code — its README (README.md:30-32) assumes
the user brings ``[bsz, f_dim]`` features from their own encoders; the
paper trained COOT-style dual towers over pre-extracted S3D video and text
features.  This module supplies the TPU-native equivalents
(BASELINE.json configs 2-4):

* :class:`MLPTower` — projection tower over pooled, pre-extracted clip /
  caption features (the paper's actual setting).
* :class:`TransformerTower` — small transformer encoder over *sequences*
  of features (frame features / token embeddings) with masked mean
  pooling, for config 3's "dual transformer encoders".
* :class:`DualEncoder` — bundles a video tower and a text tower behind one
  ``apply``; emits L2-normalizable embeddings for the contrastive loss.

TPU notes: every matmul runs in ``dtype`` (bf16 by default) with fp32
parameters and fp32 layernorm statistics — the standard mixed-precision
recipe; static shapes throughout so XLA tiles cleanly onto the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["MLPTower", "TransformerTower", "DualEncoder", "TowerConfig"]


@dataclasses.dataclass(frozen=True)
class TowerConfig:
    """Static architecture config for one tower."""

    kind: str = "mlp"  # "mlp" | "transformer"
    input_dim: int = 512
    embed_dim: int = 256
    hidden_dim: int = 1024
    num_layers: int = 2
    num_heads: int = 8
    max_seq_len: int = 32
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16
    # rematerialize transformer blocks in the backward pass: trades FLOPs
    # for activation memory (jax.checkpoint), the standard recipe for deep
    # towers at large batch
    remat: bool = False
    # attention implementation for transformer towers (SURVEY §5
    # long-context):
    #   "xla"   — nn.MultiHeadDotProductAttention; materializes [B,H,S,S]
    #             scores; supports attention-probability dropout.
    #   "flash" — Pallas blockwise online-softmax kernel (ops.flash_attention):
    #             scores never leave VMEM; long single-chip sequences.
    #   "ring"  — sequence-parallel ring attention over the mesh `model`
    #             axis (parallel.ring_attention): sequences longer than
    #             one chip; requires a mesh on the owning DualEncoder.
    #             Long LOCAL shards automatically run the flash kernels
    #             per ring block (ring-of-flash) where supported.
    # flash AND ring apply true attention-PROBABILITY dropout (a stateless
    # hash mask on GLOBAL (bh, query, key) indices regenerated per tile by
    # all three kernels — ops/flash_attention.py; each ring step passes
    # its block's global window offsets, so the sequence-sharded mask
    # equals the single-chip one).
    attention: str = "xla"
    # ring attention per-block math: "auto" (flash kernels when the local
    # shape supports them, else jnp), "jnp", or "flash"; ring_interpret
    # runs those kernels under the Pallas interpreter (CPU tests).
    ring_block_impl: str = "auto"
    ring_interpret: bool = False


class MLPTower(nn.Module):
    """Gated MLP projection over pooled features.

    ``num_layers`` residual blocks of feature → Dense(hidden) → GELU →
    Dense(embed) with a linear skip, then a final fp32 LayerNorm —
    mirroring (and stacking) the gated-embedding units used by COOT-style
    retrieval towers.  The first block's skip/fc1 read ``input_dim``;
    later blocks operate at ``embed_dim``.
    """

    cfg: TowerConfig

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        cfg = self.cfg
        h = x.astype(cfg.dtype)
        for layer in range(max(cfg.num_layers, 1)):
            suffix = "" if layer == 0 else f"_{layer}"
            skip = nn.Dense(cfg.embed_dim, dtype=cfg.dtype, name=f"skip{suffix}")(h)
            y = nn.Dense(cfg.hidden_dim, dtype=cfg.dtype, name=f"fc1{suffix}")(h)
            y = nn.gelu(y)
            if cfg.dropout > 0:
                y = nn.Dropout(cfg.dropout, deterministic=not train)(y)
            y = nn.Dense(cfg.embed_dim, dtype=cfg.dtype, name=f"fc2{suffix}")(y)
            h = skip + y
        # LayerNorm statistics in fp32 for stability
        return nn.LayerNorm(dtype=jnp.float32, name="norm")(h.astype(jnp.float32))


class _MHA(nn.Module):
    """Multi-head attention whose core runs the flash Pallas kernel or
    sequence-parallel ring attention (``cfg.attention``).

    Parameter names/shapes mirror ``nn.MultiHeadDotProductAttention``
    (``query/key/value`` DenseGeneral to ``(heads, head_dim)``, ``out``
    DenseGeneral back), so the trainer's tensor-parallel PartitionSpecs
    apply unchanged.
    """

    cfg: TowerConfig
    mesh: Any = None
    seq_axis: str | None = None

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        cfg = self.cfg
        if cfg.embed_dim % cfg.num_heads:
            raise ValueError(
                f"embed_dim {cfg.embed_dim} not divisible by num_heads "
                f"{cfg.num_heads}"
            )
        head_dim = cfg.embed_dim // cfg.num_heads

        def proj(name):
            return nn.DenseGeneral(
                features=(cfg.num_heads, head_dim), dtype=cfg.dtype, name=name
            )(x)

        # [B, S, H, Dh] -> [B, H, S, Dh]
        q, k, v = (
            jnp.swapaxes(proj(n), 1, 2) for n in ("query", "key", "value")
        )
        # true probability dropout on both kernel paths, matching the xla
        # path's nn.MultiHeadDotProductAttention(dropout_rate=...); the
        # kernels' hash mask wants a fresh <2^23 scalar per step
        drop = dict(dropout_rate=0.0, dropout_seed=0)
        if cfg.dropout > 0 and train:
            drop = dict(
                dropout_rate=cfg.dropout,
                dropout_seed=jax.random.randint(
                    self.make_rng("dropout"), (), 0, 1 << 23
                ),
            )
        if cfg.attention == "flash":
            from ..ops.flash_attention import flash_attention

            out = flash_attention(q, k, v, mask, **drop)
        elif cfg.attention == "ring":
            from ..parallel.ring_attention import sequence_parallel_attention

            if self.mesh is None:
                raise ValueError(
                    "attention='ring' needs a mesh: construct the "
                    "DualEncoder/TransformerTower with mesh=..."
                )
            out = sequence_parallel_attention(
                q, k, v, mask, mesh=self.mesh, axis=self.seq_axis or "model",
                block_impl=cfg.ring_block_impl, interpret=cfg.ring_interpret,
                **drop,
            )
        else:
            raise ValueError(f"unknown attention impl {cfg.attention!r}")
        out = jnp.swapaxes(out, 1, 2).astype(cfg.dtype)
        return nn.DenseGeneral(
            features=cfg.embed_dim, axis=(-2, -1), dtype=cfg.dtype, name="out"
        )(out)


class _Block(nn.Module):
    cfg: TowerConfig
    mesh: Any = None
    seq_axis: str | None = None

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        cfg = self.cfg
        y = nn.LayerNorm(dtype=jnp.float32)(x.astype(jnp.float32)).astype(cfg.dtype)
        if cfg.attention == "xla":
            attn_mask = None
            if mask is not None:
                attn_mask = nn.make_attention_mask(mask, mask, dtype=cfg.dtype)
            y = nn.MultiHeadDotProductAttention(
                num_heads=cfg.num_heads,
                dtype=cfg.dtype,
                dropout_rate=cfg.dropout,
                deterministic=not train,
            )(y, y, mask=attn_mask)
        else:
            y = _MHA(cfg, self.mesh, self.seq_axis)(y, mask, train)
        x = x + y
        y = nn.LayerNorm(dtype=jnp.float32)(x.astype(jnp.float32)).astype(cfg.dtype)
        y = nn.Dense(cfg.hidden_dim, dtype=cfg.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(cfg.embed_dim, dtype=cfg.dtype)(y)
        return x + y


class TransformerTower(nn.Module):
    """Transformer encoder over ``[B, S, input_dim]`` feature sequences.

    Learned positional embeddings, pre-norm blocks, masked mean pooling,
    and a projection to ``embed_dim``.  ``mask``: ``[B, S]`` (1 = valid).
    """

    cfg: TowerConfig
    mesh: Any = None
    seq_axis: str | None = None

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: jax.Array | None = None, *, train: bool = False
    ) -> jax.Array:
        cfg = self.cfg
        b, s, _ = x.shape
        if s > cfg.max_seq_len:
            raise ValueError(
                f"sequence length {s} exceeds TowerConfig.max_seq_len "
                f"{cfg.max_seq_len} (positional embedding table size)"
            )
        h = nn.Dense(cfg.embed_dim, dtype=cfg.dtype, name="input_proj")(
            x.astype(cfg.dtype)
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (cfg.max_seq_len, cfg.embed_dim),
            jnp.float32,
        )
        h = h + pos[None, :s, :].astype(cfg.dtype)
        # static_argnums: 3 is `train` in (self, x, mask, train)
        block_cls = nn.remat(_Block, static_argnums=(3,)) if cfg.remat else _Block
        for layer in range(cfg.num_layers):
            h = block_cls(
                cfg, self.mesh, self.seq_axis, name=f"block_{layer}"
            )(h, mask, train)
        h = nn.LayerNorm(dtype=jnp.float32, name="final_norm")(
            h.astype(jnp.float32)
        )
        if mask is None:
            pooled = jnp.mean(h, axis=1)
        else:
            w = mask.astype(jnp.float32)[:, :, None]
            pooled = jnp.sum(h * w, axis=1) / jnp.maximum(
                jnp.sum(w, axis=1), 1.0
            )
        return nn.Dense(cfg.embed_dim, dtype=jnp.float32, name="output_proj")(pooled)


def _build_tower(
    cfg: TowerConfig, name: str, mesh=None, seq_axis: str | None = None
) -> nn.Module:
    if cfg.kind == "mlp":
        return MLPTower(cfg, name=name)
    if cfg.kind == "transformer":
        return TransformerTower(cfg, mesh, seq_axis, name=name)
    raise ValueError(f"unknown tower kind: {cfg.kind!r}")


class DualEncoder(nn.Module):
    """Video tower + text tower → ``(video_emb, text_emb)`` in fp32.

    Output embeddings are NOT normalized — the criterion normalizes
    (parity with loss.py:79-80, which normalizes inside the loss).
    """

    video_cfg: TowerConfig
    text_cfg: TowerConfig
    # device mesh + sequence axis, needed only for attention="ring" towers
    mesh: Any = None
    seq_axis: str | None = None

    def setup(self):
        self.video_tower = _build_tower(
            self.video_cfg, "video_tower", self.mesh, self.seq_axis
        )
        self.text_tower = _build_tower(
            self.text_cfg, "text_tower", self.mesh, self.seq_axis
        )

    def __call__(
        self,
        video: jax.Array,
        text: jax.Array,
        video_mask: jax.Array | None = None,
        text_mask: jax.Array | None = None,
        *,
        train: bool = False,
    ) -> tuple[jax.Array, jax.Array]:
        v = self._apply_tower(self.video_tower, self.video_cfg, video, video_mask, train)
        t = self._apply_tower(self.text_tower, self.text_cfg, text, text_mask, train)
        return v.astype(jnp.float32), t.astype(jnp.float32)

    def encode_video(self, video, mask=None, *, train: bool = False) -> jax.Array:
        return self._apply_tower(
            self.video_tower, self.video_cfg, video, mask, train
        ).astype(jnp.float32)

    def encode_text(self, text, mask=None, *, train: bool = False) -> jax.Array:
        return self._apply_tower(
            self.text_tower, self.text_cfg, text, mask, train
        ).astype(jnp.float32)

    @staticmethod
    def _apply_tower(tower, cfg, x, mask, train):
        if cfg.kind == "transformer":
            return tower(x, mask, train=train)
        if mask is not None:
            raise ValueError(
                "a sequence mask was provided but the tower kind is "
                f"{cfg.kind!r} (pooled features; masks apply to "
                "transformer towers only)"
            )
        return tower(x, train=train)
