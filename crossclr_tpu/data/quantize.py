"""int8 feature-store quantization: per-row symmetric scales.

The paper's datasets ship as fp32 feature archives; the reference loads
them as-is (README.md:30-32 `[bsz, f_dim]` tensors).  At pod-scale
batches the HOST side — disk, page cache, gather bandwidth, and H2D
bytes — becomes the training bottleneck (scripts/bench_input_pipeline.py
measures each leg), so the framework supports progressively narrower
feature stores: fp32 → bf16 (`prepare_features --dtype bfloat16`) → int8
(this module), at 4× fewer bytes than fp32 end to end.

Scheme: symmetric per-row int8.  For each clip row ``x`` (all of
``[D]`` or ``[S, D]``), ``scale = max|x| / 127`` and the payload is
``round(x / scale)`` — the same scheme as ``evaluation.quantize_corpus``
uses for embedding indexes, chosen here for the same reason: features
are consumed row-at-a-time by the towers, and one fp32 scale per row
costs 4 bytes against D (or S·D) payload bytes.

Dequantization happens ON DEVICE, inside the jitted step
(`Trainer._build_step` / `Trainer.encode` call :func:`dequantize_batch`
first), so the H2D transfer moves int8 bytes and XLA fuses the
``payload * scale`` multiply into the first tower matmul's operand
fetch.  Worst-case per-element error is ``scale/2 = max|x|/254``
(~0.4% of the row's dynamic range) — measured end to end on the
variant-ordering benchmark in tests/test_data_pipeline.py.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "quantize_features",
    "dequantize",
    "dequantize_batch",
    "symmetric_int8_rows",
]

# batch keys carrying quantization scales, and the feature key each scales
SCALE_KEYS = {"video_scale": "video", "text_scale": "text"}


def symmetric_int8_rows(flat, xp=np):
    """THE per-row symmetric int8 quantizer: ``[N, K]`` → (int8 payload,
    fp32 scales ``[N]``).  Shared by feature stores (this module) and the
    serving/eval corpus index (``evaluation.quantize_corpus`` /
    ``_quantize_queries``) so the guards cannot drift.

    Guards: all-zero rows get scale 1.0 (payload zero either way, and
    ``dequantize`` never multiplies with a zero scale); tiny rows floor
    the scale at 1e-12 — ``amax/127`` for a denormal ``amax`` underflows
    fp32 to 0.0, which would otherwise divide-by-zero and poison the
    int8 cast.  Pass ``xp=jnp`` to trace the same math inside jit
    (NaN checking is host-only: traced code cannot raise on values).
    """
    amax = xp.max(xp.abs(flat), axis=1)
    if xp is np and not np.isfinite(amax).all():
        bad = np.where(~np.isfinite(np.asarray(amax)))[0]
        raise ValueError(
            f"non-finite values in rows {bad[:8].tolist()}"
            f"{'...' if bad.size > 8 else ''} — refusing to quantize "
            "(rint(NaN) poisons the int8 payload silently)"
        )
    scale = xp.where(
        amax > 0, xp.maximum(amax / 127.0, 1e-12), 1.0
    ).astype(xp.float32)
    q = xp.round(flat / scale[:, None]).astype(xp.int8)
    return q, scale


def quantize_features(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """fp32 features ``[N, D]`` / ``[N, S, D]`` → (int8 payload, fp32
    per-row scales ``[N]``) via :func:`symmetric_int8_rows`.
    """
    x = np.asarray(x, dtype=np.float32)
    if x.ndim < 2:
        raise ValueError(f"expected [N, D] or [N, S, D] features, got {x.shape}")
    q, scale = symmetric_int8_rows(x.reshape(x.shape[0], -1))
    return q.reshape(x.shape), scale


def dequantize(features, scale):
    """``features * scale`` with the per-row scale broadcast over the
    trailing dims — jnp-traceable (used inside jit) and numpy-compatible.
    """
    import jax.numpy as jnp

    extra = features.ndim - scale.ndim
    return features.astype(jnp.float32) * scale.reshape(
        scale.shape + (1,) * extra
    )


def dequantize_batch(batch: dict) -> dict:
    """Replace int8 feature entries with dequantized fp32 and drop the
    scale keys; identity (same dict object) when no scales are present.

    Key presence is a trace-time decision, so this is free inside jit for
    non-quantized batches.  Works on ``[B, ...]`` batches and
    ``[n, B, ...]`` stacked chunks alike (scales are ``[B]`` / ``[n, B]``).
    """
    present = [k for k in SCALE_KEYS if k in batch]
    if not present:
        return batch
    out = dict(batch)
    for skey in present:
        fkey = SCALE_KEYS[skey]
        out[fkey] = dequantize(out[fkey], out.pop(skey))
    return out
