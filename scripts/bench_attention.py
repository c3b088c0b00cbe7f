"""Benchmark the flash-attention kernel vs XLA attention on the TPU.

Long-context support is a SURVEY.md §5 capability; this records the
measured evidence for it: fwd+bwd step time of the encoder attention at
growing sequence length, Pallas flash kernel (``ops/flash_attention.py``)
vs the jnp/XLA path (``mha_reference``), which materializes the
``[B, H, S, S]`` score tensor in HBM.  At the lengths where that tensor
(plus autodiff's saved probabilities) no longer fits, the XLA row records
the failure — that cliff IS the point of the flash path.

Usage: python scripts/bench_attention.py [out.json]

Timing is the bench.py methodology: dependency-chained ``lax.scan``
(q updates from its gradient each step) with a host-read fence, min over
repeated windows — per-dispatch tunnel latency (~30-40 ms) and executor
memoization both make naive loops lie (BASELINE.md).

FLOP model: 7 score-shaped matmuls per fwd+bwd step (QKᵀ, PV forward;
score recompute, dV, dP, dQ, dK backward) = ``7 · 2 · B·H·S²·Dh`` —
both paths run the same algorithm, so achieved TFLOP/s is comparable.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

# import the checkout this script lives in (path-insert rather than
# PYTHONPATH: the latter breaks axon plugin discovery on the TPU host)
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from crossclr_tpu.ops.flash_attention import (  # noqa: E402
    flash_attention,
    flash_supported,
    mha_reference,
)

K = 20
B, H, DH = 8, 8, 64
SEQ_LENS = (512, 1024, 2048, 4096, 8192)
PEAK_BF16_FLOPS = 197e12


def chained(attn_fn, k, v, mask):
    def loss(q):
        out = attn_fn(q, k, v, mask)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grad_fn = jax.value_and_grad(loss)

    def body(q, _):
        val, gq = grad_fn(q)
        return q - 1e-4 * gq, val

    return jax.jit(lambda q: jax.lax.scan(body, q, None, length=K))


def time_path(attn_fn, q, k, v, mask):
    f = chained(attn_fn, k, v, mask)
    vals = f(q)[1]
    first = float(vals[0])  # compile + full execution + host fence
    if not np.isfinite(first):
        return None, f"non-finite loss {first}"
    best = float("inf")
    for scale_ in (1.0, 1.0000001, 1.0000002):
        t0 = time.perf_counter()
        out = f(q * scale_)
        float(out[1][-1])
        best = min(best, (time.perf_counter() - t0) / K)
    return best, first


def main():
    rng = np.random.default_rng(0)
    results = []
    for s in SEQ_LENS:
        for masked in (False, True):
            if masked and s != 2048:
                continue  # one masked point is enough to price the mask
            q, k, v = (
                jnp.asarray(
                    rng.standard_normal((B, H, s, DH)) * 0.1, jnp.bfloat16
                )
                for _ in range(3)
            )
            mask = None
            if masked:
                lens = rng.integers(s // 2, s, size=B)
                mask = jnp.asarray(
                    np.arange(s)[None, :] < lens[:, None], jnp.float32
                )
            flops = 7 * 2 * B * H * s * s * DH
            row = {"seq": s, "masked": masked, "bh": B * H, "dh": DH}
            for name, fn in (
                ("xla", lambda q_, k_, v_, m_: mha_reference(q_, k_, v_, m_)),
                # flash_supported gates on backend, so off-TPU this row
                # is skipped rather than silently falling back to jnp
                ("flash", flash_attention),
            ):
                if name == "flash" and not flash_supported(s):
                    row[name] = "unsupported shape"
                    continue
                try:
                    dt, first = time_path(fn, q, k, v, mask)
                except Exception as e:  # noqa: BLE001 — record, keep going
                    row[name] = f"error: {type(e).__name__}: {str(e)[:100]}"
                    continue
                if dt is None:
                    row[name] = first
                    continue
                row[name] = {
                    "ms_per_step": round(dt * 1e3, 3),
                    "tflops": round(flops / dt / 1e12, 1),
                    "pct_bf16_peak": round(100 * flops / dt / PEAK_BF16_FLOPS, 1),
                }
                row.setdefault("_loss", {})[name] = first
            # paths must agree where both ran (bf16 inputs: loose gate)
            losses = row.pop("_loss", {})
            if len(losses) == 2:
                a, b_ = losses["xla"], losses["flash"]
                row["rel_diff"] = round(abs(a - b_) / max(abs(a), 1e-9), 5)
            results.append(row)
            print(json.dumps(row), flush=True)

    out = {"backend": jax.default_backend(), "k": K, "rows": results}
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_attention.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
