"""Benchmark harness — prints ONE JSON line with the headline metric.

Metric (BASELINE.json): contrastive pairs/sec/chip at bsz 4096, dim 512,
forward+backward of the CrossCLR-onlyIntraModality criterion.  Baseline:
the PyTorch reference (/root/reference/trainer/loss.py) measured at 497
pairs/s fwd+bwd on this machine's CPU (BASELINE.md; the repo publishes no
numbers and CUDA hardware is unavailable — see BASELINE.md notes).

Timing methodology: a K-step dependency-chained ``lax.scan`` (each step's
inputs are the previous step's gradient update), timed with start inputs
the device has never seen.  This defeats two failure modes of naive
loops on this runtime: async dispatch returning before execution, and the
remote executor memoizing identical (executable, inputs) dispatches —
repeated-input timing under-reports by >10x.

Candidates are gated on matching the parity-tested jnp loss within fp32
forward tolerance; the fastest passing implementation is the headline.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from crossclr_tpu.losses import cross_clr_intra
from crossclr_tpu.ops import cross_clr_intra_fused

BASELINE_PAIRS_PER_SEC = 497.0  # torch reference fwd+bwd, bsz 4096 (BASELINE.md)
B, D = 4096, 512
K = 20  # chained steps per timed dispatch
FP32_FORWARD_TOL = 2e-5  # fp32 parity tolerance vs the torch reference


def _chained(loss_fn):
    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1))

    def body(carry, _):
        v, t = carry
        loss, (gv, gt) = grad_fn(v, t)
        return (v - 0.01 * gv, t - 0.01 * gt), loss

    return jax.jit(lambda v, t: jax.lax.scan(body, (v, t), None, length=K))


def _time_chain(f, v_warm, t_warm, v_run, t_run):
    # compile + full-execution warmup on distinct inputs; the fence is a
    # HOST READ of the final chained loss — block_until_ready alone has
    # been observed returning before execution on this runtime
    float(f(v_warm, t_warm)[1][-1])
    best = float("inf")
    first_loss = None
    # min over repeats: the tunnel to the chip is time-shared and a single
    # window can be several times slower than the device's true rate
    for v, t in (
        (v_run, t_run),
        (v_run * 1.0000001, t_run),
        (v_run, t_run * 1.0000001),
    ):
        t0 = time.perf_counter()
        out = f(v, t)
        float(out[1][-1])  # forces the whole dependency chain
        best = min(best, (time.perf_counter() - t0) / K)
        if first_loss is None:
            first_loss = float(out[1][0])
    return best, first_loss  # per-step seconds, first-step loss


def main():
    rng = np.random.default_rng(0)
    v_warm = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    t_warm = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    v_run = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    t_run = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)

    # parity anchor: the jnp path is itself tested against the torch
    # reference (tests/test_parity.py)
    ref_loss = float(jax.jit(cross_clr_intra)(v_run, t_run))

    candidates = {"jnp_xla": cross_clr_intra}
    if jax.default_backend() == "tpu":
        candidates["pallas_fused_highest"] = lambda a, b: cross_clr_intra_fused(a, b)
        candidates["pallas_fused_default"] = lambda a, b: cross_clr_intra_fused(
            a, b, precision="default"
        )

    results = {}
    excluded = {}
    best_name, best_dt = None, float("inf")
    for name, loss_fn in candidates.items():
        try:
            dt, first_loss = _time_chain(
                _chained(loss_fn), v_warm, t_warm, v_run, t_run
            )
        except Exception as e:
            excluded[name] = f"error: {type(e).__name__}: {str(e)[:120]}"
            continue
        # `not (<= tol)` so NaN losses fail the gate too
        if not (abs(first_loss - ref_loss) <= FP32_FORWARD_TOL):
            excluded[name] = (
                f"parity gate: loss {first_loss} vs ref {ref_loss}"
            )
            continue
        results[name] = round(B / dt, 1)
        if dt < best_dt:
            best_name, best_dt = name, dt

    if best_name is None:
        print(json.dumps({"error": "no candidate passed", "excluded": excluded}))
        raise SystemExit(1)

    pairs_per_sec = B / best_dt
    print(
        json.dumps(
            {
                "metric": f"crossclr_pairs_per_sec_per_chip_bsz{B}_fwdbwd",
                "value": round(pairs_per_sec, 1),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 2),
                "impl": best_name,
                "step_ms": round(best_dt * 1e3, 3),
                "backend": jax.default_backend(),
                "all_impls_pairs_per_sec": results,
                **({"excluded": excluded} if excluded else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
