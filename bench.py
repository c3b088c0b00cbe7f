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

MFU estimate: each implementation's ACTUAL similarity/gradient dot count
(in 2·B²·D FLOP units) times the MXU pass multiplier (fp32 HIGHEST dots
execute as 3 bf16-grade passes on v5e; DEFAULT/bf16 as 1), divided by the
measured step time and the chip's 197 TFLOP/s bf16 peak.  It measures MXU
occupancy of the kernel schedule, not algorithmic efficiency — the dual
kernel needs FEWER units (10 vs 12) for the same loss.

Also benchmarked: the rectangular global-negative kernels at the config-5
shape (4096 local rows x 32768 gathered candidates) — the per-device hot
path of the 32k-batch pod-slice configuration — in all precision tiers
plus the PRUNED (full-CrossCLR keep-mask) variant at the default tier.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from crossclr_tpu.losses import cross_clr_intra
from crossclr_tpu.ops import cross_clr_intra_fused

BASELINE_PAIRS_PER_SEC = 497.0  # torch reference fwd+bwd, bsz 4096 (BASELINE.md)
B, D = 4096, 512
# Regression floors (TPU only): set beneath the documented ±10-15% tunnel
# band of the measurements (r4: default tier 4.25M pairs/s at K=500,
# scanned train step 2.36M at chunk 256; r5: full-CrossCLR fused 1.52
# ms/step, rect global default/pruned 20.9/21.2 ms — BASELINE.md) so a
# kernel-routing or tiling regression fails the driver run loudly
# instead of quietly shrinking BENCH_r*.json.
FLOOR_DEFAULT_PAIRS_PER_SEC = 3.0e6
FLOOR_SCANNED_PAIRS_PER_SEC = 1.8e6
FLOOR_FULL_CROSSCLR_MS = 2.1  # r5 measured 1.52 (sym-pruned kernels + O(B·D) connectivity)
FLOOR_GLOBAL_ROWS_MS = 26.0  # r4/r5 measured 20.9-21.2 for default/pruned_default


def _floors_enabled(on_tpu: bool) -> bool:
    """Floors are calibrated to THIS rig (v5e-class chip over the tunnel).
    CROSSCLR_BENCH_FLOORS=1/0 forces them on/off; otherwise they enforce
    only on the calibrated device tier, so running the bench on a
    smaller/slower TPU records numbers instead of failing spuriously
    (ADVICE r4)."""
    env = os.environ.get("CROSSCLR_BENCH_FLOORS")
    if env is not None:
        return env.lower() not in ("0", "false", "off", "no")
    if not on_tpu:
        return False
    kind = jax.devices()[0].device_kind.lower()
    return "v5 lite" in kind or "v5e" in kind
# Chained steps per timed dispatch.  This runtime reaches the chip through
# a remote tunnel whose per-DISPATCH latency is ~30-40 ms; a production
# training loop runs thousands of steps back-to-back, so the steady-state
# rate is the amortized one.  Measured K sweep (r4, same kernels):
# K=100 -> 1.213 ms/step, K=200 -> 1.055, K=300 -> 1.008, K=500 -> 0.964
# — converging on the XProf-traced 0.921 ms/step device-busy floor of
# the symmetric kernels (see BASELINE.md); K=500 sits at 96% of it.
K = 500
FP32_FORWARD_TOL = 2e-5  # fp32 parity tolerance vs the torch reference
PEAK_BF16_FLOPS = 197e12  # v5e TensorCore peak

# (dot units in 2*B^2*D FLOPs, MXU pass multiplier) per implementation:
# jnp fwd = 3 sims, bwd = 2 per sim = 6 -> 9 units, all HIGHEST (3-pass,
# and autodiff reuses the saved [B,2B] softmax instead of recomputing
# logits — the memory/FLOPs trade the fused kernels refuse);
# highest AND default tiers = symmetric static-max kernels: fwd 2.125 +
# bwd 6.125 units (lower-triangle intra tiles at ts=512; since r3 the
# default tier routes here too, with bf16 operand fetch — fewer
# scheduled FLOPs, so its est_mfu reads lower even though it is faster).
_IMPL_COST = {
    "jnp_xla": (9, 3),
    "pallas_fused_highest": (8.25, 3),
    "pallas_fused_default": (8.25, 1),
}


def _chained(loss_fn):
    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1))

    def body(carry, _):
        v, t = carry
        loss, (gv, gt) = grad_fn(v, t)
        return (v - 0.01 * gv, t - 0.01 * gt), loss

    return jax.jit(lambda v, t: jax.lax.scan(body, (v, t), None, length=K))


def _time_chain(f, v_warm, t_warm, v_run, t_run, k=K):
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
        best = min(best, (time.perf_counter() - t0) / k)
        if first_loss is None:
            first_loss = float(out[1][0])
    return best, first_loss  # per-step seconds, first-step loss


def _bench_global_rows(rng):
    """Rectangular kernels at the 32k-candidate config-5 shape.

    Per-device work of one pod-slice step: both directions' row-block lse
    (4096 anchors x 32768 gathered candidates) + positives, fwd+bwd.
    Returns {tier: ms} for the tiers that compile and produce finite loss.
    """
    from crossclr_tpu.ops.fused_global import fused_lse_rows
    from crossclr_tpu.losses.functional import l2_normalize

    n_global, k = 32768, 5
    v_all = l2_normalize(
        jnp.asarray(rng.standard_normal((n_global, D)), jnp.float32), 1
    )
    t_all = l2_normalize(
        jnp.asarray(rng.standard_normal((n_global, D)), jnp.float32), 1
    )
    off = jnp.zeros((), jnp.float32)

    keep_v = jnp.asarray(rng.random(n_global) > 0.1)
    keep_t = jnp.asarray(rng.random(n_global) > 0.1)

    out = {}
    for tier in ("highest", "default", "bf16", "pruned_default"):
        pruned = tier == "pruned_default"
        prec = "default" if pruned else tier

        def loss_fn(v_all_, t_all_, prec=prec, pruned=pruned):
            v_loc = jax.lax.dynamic_slice(v_all_, (0, 0), (B, D))
            t_loc = jax.lax.dynamic_slice(t_all_, (0, 0), (B, D))
            masks_v = (
                dict(keep_inter=keep_t, keep_intra=keep_v) if pruned else {}
            )
            masks_t = (
                dict(keep_inter=keep_v, keep_intra=keep_t) if pruned else {}
            )
            lse_v = fused_lse_rows(
                v_loc, v_all_, t_all_, off, precision=prec, **masks_v
            )
            lse_t = fused_lse_rows(
                t_loc, t_all_, v_all_, off, precision=prec, **masks_t
            )
            pos = jnp.sum(v_loc * t_loc, axis=1, keepdims=True) / 0.03
            return (jnp.mean(lse_v - pos) + jnp.mean(lse_t - pos)) / 2

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1))

        def body(carry, _):
            va, ta = carry
            loss, (gv, gt) = grad_fn(va, ta)
            return (va - 0.01 * gv, ta - 0.01 * gt), loss

        f = jax.jit(
            lambda va, ta: jax.lax.scan(body, (va, ta), None, length=k)
        )
        try:
            dt, first_loss = _time_chain(
                f, v_all, t_all, v_all * 1.0000001, t_all, k=k
            )
        except Exception as e:  # noqa: BLE001 — report, don't crash bench
            out[tier] = f"error: {type(e).__name__}: {str(e)[:80]}"
            continue
        if not np.isfinite(first_loss):
            out[tier] = f"non-finite loss {first_loss}"
            continue
        out[tier] = round(dt * 1e3, 2)
    return out


def _bench_full_crossclr(rng):
    """Single-chip FULL CrossCLR (paper loss: connectivity scoring +
    pruning + positive weighting) through ops.cross_clr_fused at the
    flagship 4096×512 shape, default tier — the per-step hot path of
    configs/fullcrossclr_fused_ragged.json.  r5: routes the pruned keep
    masks through the symmetric static-max kernels and scores
    connectivity as one matrix-VECTOR product (O(B·D)); measured 1.52
    ms/step vs r4's 2.90 (chained-scan, this methodology)."""
    from crossclr_tpu.ops.fused_global import cross_clr_fused

    k = 100
    grad_fn = jax.value_and_grad(
        lambda a, b: cross_clr_fused(a, b, precision="default"),
        argnums=(0, 1),
    )

    def body(carry, _):
        v, t = carry
        loss, (gv, gt) = grad_fn(v, t)
        return (v - 0.01 * gv, t - 0.01 * gt), loss

    f = jax.jit(lambda v, t: jax.lax.scan(body, (v, t), None, length=k))
    v = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    try:
        dt, first_loss = _time_chain(f, v, t, v * 1.0000001, t, k=k)
    except Exception as e:  # noqa: BLE001 — report, don't crash bench
        return {"full_crossclr_fused_error": f"{type(e).__name__}: {str(e)[:80]}"}
    if not np.isfinite(first_loss):
        return {"full_crossclr_fused_error": f"non-finite loss {first_loss}"}
    return {"full_crossclr_fused_ms": round(dt * 1e3, 3)}


def _bench_train_step(rng, on_tpu):
    """End-to-end delivered throughput of the REAL jitted Trainer step.

    Flagship MLP config (configs/youcook2_mlp.json tower dims: video
    512->2048->256, text 384->2048->256, bf16 matmuls / fp32 params) +
    fused CrossCLR loss at the default tier + AdamW + clipping, bsz 4096.
    Unlike the headline (bare criterion fwd+bwd in a chained scan), this
    times sequential `train_step` dispatches — including tower fwd/bwd,
    optimizer update, and per-step dispatch overhead — i.e. what `fit`
    actually delivers.  Dispatches are never memoized: the donated state
    differs every step.
    """
    from crossclr_tpu.models import TowerConfig
    from crossclr_tpu.training import TrainConfig, Trainer

    b = B if on_tpu else 256  # CPU smoke only; the driver benches on TPU
    video_cfg = TowerConfig(
        kind="mlp", input_dim=512, embed_dim=256, hidden_dim=2048,
        dtype=jnp.bfloat16,
    )
    text_cfg = TowerConfig(
        kind="mlp", input_dim=384, embed_dim=256, hidden_dim=2048,
        dtype=jnp.bfloat16,
    )
    tcfg = TrainConfig(
        loss="crossclr_intra_fused" if on_tpu else "crossclr_intra",
        loss_precision="default",
        warmup_steps=5,
        total_steps=100000,
        max_stacked_bytes=0,  # the chunk below is built DEVICE-side and
        # sized deliberately; the host-chunk guard doesn't apply
    )
    trainer = Trainer(video_cfg, text_cfg, tcfg, mesh=None)
    batch = {
        "video": jnp.asarray(rng.standard_normal((b, 512)), jnp.float32),
        "text": jnp.asarray(rng.standard_normal((b, 384)), jnp.float32),
    }
    state = trainer.init_state(batch["video"][:2], batch["text"][:2])

    # compile + one full execution before timing
    state, m = trainer.train_step(state, batch)
    loss0 = float(m["loss"])
    if not np.isfinite(loss0):
        return {"train_step_error": f"non-finite warmup loss {loss0}"}

    k = 10
    best = float("inf")
    for _ in range(3):  # min over repeats: the tunnel is time-shared
        t0 = time.perf_counter()
        for _ in range(k):
            state, m = trainer.train_step(state, batch)
        float(m["loss"])  # host read fences the whole window
        best = min(best, (time.perf_counter() - t0) / k)
    out = {
        "train_step_pairs_per_sec": round(b / best, 1),
        "train_step_ms": round(best * 1e3, 3),
        "train_step_bsz": b,
    }

    # scanned variant (TrainConfig.steps_per_call): n steps per dispatch —
    # the steady-state pipeline rate with dispatch latency amortized.
    # The batch repeats within the chunk but the carried state differs
    # every scan iteration, so no dispatch/result can be memoized.
    # Chunk sweep (r4): 64 -> 2.10 ms/step, 128 -> 1.85, 192 -> 1.81,
    # 256 -> 1.73 against a 1.63 ms/step device-busy floor that is
    # itself at roofline (XProf: tower matmuls 0.74 ms at 91% of bf16
    # peak, loss kernels 0.50 at 73%, HBM-bound optimizer/norm/metrics
    # ~0.4).  256 = 3.8 GB stacked on-device chunk (this bench builds it
    # device-side; real training guards host chunks via
    # TrainConfig.max_stacked_bytes).
    n = 256 if on_tpu else 4
    stacked = {k_: jnp.stack([v_] * n) for k_, v_ in batch.items()}
    state, ms = trainer.train_steps(state, stacked)
    if not np.isfinite(float(ms["loss"][-1])):
        out["train_step_scanned_error"] = "non-finite loss"
        return out
    best_s = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, ms = trainer.train_steps(state, stacked)
        float(ms["loss"][-1])
        best_s = min(best_s, (time.perf_counter() - t0) / n)
    out["train_step_scanned_ms"] = round(best_s * 1e3, 3)
    out["train_step_scanned_pairs_per_sec"] = round(b / best_s, 1)
    out["train_step_scanned_chunk"] = n
    return out


def main():
    rng = np.random.default_rng(0)
    v_warm = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    t_warm = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    v_run = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    t_run = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)

    # parity anchor: the jnp path is itself tested against the torch
    # reference (tests/test_parity.py)
    ref_loss = float(jax.jit(cross_clr_intra)(v_run, t_run))

    on_tpu = jax.default_backend() == "tpu"
    candidates = {"jnp_xla": cross_clr_intra}
    if on_tpu:
        candidates["pallas_fused_highest"] = lambda a, b: cross_clr_intra_fused(a, b)
        candidates["pallas_fused_default"] = lambda a, b: cross_clr_intra_fused(
            a, b, precision="default"
        )

    results = {}
    mfu = {}
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
        units, passes = _IMPL_COST[name]
        mfu[name] = round(
            units * passes * 2 * B * B * D / dt / PEAK_BF16_FLOPS, 3
        )
        if dt < best_dt:
            best_name, best_dt = name, dt

    if best_name is None:
        print(json.dumps({"error": "no candidate passed", "excluded": excluded}))
        raise SystemExit(1)

    global_rows = _bench_global_rows(rng) if on_tpu else {}
    full_crossclr = _bench_full_crossclr(rng) if on_tpu else {}
    train_step = _bench_train_step(rng, on_tpu)

    # Perf floors (calibrated-tier TPU only, see _floors_enabled): a
    # routing/tiling regression should FAIL the driver run, not just
    # record a smaller number.  All four judged hot paths are floored:
    # the intra default tier, the scanned train step, the single-chip
    # full-CrossCLR path, and the rect global tiers (config 5).
    floor_failures = []
    if _floors_enabled(on_tpu):
        default_rate = results.get("pallas_fused_default", 0.0)
        if default_rate < FLOOR_DEFAULT_PAIRS_PER_SEC:
            floor_failures.append(
                f"pallas_fused_default {default_rate:.0f} pairs/s "
                f"< floor {FLOOR_DEFAULT_PAIRS_PER_SEC:.0f}"
            )
        scanned_rate = train_step.get("train_step_scanned_pairs_per_sec", 0.0)
        if scanned_rate < FLOOR_SCANNED_PAIRS_PER_SEC:
            floor_failures.append(
                f"train_step_scanned {scanned_rate:.0f} pairs/s "
                f"< floor {FLOOR_SCANNED_PAIRS_PER_SEC:.0f}"
            )
        full_ms = full_crossclr.get("full_crossclr_fused_ms")
        if not isinstance(full_ms, (int, float)) or full_ms > FLOOR_FULL_CROSSCLR_MS:
            floor_failures.append(
                f"full_crossclr_fused {full_ms} ms "
                f"> floor {FLOOR_FULL_CROSSCLR_MS} (or errored)"
            )
        for tier in ("default", "pruned_default"):
            ms = global_rows.get(tier)
            if not isinstance(ms, (int, float)) or ms > FLOOR_GLOBAL_ROWS_MS:
                floor_failures.append(
                    f"global_rows {tier} {ms} ms "
                    f"> floor {FLOOR_GLOBAL_ROWS_MS} (or errored)"
                )

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
                "est_mfu": mfu,
                "global_rows_4096x32768_fwdbwd_ms": global_rows,
                **full_crossclr,
                **train_step,
                **({"excluded": excluded} if excluded else {}),
                **(
                    {"floor_failures": floor_failures}
                    if floor_failures
                    else {}
                ),
            }
        )
    )
    if floor_failures:
        raise SystemExit(2)


if __name__ == "__main__":
    main()
