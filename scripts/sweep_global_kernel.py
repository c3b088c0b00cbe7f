"""Sweep rectangular global-kernel tiles at the config-5 shape.

Per-device hot path of the 32k-batch pod slice: both directions' row-block
lse (4096 local anchors x 32768 gathered candidates), fwd+bwd, dependency-
chained timing (same methodology as bench.py).

Usage: python scripts/sweep_global_kernel.py [tier ...]
Prints one line per (tier, tb, tc); incremental.
"""
import itertools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from crossclr_tpu.losses.functional import l2_normalize  # noqa: E402
from crossclr_tpu.ops.fused_global import fused_lse_rows  # noqa: E402

B_LOC, N_GLOBAL, D, K = 4096, 32768, 512, 5
TIERS = sys.argv[1:] or ["highest", "default"]

rng = np.random.default_rng(0)
v_all = l2_normalize(
    jnp.asarray(rng.standard_normal((N_GLOBAL, D)), jnp.float32), 1
)
t_all = l2_normalize(
    jnp.asarray(rng.standard_normal((N_GLOBAL, D)), jnp.float32), 1
)
off = jnp.zeros((), jnp.float32)


def run(tier, tiles):
    def loss_fn(v_all_, t_all_):
        v_loc = jax.lax.dynamic_slice(v_all_, (0, 0), (B_LOC, D))
        t_loc = jax.lax.dynamic_slice(t_all_, (0, 0), (B_LOC, D))
        kw = dict(precision=tier, tiles=tiles)
        lse_v = fused_lse_rows(v_loc, v_all_, t_all_, off, **kw)
        lse_t = fused_lse_rows(t_loc, t_all_, v_all_, off, **kw)
        pos = jnp.sum(v_loc * t_loc, axis=1, keepdims=True) / 0.03
        return (jnp.mean(lse_v - pos) + jnp.mean(lse_t - pos)) / 2

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1))

    def body(carry, _):
        va, ta = carry
        loss, (gv, gt) = grad_fn(va, ta)
        return (va - 0.01 * gv, ta - 0.01 * gt), loss

    f = jax.jit(lambda va, ta: jax.lax.scan(body, (va, ta), None, length=K))
    float(f(v_all, t_all)[1][-1])  # compile + warm
    best = float("inf")
    loss0 = None
    for va, ta in ((v_all * 1.0000001, t_all), (v_all, t_all * 1.0000001)):
        t0 = time.perf_counter()
        out = f(va, ta)
        float(out[1][-1])
        best = min(best, (time.perf_counter() - t0) / K)
        loss0 = float(out[1][0])
    return best, loss0


for tier in TIERS:
    for tb, tc in itertools.product((256, 512), (512, 1024, 2048, 4096)):
        try:
            t0 = time.perf_counter()
            dt, loss = run(tier, (tb, tc))
            compile_s = time.perf_counter() - t0 - 2 * dt * K
            print(
                f"{tier:8s} tb={tb:4d} tc={tc:4d}: {dt*1e3:8.2f} ms/step "
                f"loss={loss:.5f} (compile ~{compile_s:.0f}s)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{tier:8s} tb={tb:4d} tc={tc:4d}: FAIL {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)
