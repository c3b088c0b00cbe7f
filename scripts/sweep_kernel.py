"""Sweep fused-kernel tile sizes / precisions at the bench shape.

NOTE (r3): this script's timing loop re-dispatches identical inputs,
which the remote executor can memoize — numbers can under-report by
>10x on the tunnel runtime.  Prefer scripts/sweep_shapes.py (chained
``lax.scan`` + host-read fencing, the bench.py methodology); this file
is kept for quick relative A/B on runtimes without dispatch memoization.

Usage: python scripts/sweep_kernel.py [fwd|fwdbwd]
Prints one line per config; incremental (flushes as it goes).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import crossclr_tpu.ops.fused_crossclr as fk  # noqa: E402
from crossclr_tpu.losses import cross_clr_intra  # noqa: E402

MODE = sys.argv[1] if len(sys.argv) > 1 else "fwdbwd"
B, D = 4096, 512
rng = np.random.default_rng(0)
v = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
t = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)

ref = float(cross_clr_intra(v, t))
print(f"ref loss = {ref:.6f}", flush=True)


def timeit(f):
    out = f(v, t)
    jax.block_until_ready(out)
    for _ in range(3):
        jax.block_until_ready(f(v, t))
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(v, t)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


P = jax.lax.Precision
for prec in (P.HIGHEST, P.HIGH, P.DEFAULT):
    for tile in (128, 256, 512):
        fk.KERNEL_PRECISION = prec
        fk.TILE_OVERRIDE = (tile, tile)
        try:
            t_compile0 = time.perf_counter()
            if MODE == "fwd":
                f = jax.jit(
                    lambda a, b_: fk.cross_clr_intra_fused(a, b_)
                )
                dt, out = timeit(f)
                loss = float(out)
            else:
                f = jax.jit(
                    jax.value_and_grad(
                        lambda a, b_: fk.cross_clr_intra_fused(a, b_),
                        argnums=(0, 1),
                    )
                )
                dt, out = timeit(f)
                loss = float(out[0])
            compile_s = time.perf_counter() - t_compile0 - 13 * dt
            print(
                f"{MODE} prec={prec.name} tile={tile}: {dt*1e3:8.3f} ms "
                f"({B/dt:9.0f} pairs/s) loss_err={abs(loss-ref):.2e} "
                f"compile~{compile_s:.0f}s",
                flush=True,
            )
        except Exception as e:
            print(f"{MODE} prec={prec.name} tile={tile}: ERR {str(e)[:160]}", flush=True)
