"""Sweep dual-kernel tile sizes across the SHIPPED (previously unswept)
shapes: d in {256, 384, 1024} and b in {1024, 8192} around the swept
(4096, 512) anchor (VERDICT r2 weak #6).  Note d=384 is a lane-width
(128) multiple, so it runs UNPADDED — it does not inherit d=512 tiles.

Usage: python scripts/sweep_shapes.py [out.json]

Timing is the bench methodology (dependency-chained ``lax.scan`` +
host-read fence, min over repeats) — the older sweep_kernel.py loop
re-dispatches identical inputs, which this runtime can memoize.
Results feed ops/fused_crossclr._pick_tiles and BASELINE.md.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import crossclr_tpu.ops.fused_crossclr as fk  # noqa: E402
from crossclr_tpu.losses import cross_clr_intra  # noqa: E402

K = 30
SHAPES = [(1024, 512), (8192, 512), (4096, 256), (4096, 384), (4096, 1024)]
ROW_TILES = (128, 256, 512)
COL_TILES = (512, 1024, 2048)


def legal(t, b):
    # single source for the Mosaic lane-vector rule
    return b % t == 0 and fk._lane_block_ok(t, b)


def chained(loss_fn):
    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1))

    def body(carry, _):
        a, c = carry
        loss, (ga, gc) = grad_fn(a, c)
        return (a - 0.01 * ga, c - 0.01 * gc), loss

    return jax.jit(lambda a, c: jax.lax.scan(body, (a, c), None, length=K))


def time_config(b, d, tiles):
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    fk.TILE_OVERRIDE = tiles
    try:
        f = chained(
            lambda a, c: fk.cross_clr_intra_fused(a, c, precision="default")
        )
        ref = float(jax.jit(cross_clr_intra)(v, t))
        first = float(f(v, t)[1][0])  # compile + parity gate
        if abs(first - ref) > 2e-5:
            return None, f"parity {first} vs {ref}"
        best = float("inf")
        for s in (1.0000001, 1.0000002, 1.0000003):
            t0 = time.perf_counter()
            float(f(v * s, t)[1][-1])
            best = min(best, (time.perf_counter() - t0) / K)
        return best, None
    except Exception as e:  # noqa: BLE001 — record and continue the sweep
        return None, f"{type(e).__name__}: {str(e)[:120]}"
    finally:
        fk.TILE_OVERRIDE = None


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sweep_shapes.json"
    results = {}
    for b, d in SHAPES:
        rows = {}
        heur = fk._pick_tiles(b, d)  # pads d to the lane width internally
        for tb in ROW_TILES:
            for tc in COL_TILES:
                if not (legal(tb, b) and legal(tc, b)):
                    continue
                dt, err = time_config(b, d, (tb, tc))
                tag = f"{tb}x{tc}"
                if err:
                    rows[tag] = f"ERR {err}"
                    print(f"[{b},{d}] {tag}: ERR {err}", flush=True)
                else:
                    rows[tag] = round(dt * 1e3, 3)
                    print(
                        f"[{b},{d}] {tag}: {dt*1e3:7.3f} ms "
                        f"({b/dt:10.0f} pairs/s)",
                        flush=True,
                    )
        # heuristic pick for reference (explicit tiles pin the online-max
        # kernels, so compare against the same family)
        if heur is None:
            rows["heuristic"] = "unsupported shape (_pick_tiles -> None)"
            print(f"[{b},{d}] heuristic: unsupported shape", flush=True)
        else:
            dt, err = time_config(b, d, heur)
            rows[f"heuristic={heur[0]}x{heur[1]}"] = (
                f"ERR {err}" if err else round(dt * 1e3, 3)
            )
            print(
                f"[{b},{d}] heuristic {heur}: "
                f"{rows[f'heuristic={heur[0]}x{heur[1]}']}",
                flush=True,
            )
        results[f"{b}x{d}"] = rows
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
