"""Serving benchmark: request latency and concurrent throughput.

Builds an in-process RetrievalService on synthetic data (no HTTP — the
device path is what matters; BASELINE.md records the HTTP overhead as
negligible next to the runtime RTT) and measures:

* sequential p50/p95 per-request latency;
* concurrent throughput with T client threads, unbatched (device lock
  serializes dispatches) vs micro-batched (``--batch-window-ms``
  coalesces a burst into ~1 dispatch).

Prints ONE JSON line.  Run on the TPU host for real numbers; on CPU it
exercises the same code paths with meaningless absolute timings.

Usage: python scripts/bench_serve.py [--rows 65536] [--dim 256]
           [--threads 8] [--requests 64] [--window-ms 3.0]
"""

import argparse
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from crossclr_tpu.serve import build_service  # noqa: E402
from crossclr_tpu.utils.config import (  # noqa: E402
    DataConfig,
    ExperimentConfig,
    apply_overrides,
)


def _build(rows, dim, window_ms=None):
    cfg = ExperimentConfig(data=DataConfig(
        num_pairs=rows, batch_size=512, video_dim=dim, text_dim=dim,
    ))
    cfg = apply_overrides(cfg, [
        f"video_tower.input_dim={dim}", "video_tower.embed_dim=256",
        f"text_tower.input_dim={dim}", "text_tower.embed_dim=256",
    ])
    return build_service(
        cfg, None, "video", random_params=True, batch_window_ms=window_ms
    )


def _lat_ms(service, queries, n):
    lats = []
    for i in range(n):
        q = queries[i % len(queries)]
        t0 = time.perf_counter()
        service.search(q[None], k=10)
        lats.append((time.perf_counter() - t0) * 1e3)
    lats.sort()
    return lats[len(lats) // 2], lats[int(0.95 * len(lats))]


def _concurrent_qps(service, queries, n_threads, n_requests):
    barrier = threading.Barrier(n_threads)
    per_thread = n_requests // n_threads

    def worker(t):
        barrier.wait()
        for i in range(per_thread):
            service.search(queries[(t * per_thread + i) % len(queries)][None], k=10)

    threads = [
        threading.Thread(target=worker, args=(t,)) for t in range(n_threads)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    return (per_thread * n_threads) / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=65536)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--window-ms", type=float, default=3.0)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    queries = rng.standard_normal((32, args.dim)).astype(np.float32)

    plain = _build(args.rows, args.dim)
    plain.search(queries[0][None], k=10)  # compile
    p50, p95 = _lat_ms(plain, queries, args.requests)
    # first concurrent round warms any new (b_pad, k_pad) executables
    # (group sizes vary, each pow2 shape compiles once); the second
    # round is the steady state being measured
    _concurrent_qps(plain, queries, args.threads, args.requests)
    qps_plain = _concurrent_qps(plain, queries, args.threads, args.requests)
    disp_plain = plain._dispatch_count

    batched = _build(args.rows, args.dim, window_ms=args.window_ms)
    batched.search(queries[0][None], k=10)  # compile
    _concurrent_qps(batched, queries, args.threads, args.requests)
    qps_batched = _concurrent_qps(
        batched, queries, args.threads, args.requests
    )
    disp_batched = batched._dispatch_count
    batched._batcher.close()

    import jax

    print(json.dumps({
        "metric": "serve_search_latency_and_throughput",
        "backend": jax.default_backend(),
        "corpus_rows": args.rows,
        "p50_ms": round(p50, 2),
        "p95_ms": round(p95, 2),
        "concurrent_qps_unbatched": round(qps_plain, 1),
        "concurrent_qps_batched": round(qps_batched, 1),
        "batching_speedup": round(qps_batched / qps_plain, 2),
        "dispatches_unbatched": disp_plain,
        "dispatches_batched": disp_batched,
        "threads": args.threads,
        "window_ms": args.window_ms,
    }))


if __name__ == "__main__":
    main()
