"""Retrieval serving: ``python -m crossclr_tpu.serve``.

Loads a trained checkpoint, encodes one modality of the dataset as the
retrieval corpus (held on device), and serves nearest-neighbor search
over HTTP — the online counterpart of ``crossclr_tpu.eval``'s offline
top-k dumps.  The reference ships no serving path (SURVEY.md §1: only
the loss exists).

Endpoints:
  GET  /healthz   → {"status": "ok", "corpus_rows": N, "step": S, ...}
  GET  /metrics   → request/error counts + recent /search latency
                    percentiles (p50/p95/p99 over a 512-request window)
  POST /search    → body {"features": [[...], ...], "k": 10}
                    raw QUERY-modality features ([B, D] pooled or
                    [B, S, D] sequences, optional "mask": [B, S]);
                    returns {"indices", "scores", "ids"?}
  POST /reload    → body {"step": N?} — restore the latest (or given)
                    checkpoint from the serving directory and re-derive
                    the corpus index, without restarting the process

Example:
  python -m crossclr_tpu.serve --config cfg.json --corpus video \\
      --port 8777           # text queries retrieve video clips
"""

from __future__ import annotations

import argparse
import collections
import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

import jax
import jax.numpy as jnp


class _ServiceStats:
    """Request observability shared by the live and artifact services:
    counts + a bounded window of recent /search latencies, guarded by
    their own lock so a metrics read never queues behind a device
    dispatch."""

    _dispatch_count: int = 0

    def __init__(self):
        self._stats_lock = threading.Lock()
        self._search_count = 0
        self._error_count = 0
        self._latencies = collections.deque(maxlen=512)

    def record_search(self, seconds: float | None, ok: bool) -> None:
        with self._stats_lock:
            self._search_count += 1
            if not ok:
                self._error_count += 1
            if seconds is not None:
                self._latencies.append(seconds)

    def stats(self) -> dict:
        with self._stats_lock:
            lats = sorted(self._latencies)
            out = {
                "search_requests": self._search_count,
                "search_errors": self._error_count,
                # device dispatches actually issued — under micro-batching
                # (--batch-window-ms) this trails search_requests by the
                # coalescing factor
                "search_dispatches": self._dispatch_count,
            }
        if lats:
            pick = lambda q: lats[  # noqa: E731
                min(len(lats) - 1, int(q * len(lats)))
            ]
            out["latency_ms"] = {
                "p50": round(pick(0.50) * 1e3, 2),
                "p95": round(pick(0.95) * 1e3, 2),
                "p99": round(pick(0.99) * 1e3, 2),
                "window": len(lats),
            }
        return out


class RetrievalService(_ServiceStats):
    """Checkpoint + encoded corpus + a jitted query→top-k path.

    ``corpus_side``: which modality is indexed ("video" or "text");
    queries are the OTHER modality's raw features, encoded by its tower.
    Device work is serialized with a lock — handler threads must not
    interleave dispatches against donated/async state.
    """

    def __init__(self, trainer, state, corpus_emb, corpus_side: str,
                 ids: list[str] | None = None,
                 index_step: int | None = None,
                 mesh=None,
                 corpus_dtype=None):
        self.trainer = trainer
        self.state = state
        # real row count BEFORE any shard padding — clamps k, sizes the
        # k=0 contract, and is what healthz reports
        self.corpus_rows = int(jnp.shape(corpus_emb)[0])
        # mesh set => the index is row-sharded over the data axis
        # (per-device HBM holds rows/n_dev; search merges O(k) winners
        # per device — evaluation.sharded_retrieve_topk)
        self.mesh = mesh
        # index storage dtype: bfloat16 halves index HBM (search still
        # normalizes and scores in fp32 — only the stored embeddings are
        # rounded, a ~3-decimal-digit quantization of unit vectors)
        self.corpus_dtype = jnp.dtype(
            corpus_dtype if corpus_dtype is not None else jnp.float32
        )
        self.corpus_emb = self._place_corpus(corpus_emb)
        self.corpus_side = corpus_side
        self.query_side = "text" if corpus_side == "video" else "video"
        self.ids = ids
        self.step = int(state.step)
        # which checkpoint step the corpus index was ENCODED at (None =
        # unknown, e.g. a --corpus-emb dump without a recorded step).
        # When it trails self.step the index and query tower disagree —
        # surfaced in /healthz and in every /reload response.
        self.index_step = index_step
        self._lock = threading.Lock()
        self._search_jit = None
        super().__init__()

    def reload(self, step: int | None = None) -> int:
        """Swap in a newer (or specific) checkpoint without restarting.

        Restores the state and re-derives the corpus index (re-encoded,
        or kept as-is when the service was built on a precomputed
        ``--corpus-emb`` dump), all under the device lock so in-flight
        searches never see a half-swapped pair.  The jitted search path
        is parameter-agnostic (params are a traced argument), so no
        recompile happens.  Returns the restored step.
        """
        if self._reloader is None:
            raise RuntimeError(
                "service has no checkpoint directory to reload from "
                "(started with --random-params?)"
            )
        with self._lock:
            new_state, corpus, self.index_step = self._reloader(
                self.state, step
            )
            self.state = new_state
            if corpus is not self.corpus_emb:
                # re-encoded index; a kept precomputed index (identity)
                # is already placed and its row count unchanged
                if int(jnp.shape(corpus)[0]) != self.corpus_rows:
                    # sharded search bakes the real row count in as the
                    # padding mask bound — rebuild on a row-count change
                    self._search_jit = None
                self.corpus_rows = int(jnp.shape(corpus)[0])
                self.corpus_emb = self._place_corpus(corpus)
            self.step = int(self.state.step)
        if self.index_stale:
            print(
                f"warning: /reload restored step {self.step} but the "
                f"precomputed corpus index is from step {self.index_step} "
                "— re-run `eval --embeddings-output` (or serve without "
                "--corpus-emb) to refresh the index",
                file=sys.stderr,
            )
        return self.step

    @property
    def index_stale(self) -> bool:
        """True when the corpus index provably predates the query tower."""
        return self.index_step is not None and self.index_step != self.step

    def _place_corpus(self, corpus_emb):
        """Device placement for the index: cast to the storage dtype,
        then single-device or row-sharded over the mesh's data axis
        (zero-padded to the axis size by shard_corpus; search masks
        padded rows by global index).

        ``int8`` storage quantizes per-row on the host (4× less index
        HBM than fp32; scoring runs int8×int8→int32 on the MXU — see
        ``evaluation.quantize_corpus`` for the error bound)."""
        if self.corpus_dtype == jnp.int8:
            from .evaluation import quantize_corpus, shard_corpus

            qc = quantize_corpus(corpus_emb)
            if self.mesh is None:
                from .evaluation import QuantizedCorpus

                return QuantizedCorpus(
                    jnp.asarray(qc.values), jnp.asarray(qc.scales)
                )
            return shard_corpus(qc, self.mesh)
        if self.mesh is None:
            return jnp.asarray(corpus_emb).astype(self.corpus_dtype)
        from .evaluation import shard_corpus

        # cast on the HOST (numpy handles ml_dtypes bfloat16): the full
        # index must never be committed to a single device on this path
        host = np.asarray(corpus_emb).astype(self.corpus_dtype)
        return shard_corpus(host, self.mesh)

    # set by build_service when a checkpoint directory exists:
    # (current_state, step|None) -> (restored_state, corpus_emb, index_step)
    _reloader = None
    # set by build_service: a precomputed index encoded with a different
    # tower flavor (EMA vs live) than the one answering queries — a
    # disagreement the step comparison cannot see
    index_tower_mismatch: bool = False

    def _search_fn(self):
        """ONE jitted dispatch and ONE host readback per request.

        The query-tower encode is fused with the corpus top-k, and the
        ``(scores, indices)`` pair is packed into a single array (indices
        bitcast to float32, exactly reversible) so the host fetches one
        buffer.  On a remote-runtime serving host each host read pays a
        full round trip (~30 ms measured through this tunnel, regardless
        of payload size) — two result reads would double the p50 floor.
        """
        if self._search_jit is None:
            import functools

            from .evaluation import retrieve_topk, sharded_retrieve_topk

            # the single source of the tower-apply contract — shared with
            # Trainer.encode_modality so the two paths cannot drift
            encode = self.trainer.encode_modality_raw(self.query_side)
            mesh, n_real = self.mesh, self.corpus_rows

            @functools.partial(jax.jit, static_argnames=("k",))
            def fn(params, corpus, features, mask, *, k):
                q = encode(params, features, mask)
                if mesh is not None:
                    # row-sharded index: local top-k per device, O(k)
                    # merge — equivalent to the dense path
                    scores, idx = sharded_retrieve_topk(
                        q, corpus, k=k, mesh=mesh, n_real=n_real
                    )
                else:
                    scores, idx = retrieve_topk(q, corpus, k=k)
                packed_idx = jax.lax.bitcast_convert_type(idx, jnp.float32)
                return jnp.concatenate([scores, packed_idx], axis=1)

            self._search_jit = fn
        return self._search_jit

    def _dispatch(self, features, mask, k: int):
        """One padded device dispatch: fp32 ``[b, ...]`` features (and
        optional mask) → ``(scores [b, k], indices [b, k])`` numpy.
        ``k`` must be pre-clamped to ``[1, corpus_rows]``.

        k AND the query-row count are STATIC in the fused program, and
        clients control both: one executable per distinct (B, k) would
        let request-shape variety pile arbitrarily many multi-second
        compiles behind the service lock.  Compile at the next power of
        two on each axis (≤ log2 distinct values per axis, ever) and
        slice to the requested shape on the host — padded query rows
        are zeros whose results are discarded, and lax.top_k is sorted
        descending, so the first k of top-k_pad ARE the top-k.
        """
        k_pad = min(1 << (k - 1).bit_length(), self.corpus_rows)
        b = features.shape[0]
        b_pad = 1 << max(b - 1, 0).bit_length()
        if b_pad != b:
            pad_width = [(0, b_pad - b)] + [(0, 0)] * (features.ndim - 1)
            features = np.pad(features, pad_width)
            if mask is not None:
                mask = np.pad(mask, [(0, b_pad - b), (0, 0)])
        with self._lock:
            self._dispatch_count += 1
            packed = np.asarray(
                self._search_fn()(
                    self.state.params, self.corpus_emb, features, mask,
                    k=k_pad,
                )
            )[:b]
        scores = packed[:, :k]
        idx = np.ascontiguousarray(packed[:, k_pad:k_pad + k]).view(np.int32)
        return scores, idx

    def search(self, features, mask=None, k: int = 10):
        features = np.asarray(features, np.float32)
        if features.ndim == self._query_ndim - 1:
            features = features[None]  # single query convenience
        if mask is not None:
            mask = np.asarray(mask, np.float32)
            if mask.ndim == 1:
                mask = mask[None]
        k = int(min(k, self.corpus_rows))  # retrieve_topk clamps too
        if k <= 0:
            # preserve the k=0 contract (empty per-query result lists)
            # without dispatching anything
            empty = [[] for _ in range(features.shape[0])]
            out = {"indices": empty, "scores": [[] for _ in empty]}
            if self.ids is not None:
                out["ids"] = [[] for _ in empty]
            return out
        if self._batcher is not None:
            scores, idx = self._batcher.submit(features, mask, k)
        else:
            scores, idx = self._dispatch(features, mask, k)
        out = {"indices": idx.tolist(), "scores": scores.tolist()}
        if self.ids is not None:
            out["ids"] = [[self.ids[j] for j in row] for row in idx.tolist()]
        return out

    def enable_batching(self, window_ms: float = 2.0, max_batch: int = 64):
        """Coalesce concurrent searches into shared device dispatches
        (see :class:`_MicroBatcher`).  Call once, before serving."""
        self._batcher = _MicroBatcher(
            self._dispatch, window_ms=window_ms, max_batch=max_batch
        )

    # set by build_service (single-query convenience reshaping)
    _query_ndim: int = 2
    _batcher = None


class ArtifactService(_ServiceStats):
    """Serve an AOT-exported :class:`~crossclr_tpu.aot.SearchArtifact`
    over the SAME HTTP surface as the live service — /search, /healthz,
    /metrics — with **no model code, config, or checkpoint** at serving
    time (the deployment handoff ``aot.py`` exports).  Artifacts are
    immutable: /reload is cleanly rejected; re-export and restart to pick
    up new weights.  ``k`` is clamped to the export-time top-k width
    (smaller k slices the sorted columns, exactly like the live clamp to
    the corpus size)."""

    is_artifact = True
    index_step = None
    index_stale = False
    index_tower_mismatch = False

    def __init__(self, artifact):
        super().__init__()
        self.artifact = artifact
        meta = artifact.meta
        self.corpus_rows = int(meta["corpus_rows"])
        self.corpus_side = meta["corpus_side"]
        self.query_side = meta["query_side"]
        self.step = int(meta["step"])
        self.k_max = int(meta["k"])
        try:
            self.corpus_dtype = jnp.dtype(meta["index_dtype"])
        except TypeError:
            # version-2 artifacts exported before the index_dtype string
            # was normalized recorded repr(type); the storage dtype list
            # is authoritative either way
            self.corpus_dtype = jnp.dtype(meta["corpus_dtypes"][0])
        self.ids = artifact.ids
        # one dispatch at a time: the deserialized module re-enters XLA
        # through jit and the executor, same serialization contract as
        # the live service's device lock
        self._lock = threading.Lock()

    def search(self, features, mask=None, k: int = 10):
        features = np.asarray(features, np.float32)
        k = int(min(k, self.k_max))
        if k <= 0:  # the k=0 contract: empty per-query result lists
            n = (
                features.shape[0]
                if features.ndim > len(self.artifact.meta["query_shape"])
                else 1
            )
            out = {"indices": [[] for _ in range(n)],
                   "scores": [[] for _ in range(n)]}
            if self.ids is not None:
                out["ids"] = [[] for _ in range(n)]
            return out
        with self._lock:
            self._dispatch_count += 1
            return self.artifact.search(features, mask=mask, k=k)

    def reload(self, step: int | None = None) -> int:
        raise RuntimeError(
            "artifact services are immutable — re-export "
            "(scripts/export_serving.py) and restart to pick up new weights"
        )


class _MicroBatcher:
    """Coalesce concurrent search dispatches into one device call.

    On a remote-runtime serving host every dispatch pays a full round
    trip (~30-40 ms) REGARDLESS of how many query rows it carries, and
    the device lock serializes dispatches — N concurrent clients pay
    N round trips back to back.  Batching collects compatible requests
    (same feature trailing shape and mask presence/width) for a short
    window and runs ONE dispatch at the group's max k, then slices each
    requester's rows and first-k columns out (lax.top_k is sorted
    descending, so a k=5 answer is the first 5 columns of a k=8 one).

    A solitary request pays at most ``window_ms`` extra latency; the
    window only keeps collecting while the queue is non-empty or until
    it expires, so idle services add no steady-state delay after the
    first wait.
    """

    def __init__(self, dispatch, window_ms: float = 2.0,
                 max_batch: int = 64):
        self._dispatch = dispatch
        self._window = window_ms / 1e3
        self._max = max_batch
        self._cv = threading.Condition()
        self._queue: list[dict] = []
        self._stop = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, features, mask, k: int):
        item = {
            "f": features, "m": mask, "k": k,
            "done": threading.Event(), "out": None, "err": None,
        }
        with self._cv:
            if self._stop:
                raise RuntimeError("batcher is closed")
            self._queue.append(item)
            self._cv.notify()
        item["done"].wait()
        if item["err"] is not None:
            raise item["err"]
        return item["out"]

    def close(self):
        with self._cv:
            self._stop = True
            self._cv.notify()
        self._worker.join(timeout=5)

    @staticmethod
    def _key(item):
        m = item["m"]
        return (item["f"].shape[1:], None if m is None else m.shape[1])

    def _take_group(self):
        """Pop one request, then collect compatible ones until the window
        closes, the group fills, or only incompatible requests remain."""
        first = self._queue.pop(0)
        group = [first]
        key = self._key(first)
        deadline = time.perf_counter() + self._window
        while len(group) < self._max:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            matched = False
            for i, it in enumerate(self._queue):
                if self._key(it) == key:
                    group.append(self._queue.pop(i))
                    matched = True
                    break
            if not matched:
                if self._queue:
                    break  # only incompatible requests: dispatch this group
                self._cv.wait(timeout=remaining)
                if self._stop:
                    break
        return group

    def _run(self):
        while True:
            with self._cv:
                while not self._queue and not self._stop:
                    self._cv.wait()
                if self._stop and not self._queue:
                    return
                group = self._take_group()
            try:
                feats = np.concatenate([g["f"] for g in group])
                masks = None
                if group[0]["m"] is not None:
                    masks = np.concatenate([g["m"] for g in group])
                k_max = max(g["k"] for g in group)
                scores, idx = self._dispatch(feats, masks, k_max)
                off = 0
                for g in group:
                    b = g["f"].shape[0]
                    g["out"] = (
                        scores[off:off + b, :g["k"]],
                        idx[off:off + b, :g["k"]],
                    )
                    off += b
            except Exception as e:  # noqa: BLE001 — deliver to every waiter
                for g in group:
                    g["err"] = e
            finally:
                for g in group:
                    g["done"].set()


def _make_handler(service: RetrievalService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet by default
            pass

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/metrics":
                return self._reply(
                    200,
                    {
                        **service.stats(),
                        "corpus_rows": service.corpus_rows,
                        "step": service.step,
                    },
                )
            if self.path != "/healthz":
                return self._reply(404, {"error": "unknown path"})
            health = {
                "status": "ok",
                "corpus_rows": service.corpus_rows,
                "corpus_side": service.corpus_side,
                "query_side": service.query_side,
                "step": service.step,
            }
            if getattr(service, "is_artifact", False):
                health["artifact"] = True
            if service.corpus_dtype != jnp.float32:
                health["corpus_dtype"] = str(service.corpus_dtype)
            if service.index_step is not None:
                health["index_step"] = service.index_step
            if service.index_stale:
                health["index_stale"] = True
            if service.index_tower_mismatch:
                health["index_tower_mismatch"] = True
            self._reply(200, health)

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
            except (ValueError, TypeError) as e:
                if self.path == "/search":
                    # malformed JSON is still a failed search request —
                    # /metrics must not undercount this class
                    service.record_search(None, ok=False)
                return self._reply(400, {"error": f"{type(e).__name__}: {e}"})
            # per-path client-error classes: a device/runtime failure on
            # the /search hot path (XlaRuntimeError subclasses
            # RuntimeError) must surface as a 500 server fault, not a 400;
            # /reload's RuntimeError/FileNotFoundError ARE request errors
            # (no checkpoint dir, nonexistent step).
            if self.path == "/search":
                client_errors = (KeyError, ValueError, TypeError)
                run = lambda: service.search(  # noqa: E731
                    req["features"], req.get("mask"), req.get("k", 10)
                )
            elif self.path == "/reload":
                client_errors = (
                    KeyError, ValueError, TypeError, RuntimeError,
                    FileNotFoundError,
                )

                def run():
                    step = req.get("step")
                    out = {
                        "status": "ok",
                        "step": service.reload(
                            None if step is None else int(step)
                        ),
                    }
                    if service.index_step is not None:
                        out["index_step"] = service.index_step
                    if service.index_stale:
                        out["warning"] = (
                            "corpus index was encoded at step "
                            f"{service.index_step}; queries now use the "
                            f"step-{service.step} tower — refresh the "
                            "--corpus-emb dump"
                        )
                    return out
            else:
                return self._reply(404, {"error": "unknown path"})
            is_search = self.path == "/search"
            t0 = time.perf_counter()
            try:
                out = run()
            except client_errors as e:
                if is_search:
                    service.record_search(None, ok=False)
                return self._reply(400, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:  # noqa: BLE001 — device/runtime fault
                if is_search:
                    service.record_search(None, ok=False)
                return self._reply(500, {"error": f"{type(e).__name__}: {e}"})
            if is_search:
                service.record_search(time.perf_counter() - t0, ok=True)
            self._reply(200, out)

    return Handler


def build_service(cfg, checkpoint_dir: str | None, corpus_side: str,
                  batch_size: int | None = None,
                  random_params: bool = False,
                  corpus_emb_path: str | None = None,
                  shard_corpus: bool = False,
                  use_ema: bool = False,
                  corpus_dtype: str | None = None,
                  batch_window_ms: float | None = None,
                  strict_index: bool = False) -> RetrievalService:
    """Construct the service: dataset → trainer → restore → encode corpus.

    ``corpus_emb_path``: an ``.npz`` written by
    ``eval --embeddings-output`` — the corpus index is loaded from it
    instead of re-encoding every row through the tower at startup (the
    dominant startup cost on large corpora; the query tower still comes
    from the checkpoint).

    ``shard_corpus``: row-shard the index over the device mesh's data
    axis — each device holds ``rows/n_dev`` and search merges O(k) local
    winners per device, so the servable corpus scales with the slice
    instead of one chip's HBM.  Results are equivalent to the
    single-device path up to matmul reduction-order noise in the scores
    (see ``evaluation.sharded_retrieve_topk``).  Requires >1 device.
    """
    from .data import dataset_from_config, epoch_batches
    from .eval import _encode_split
    from .parallel import make_mesh
    from .training import CheckpointManager, Trainer

    # dataset_from_config also validates the ids manifest length against
    # the store, so a stale manifest fails at startup, not mid-request
    dataset, ids = dataset_from_config(cfg.data)

    mesh = make_mesh() if len(jax.devices()) > 1 else None
    if shard_corpus and mesh is None:
        raise SystemExit("--shard-corpus needs more than one device")
    trainer = Trainer(cfg.video_tower, cfg.text_tower, cfg.train, mesh=mesh)
    batch_size = min(batch_size or cfg.data.batch_size, len(dataset))
    first = next(epoch_batches(dataset, batch_size, shuffle=False))
    state = trainer.init_state(first["video"], first["text"])
    mngr = None
    if not random_params:
        if not checkpoint_dir:
            raise SystemExit(
                "no checkpoint: pass --checkpoint-dir / set it in the "
                "config, or use --random-params"
            )
        mngr = CheckpointManager(checkpoint_dir)
        state = mngr.restore(state)
    if use_ema:
        # encode queries (and, without --corpus-emb, the corpus) with the
        # EMA parameters; requires train.ema_decay so the restore
        # template carried the EMA tree
        state = trainer.ema_state(state)

    if corpus_emb_path is not None:
        with np.load(corpus_emb_path, allow_pickle=False) as npz:
            corpus_emb = np.asarray(npz[corpus_side], np.float32)
            npz_ids = [str(i) for i in npz["ids"]] if "ids" in npz else []
            npz_step = int(npz["step"]) if "step" in npz else None
            npz_ema = bool(npz["ema"]) if "ema" in npz else None
        embed_dim = getattr(
            cfg.video_tower if corpus_side == "video" else cfg.text_tower,
            "embed_dim",
        )
        if corpus_emb.ndim != 2 or corpus_emb.shape[1] != embed_dim:
            raise SystemExit(
                f"--corpus-emb {corpus_emb_path}: '{corpus_side}' has shape "
                f"{corpus_emb.shape}, expected [rows, {embed_dim}] for this "
                "config's towers"
            )
        step_mismatch = npz_step is not None and npz_step != int(state.step)
        if step_mismatch:
            print(
                f"warning: --corpus-emb was encoded at step {npz_step} but "
                f"the restored checkpoint is step {int(state.step)} — the "
                "index and the query tower may disagree",
                file=sys.stderr,
            )
        # the step comparison cannot see an EMA/live flavor mismatch —
        # same step, genuinely different towers
        tower_mismatch = npz_ema is not None and npz_ema != use_ema
        if tower_mismatch:
            print(
                "warning: --corpus-emb was encoded with the "
                f"{'EMA' if npz_ema else 'live'} tower but this service "
                f"queries with the {'EMA' if use_ema else 'live'} tower "
                "— index and query tower disagree (re-export with "
                f"{'--ema' if use_ema else 'no --ema'}, or flip serve's "
                "--ema flag)",
                file=sys.stderr,
            )
        if strict_index and (step_mismatch or tower_mismatch):
            raise SystemExit(
                "--strict-index: the precomputed corpus index disagrees "
                "with the restored query tower "
                f"({'step' if step_mismatch else 'EMA/live flavor'} "
                "mismatch — see the warning above); re-export the index "
                "or drop --strict-index to serve anyway"
            )
        if npz_ids:
            ids = npz_ids  # row-aligned with the precomputed index
        elif ids is not None and len(ids) != corpus_emb.shape[0]:
            print(
                f"warning: dropping the ids manifest ({len(ids)} entries) — "
                f"--corpus-emb indexes {corpus_emb.shape[0]} rows (a "
                "different split?) and carries no ids of its own",
                file=sys.stderr,
            )
            ids = None
        index_step = npz_step
    else:
        v_emb, t_emb = _encode_split(trainer, state, dataset, batch_size)
        corpus_emb = v_emb if corpus_side == "video" else t_emb
        index_step = int(state.step)
        tower_mismatch = False  # encoded right here with the query tower

    service = RetrievalService(
        trainer, state, corpus_emb, corpus_side, ids, index_step=index_step,
        mesh=mesh if shard_corpus else None,
        corpus_dtype=corpus_dtype,
    )
    service.index_tower_mismatch = tower_mismatch
    query_feats = getattr(
        dataset, "text" if corpus_side == "video" else "video"
    )
    service._query_ndim = np.asarray(query_feats).ndim
    if batch_window_ms is not None:
        service.enable_batching(window_ms=batch_window_ms)

    if mngr is not None:
        def _reloader(cur_state, step):
            # a FRESH manager per reload: the point of /reload is picking
            # up checkpoints a separate training job wrote after startup,
            # which the build-time manager's step cache never saw.  The
            # current state doubles as the restore template (structure
            # and shardings are by construction correct).
            fresh = CheckpointManager(checkpoint_dir)
            try:
                new_state = fresh.restore(cur_state, step=step)
            finally:
                fresh.close()
            if use_ema:
                new_state = trainer.ema_state(new_state)
            if corpus_emb_path is not None:
                # precomputed index: keep it (only the query tower moves)
                # — its encode step stays put, so reload()/healthz flag
                # the tower/index mismatch instead of hiding it
                return new_state, service.corpus_emb, service.index_step
            v, t = _encode_split(trainer, new_state, dataset, batch_size)
            return (
                new_state,
                jnp.asarray(v if corpus_side == "video" else t),
                int(new_state.step),
            )

        service._reloader = _reloader
    return service


def main(argv: list[str] | None = None) -> int:
    from .parallel import initialize_multihost
    from .utils.config import ExperimentConfig, apply_overrides, load_config

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=None)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument(
        "--corpus",
        choices=("video", "text"),
        default="video",
        help="modality to index; queries are the other modality",
    )
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8777)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument(
        "--corpus-emb",
        default=None,
        help=".npz from `eval --embeddings-output`: serve this precomputed "
        "index instead of encoding the corpus at startup",
    )
    ap.add_argument(
        "--shard-corpus",
        action="store_true",
        help="row-shard the index over the device mesh's data axis; the "
        "servable corpus scales with the slice instead of one chip's HBM",
    )
    ap.add_argument(
        "--ema",
        action="store_true",
        help="serve with the EMA parameters (requires train.ema_decay in "
        "the config so checkpoints carry the EMA tree)",
    )
    ap.add_argument(
        "--corpus-dtype",
        choices=("float32", "bfloat16", "int8"),
        default="float32",
        help="index storage dtype: bfloat16 halves index HBM (scoring "
        "still runs in fp32; only the stored embeddings are rounded); "
        "int8 quarters it (per-row symmetric quantization, scored "
        "int8×int8→int32 on the MXU — cosine scores move ≲1e-2)",
    )
    ap.add_argument(
        "--batch-window-ms",
        type=float,
        default=None,
        help="coalesce concurrent /search requests arriving within this "
        "window into one device dispatch (each dispatch pays a full "
        "runtime round trip regardless of rows); a solitary request pays "
        "at most this much extra latency",
    )
    ap.add_argument(
        "--strict-index",
        action="store_true",
        help="refuse to start when a --corpus-emb index disagrees with "
        "the restored query tower (step or EMA/live flavor mismatch) "
        "instead of serving with a warning",
    )
    ap.add_argument("--random-params", action="store_true")
    ap.add_argument(
        "--artifact",
        default=None,
        help=".npz from `scripts/export_serving.py`: serve the AOT "
        "artifact directly — no config, model code, or checkpoint is "
        "loaded; /reload is rejected (artifacts are immutable)",
    )
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)

    if args.artifact is not None:
        conflicts = [
            flag
            for flag, given in (
                ("--config", args.config),
                ("--checkpoint-dir", args.checkpoint_dir),
                ("--corpus-emb", args.corpus_emb),
                ("--shard-corpus", args.shard_corpus),
                ("--ema", args.ema),
                ("--random-params", args.random_params),
                ("--strict-index", args.strict_index),
                ("--batch-size", args.batch_size),
                ("--batch-window-ms", args.batch_window_ms),
                # default-valued flags: non-default means the user asked
                # for something the artifact cannot change
                ("--corpus", args.corpus != "video" and args.corpus),
                (
                    "--corpus-dtype",
                    args.corpus_dtype != "float32" and args.corpus_dtype,
                ),
                ("overrides", args.overrides),
            )
            if given
        ]
        if conflicts:
            raise SystemExit(
                f"--artifact is self-contained; drop {', '.join(conflicts)} "
                "(corpus/index/tower choices were baked at export time)"
            )
        from .aot import SearchArtifact

        service = ArtifactService(SearchArtifact.load(args.artifact))
    else:
        cfg = load_config(args.config) if args.config else ExperimentConfig()
        if args.overrides:
            cfg = apply_overrides(cfg, args.overrides)

        initialize_multihost()
        service = build_service(
            cfg,
            args.checkpoint_dir or cfg.checkpoint_dir,
            args.corpus,
            batch_size=args.batch_size,
            random_params=args.random_params,
            corpus_emb_path=args.corpus_emb,
            shard_corpus=args.shard_corpus,
            use_ema=args.ema,
            corpus_dtype=args.corpus_dtype,
            batch_window_ms=args.batch_window_ms,
            strict_index=args.strict_index,
        )
    httpd = ThreadingHTTPServer(
        (args.host, args.port), _make_handler(service)
    )
    # non-daemon handler threads: server_close() then JOINS in-flight
    # request handlers (block_on_close), so graceful shutdown really does
    # let responses finish instead of killing daemons at process exit
    httpd.daemon_threads = False

    # graceful SIGTERM (pod eviction): stop accepting, finish in-flight
    # requests, exit 0.  shutdown() must run off the serving thread.
    def _on_term(signum, frame):
        threading.Thread(target=httpd.shutdown, daemon=True).start()

    import signal

    try:
        signal.signal(signal.SIGTERM, _on_term)
    except ValueError:  # non-main thread (tests): leave handlers alone
        pass

    print(
        f"serving {service.corpus_rows} {service.corpus_side} rows on "
        f"http://{args.host}:{httpd.server_address[1]} "
        f"(queries: raw {service.query_side} features"
        + (", AOT artifact)" if args.artifact else ")"),
        file=sys.stderr,
    )
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
    print("server stopped", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
