"""Feature datasets and batching.

The reference ships no data pipeline (SURVEY.md §1); the paper trains on
pre-extracted clip/caption features (YouCook2, LSMDC).  This module
provides:

* :class:`SyntheticPairs` — seeded synthetic correlated video/text feature
  pairs for tests and benchmarks (a shared latent makes retrieval
  learnable: overfitting to R@1=1.0 is the integration-test criterion).
* :class:`FeaturePairDataset` — memory-mapped ``.npy`` feature files
  (video features, text features, aligned by row), the storage format for
  YouCook2/LSMDC-style pre-extracted features.
* :func:`epoch_batches` — host-side batcher producing device-ready dicts;
  deterministic per (seed, epoch) so a resumed run replays the exact
  shard order (the checkpoint/resume recovery story, SURVEY.md §5).

Host→device transfer happens once per batch on the already-assembled
array — never per-mask like the reference's per-step numpy-eye uploads
(loss.py:66,102-104).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Iterator

import numpy as np

__all__ = [
    "SyntheticPairs",
    "FeaturePairDataset",
    "dataset_from_config",
    "epoch_batches",
    "infinite_batches",
    "stacked_chunks",
    "prefetch_to_device",
    "HostShard",
    "RowSubset",
    "train_eval_split",
]


def dataset_from_config(data_cfg):
    """Build the dataset a ``DataConfig`` describes — the SINGLE
    constructor behind the train/eval/serve CLIs (they used to carry
    three hand-synced copies of this if/else).

    Returns ``(dataset, ids)`` where ``ids`` is the row-aligned clip-id
    manifest when one exists next to a files store (ids.json written by
    scripts/prepare_features.py), else None.
    """
    import json

    if data_cfg.source == "synthetic":
        return (
            SyntheticPairs(
                num_pairs=data_cfg.num_pairs,
                video_dim=data_cfg.video_dim,
                text_dim=data_cfg.text_dim,
                video_seq_len=data_cfg.video_seq_len,
                text_seq_len=data_cfg.text_seq_len,
                variable_lengths=data_cfg.variable_lengths,
                seed=data_cfg.seed,
            ),
            None,
        )
    if data_cfg.source == "files":
        dataset = FeaturePairDataset(
            data_cfg.video_path,
            data_cfg.text_path,
            video_mask_path=data_cfg.video_mask_path or None,
            text_mask_path=data_cfg.text_mask_path or None,
            dtype=getattr(data_cfg, "features_dtype", None) or None,
        )
        import jax as _jax

        if dataset.video.dtype == np.float32 and _jax.process_index() == 0:
            import sys as _sys

            # measured on the 1-core host: fp32 assembly 723k pairs/s vs
            # a ~2M pairs/s device rate — the store dtype alone can starve
            # the chip (BASELINE.md, host input pipeline).  Rank-gated
            # like the trainer's warnings: every host process loads the
            # store, one should speak
            print(
                "NOTE: fp32 feature store — host batch assembly moves 2x "
                "the bytes of a bfloat16 store and can starve the device "
                "on few-core hosts; re-export with prepare_features "
                "--dtype bfloat16 (value-identical for bf16 towers) or "
                "int8 unless the towers need fp32 inputs",
                file=_sys.stderr,
            )
        manifest = Path(data_cfg.video_path).parent / "ids.json"
        ids = None
        if manifest.exists():
            ids = json.loads(manifest.read_text())
            if len(ids) != len(dataset):
                raise SystemExit(
                    f"ids manifest {manifest} has {len(ids)} entries but the "
                    f"feature store has {len(dataset)} rows — stale manifest?"
                )
        return dataset, ids
    raise SystemExit(f"unknown data.source {data_cfg.source!r}")


@dataclasses.dataclass
class SyntheticPairs:
    """Correlated random feature pairs with a shared latent.

    ``video = W_v z + noise``, ``text = W_t z + noise`` — rows with the
    same index share the latent ``z``, so a contrastive model can align
    them; mismatched rows cannot be aligned above chance.
    """

    num_pairs: int = 2048
    video_dim: int = 512
    text_dim: int = 384
    latent_dim: int = 64
    noise: float = 0.1
    seed: int = 0
    # sequence lengths; 0 = pooled [N, D] features, >0 = [N, S, D] frame /
    # token sequences sharing the pair latent (for transformer towers)
    video_seq_len: int = 0
    text_seq_len: int = 0
    # draw per-row valid lengths in [1, S] and emit [N, S] key-padding
    # masks (real clip/caption sets are ragged); padded steps are zeroed
    variable_lengths: bool = False

    def __post_init__(self):
        rng = np.random.default_rng(self.seed)
        z = rng.standard_normal((self.num_pairs, self.latent_dim)).astype(np.float32)

        def modality(dim: int, seq_len: int):
            w = rng.standard_normal((self.latent_dim, dim)).astype(
                np.float32
            ) / np.sqrt(self.latent_dim)
            pooled = z @ w
            if seq_len == 0:
                feats = pooled + self.noise * rng.standard_normal(
                    pooled.shape
                ).astype(np.float32)
                return feats, None
            # each timestep = shared pair signal + per-step noise
            seq = np.repeat(pooled[:, None, :], seq_len, axis=1)
            seq = seq + self.noise * rng.standard_normal(seq.shape).astype(
                np.float32
            )
            if not self.variable_lengths:
                return seq, None
            lengths = rng.integers(1, seq_len + 1, size=self.num_pairs)
            mask = (
                np.arange(seq_len)[None, :] < lengths[:, None]
            ).astype(np.float32)
            return seq * mask[:, :, None], mask

        self.video, self.video_mask = modality(self.video_dim, self.video_seq_len)
        self.text, self.text_mask = modality(self.text_dim, self.text_seq_len)

    def __len__(self) -> int:
        return self.num_pairs


class FeaturePairDataset:
    """Aligned pre-extracted features from two ``.npy`` files.

    Files are memory-mapped, so arbitrarily large feature stores never
    load fully into host RAM; batch assembly gathers only the touched rows.

    ``video_mask_path`` / ``text_mask_path``: optional ``[N, S]`` key-
    padding masks (1 = valid) for ``[N, S, D]`` sequence stores with
    ragged true lengths (scripts/prepare_features.py emits them alongside
    padded sequence archives).

    ``dtype="bfloat16"``: the stores hold bf16 payloads (written by
    ``prepare_features --dtype bfloat16``) — half the disk, page-cache,
    gather, and H2D bytes of fp32.  numpy round-trips bf16 ``.npy``
    files as raw 2-byte records (``|V2`` or ``uint16``), so the mmap is
    VIEWED through ``ml_dtypes.bfloat16`` here.  Value-identical for
    bf16-matmul towers, whose first layer casts inputs to bf16 anyway.

    ``dtype="int8"``: per-row symmetric int8 payloads (written by
    ``prepare_features --dtype int8``) with fp32 scales in sibling
    ``<stem>_scale.npy`` files — 4× fewer bytes than fp32 end to end.
    Batches then carry ``video_scale`` / ``text_scale`` ``[B]`` entries;
    dequantization happens on DEVICE inside the jitted step (see
    data.quantize).
    """

    def __init__(
        self,
        video_path: str | Path,
        text_path: str | Path,
        video_mask_path: str | Path | None = None,
        text_mask_path: str | Path | None = None,
        dtype: str | None = None,
    ):
        self.video = self._load_feats(video_path, dtype, "video")
        self.text = self._load_feats(text_path, dtype, "text")
        if self.video.shape[0] != self.text.shape[0]:
            raise ValueError(
                f"row mismatch: video {self.video.shape[0]} vs text "
                f"{self.text.shape[0]}"
            )
        self.video_mask = self._load_mask(video_mask_path, self.video, "video")
        self.text_mask = self._load_mask(text_mask_path, self.text, "text")
        self.video_scale = self.text_scale = None
        if dtype == "int8":
            self.video_scale = self._load_scale(video_path, self.video, "video")
            self.text_scale = self._load_scale(text_path, self.text, "text")

    @staticmethod
    def _load_feats(path, dtype, name):
        arr = np.load(path, mmap_mode="r")
        if dtype in (None, "float32"):
            if arr.dtype.itemsize == 2 and arr.dtype.kind in ("V", "u"):
                raise ValueError(
                    f"{name} store {path} holds 2-byte records (a bf16 "
                    "store?) — pass dtype='bfloat16' (data.features_dtype)"
                )
            if arr.dtype == np.int8:
                raise ValueError(
                    f"{name} store {path} holds int8 payloads — pass "
                    "dtype='int8' (data.features_dtype)"
                )
            return arr
        if dtype == "int8":
            if arr.dtype != np.int8:
                raise ValueError(
                    f"{name} store {path} has dtype {arr.dtype}, not int8 "
                    "— re-export with prepare_features --dtype int8 (or "
                    "fix data.features_dtype)"
                )
            return arr
        if dtype != "bfloat16":
            raise ValueError(f"unsupported features dtype {dtype!r}")
        import ml_dtypes

        if arr.dtype == ml_dtypes.bfloat16:
            return arr
        # only raw 2-byte records may be VIEWED as bf16; a float16 store
        # has the same itemsize but different bits — viewing it would
        # silently produce garbage features (fp16 1.0 -> bf16 ~0.0078)
        if arr.dtype.itemsize != 2 or arr.dtype.kind not in ("V", "u"):
            raise ValueError(
                f"{name} store {path} has dtype {arr.dtype}, not a 2-byte "
                "bf16 payload — re-export with prepare_features "
                "--dtype bfloat16 (float16 stores must be CONVERTED, "
                "not relabeled; or drop data.features_dtype)"
            )
        return arr.view(ml_dtypes.bfloat16)

    @staticmethod
    def _load_scale(path, feats, name):
        """Per-row fp32 scales for an int8 store: sibling
        ``<stem>_scale.npy`` next to the payload file."""
        path = Path(path)
        scale_path = path.with_name(path.stem + "_scale.npy")
        if not scale_path.exists():
            raise ValueError(
                f"int8 {name} store {path} has no scale file {scale_path} "
                "— re-export with prepare_features --dtype int8"
            )
        scale = np.load(scale_path, mmap_mode="r")
        if scale.shape != (feats.shape[0],) or scale.dtype != np.float32:
            raise ValueError(
                f"{scale_path} must be float32 [{feats.shape[0]}], got "
                f"{scale.dtype} {scale.shape}"
            )
        return scale

    @staticmethod
    def _load_mask(path, feats, name):
        if path is None:
            return None
        mask = np.load(path, mmap_mode="r")
        if feats.ndim != 3:
            raise ValueError(
                f"{name}_mask provided but {name} features are pooled "
                f"{feats.shape}; masks require [N, S, D] sequences"
            )
        if mask.shape != feats.shape[:2]:
            raise ValueError(
                f"{name}_mask shape {mask.shape} does not match "
                f"features {feats.shape[:2]}"
            )
        return mask

    def __len__(self) -> int:
        return self.video.shape[0]


class RowSubset:
    """Lazy contiguous row-range view ``[start, stop)`` of a dataset.

    Plain slicing keeps memory-mapped stores lazy (no copy); composes with
    :class:`HostShard` and the batchers like any dataset.
    """

    def __init__(self, dataset, start: int, stop: int):
        self.video = dataset.video[start:stop]
        self.text = dataset.text[start:stop]
        for name in _AUX_FIELDS:
            m = getattr(dataset, name, None)
            setattr(self, name, None if m is None else m[start:stop])

    def __len__(self) -> int:
        return self.video.shape[0]


def train_eval_split(dataset, eval_rows: int) -> tuple["RowSubset", "RowSubset"]:
    """Split into disjoint (train, eval) row views: eval = the FIRST
    ``eval_rows`` rows, train = everything after.

    The retrieval protocol (README.md:7, paper eval) is meaningless if the
    eval pairs were trained on, so the CLI must never feed eval rows to the
    train stream.  First-rows (rather than a random subset) keeps the eval
    set identical across hosts and across resumed runs with no extra state.
    """
    n = len(dataset)
    if not 0 < eval_rows < n:
        raise ValueError(
            f"eval_rows must be in (0, {n}), got {eval_rows}: need at least "
            "one train row and one eval row"
        )
    return RowSubset(dataset, eval_rows, n), RowSubset(dataset, 0, eval_rows)


class HostShard:
    """Per-process row shard of a dataset for multi-host training.

    Process ``p`` of ``P`` sees rows ``p::P`` (a lazy strided view — no
    copy even for memory-mapped stores), truncated to ``floor(N/P)`` rows
    so EVERY host has the same shard length: unequal lengths would give
    hosts different epoch boundaries, desynchronizing the (seed, epoch)
    shuffle streams and breaking the same-epoch disjoint union.  Every
    host shuffles its shard with the same stream, so the global batch is
    a deterministic disjoint union across hosts.
    """

    def __init__(self, dataset, process_index: int, process_count: int):
        usable = len(dataset) // process_count
        self.video = dataset.video[process_index::process_count][:usable]
        self.text = dataset.text[process_index::process_count][:usable]
        for name in _AUX_FIELDS:
            m = getattr(dataset, name, None)
            setattr(
                self,
                name,
                None if m is None else m[process_index::process_count][:usable],
            )

    def __len__(self) -> int:
        return self.video.shape[0]


def _epoch_indices(
    n_rows: int,
    batch_size: int,
    *,
    seed: int,
    epoch: int,
    shuffle: bool,
    drop_remainder: bool,
    start_batch: int,
) -> Iterator[np.ndarray]:
    """One epoch of per-batch row indices — the SINGLE source of batch
    order, shared by every batcher so the streams can never drift.
    Each batch's indices are sorted (mmap/page-cache-friendly gathers;
    within-batch order is immaterial to a contrastive batch)."""
    order = np.arange(n_rows)
    if shuffle:
        np.random.default_rng((seed, epoch)).shuffle(order)
    end = n_rows - (n_rows % batch_size) if drop_remainder else n_rows
    for start in range(start_batch * batch_size, end, batch_size):
        yield np.sort(order[start : start + batch_size])


# optional per-row companions to the two feature fields, carried through
# every view (RowSubset/HostShard) and batcher: key-padding masks for
# ragged sequences, per-row scales for int8 stores (data.quantize)
_AUX_FIELDS = ("video_mask", "text_mask", "video_scale", "text_scale")


def _batch_fields(dataset) -> dict:
    fields = {"video": dataset.video, "text": dataset.text}
    for name in _AUX_FIELDS:
        m = getattr(dataset, name, None)
        if m is not None:
            fields[name] = m
    return fields


def epoch_batches(
    dataset,
    batch_size: int,
    *,
    seed: int = 0,
    epoch: int = 0,
    shuffle: bool = True,
    drop_remainder: bool = True,
    start_batch: int = 0,
) -> Iterator[dict]:
    """Yield ``{"video": [B, Dv], "text": [B, Dt]}`` numpy batches.

    Deterministic in (seed, epoch): restart-from-checkpoint replays the
    same order.  ``drop_remainder`` keeps shapes static for jit.
    ``start_batch`` skips the first batches WITHOUT gathering their rows
    (resume support).
    """
    from .native_io import gather_rows

    fields = _batch_fields(dataset)
    for idx in _epoch_indices(
        len(dataset), batch_size, seed=seed, epoch=epoch, shuffle=shuffle,
        drop_remainder=drop_remainder, start_batch=start_batch,
    ):
        yield {k: gather_rows(src, idx) for k, src in fields.items()}


def infinite_batches(
    dataset, batch_size: int, *, seed: int = 0, start_step: int = 0, **kw
) -> Iterator[dict]:
    """Endless stream of epoch batches with per-epoch reshuffling.

    ``start_step`` fast-forwards the stream to the state it had after that
    many batches were consumed — resumed-from-checkpoint runs continue the
    exact sequence instead of re-consuming the start of the stream.  The
    skip is index-only (no feature rows are gathered).
    """
    n = len(dataset)
    if kw.get("drop_remainder", True):
        per_epoch = n // batch_size
    else:
        per_epoch = -(-n // batch_size)  # ceil: last partial batch counts
    if per_epoch == 0:
        raise ValueError(
            f"batch_size {batch_size} exceeds dataset size {n}"
        )
    epoch, start_batch = divmod(start_step, per_epoch)
    while True:
        yield from epoch_batches(
            dataset, batch_size, seed=seed, epoch=epoch,
            start_batch=start_batch, **kw
        )
        start_batch = 0
        epoch += 1


def stacked_chunks(
    dataset,
    batch_size: int,
    n: int,
    *,
    seed: int = 0,
    start_step: int = 0,
    shuffle: bool = True,
    reuse_buffers: int = 0,
) -> Iterator[dict]:
    """Endless ``[n, B, ...]`` stacked chunks, assembled with ONE gather.

    Yields chunks numerically identical to
    ``stack_batches(infinite_batches(dataset, B, ...), n)`` — the same
    shuffle stream, per-batch sorted indices, epoch wrap, and
    ``start_step`` resume — but each chunk's rows are copied out of the
    store in a single multithreaded ``gather_rows`` call per modality
    instead of ``n`` per-batch gathers plus an ``np.stack`` re-copy.
    One fresh-pages pass instead of two, and the copy runs in the native
    pool: measured ~20× faster chunk assembly on a 1-core host (the
    ``np.stack`` of 64×4096 fp32 batches alone took 3 s for 0.5 GB).
    This is the host-side half of the ``steps_per_call`` pipeline; see
    ``Trainer.train_steps`` for the device half.

    ``reuse_buffers=k`` (k ≥ 2): assemble into a ring of ``k``
    preallocated destination buffers instead of a fresh allocation per
    chunk.  Fresh chunk-sized allocations first-touch-fault every page
    (measured 0.10-0.22 GB/s vs 2.5-2.9 GB/s into warm pages on a 1-core
    host), and glibc intermittently returns the pages between chunks, so
    steady-state assembly is ~6× slower without the ring.  CONTRACT: a
    yielded chunk's arrays are only valid until ``k - 1`` more chunks
    have been drawn — callers that stream each chunk straight to the
    device (train.py holds ≤ 3: queued + in-assembly + in-transfer) pass
    k ≥ 4; callers that retain chunks use the default fresh-allocation
    mode.
    """
    from .native_io import gather_rows

    if reuse_buffers < 0 or reuse_buffers == 1:
        # negative values would otherwise build an empty ring and silently
        # degrade to fresh-allocation mode; 1 would overwrite the chunk
        # just yielded
        raise ValueError(
            f"reuse_buffers={reuse_buffers}: use 0 (fresh allocations) "
            "or >= 2 (destination ring)"
        )
    n_rows = len(dataset)
    per_epoch = n_rows // batch_size
    if per_epoch == 0:
        raise ValueError(f"batch_size {batch_size} exceeds dataset size {n_rows}")
    epoch, start_batch = divmod(start_step, per_epoch)
    fields = _batch_fields(dataset)

    def index_stream():
        e, sb = epoch, start_batch
        while True:
            yield from _epoch_indices(
                n_rows, batch_size, seed=seed, epoch=e, shuffle=shuffle,
                drop_remainder=True, start_batch=sb,
            )
            sb = 0
            e += 1

    ring = (
        [
            {
                k: np.empty(
                    (n * batch_size, *src.shape[1:]), dtype=src.dtype
                )
                for k, src in fields.items()
            }
            for _ in range(reuse_buffers)
        ]
        if reuse_buffers
        else None
    )
    stream = index_stream()
    draw = 0
    while True:
        flat = np.concatenate([next(stream) for _ in range(n)])
        bufs = ring[draw % reuse_buffers] if ring else {}
        draw += 1
        yield {
            k: gather_rows(src, flat, out=bufs.get(k)).reshape(
                n, batch_size, *src.shape[1:]
            )
            for k, src in fields.items()
        }


def stack_batches(batches: Iterator[dict], n: int) -> Iterator[dict]:
    """Group consecutive batches into ``[n, B, ...]`` stacked host chunks.

    Feeds ``Trainer.train_steps`` (``steps_per_call``): one stacked chunk
    is one device dispatch AND one H2D transfer.  Stacking happens on the
    HOST (numpy), so in multi-process runs the per-process row shards
    stack locally and ``prefetch_to_device`` stitches the stacked chunk
    into a global ``[n, B_global, ...]`` array — the piece that makes
    steps_per_call work multi-host.  A final partial group (iterator
    exhausted) is yielded as-is with a shorter leading axis.
    """
    group: list[dict] = []
    for b in batches:
        group.append(b)
        if len(group) == n:
            yield {k: np.stack([g[k] for g in group]) for k in group[0]}
            group = []
    if group:
        yield {k: np.stack([g[k] for g in group]) for k in group[0]}


def prefetch_to_device(
    batches: Iterator[dict], size: int = 2, sharding=None, threaded: bool = True
):
    """Keep ``size`` batches in flight on the device ahead of consumption.

    Single-process (default): a background thread assembles (``next``) and
    transfers (``jax.device_put``) upcoming batches while the consumer
    thread dispatches train steps, so steady-state throughput is
    ``max(assembly + H2D, compute)`` instead of their sum — the recipe
    that keeps the TPU from stalling on host input (the reference pays
    this stall every step via its per-forward numpy-eye uploads,
    loss.py:66,102-104).  The worker fences each transfer
    (``block_until_ready``) before drawing the next batch, so source ring
    buffers (``stacked_chunks(reuse_buffers=...)``) are never overwritten
    mid-DMA.

    Multi-process (or ``threaded=False``): the transfer runs on the
    consumer thread between yields —
    ``jax.make_array_from_process_local_data`` participates in the global
    device layout and stays off worker threads.

    CPU destinations (tests, dev rigs): the worker thread does HOST work
    only — ``jax`` is never driven from the worker.  XLA:CPU's
    intra-process collectives rendezvous on the compute thread pool, and
    a concurrent ``device_put`` from a second thread while the consumer
    executes a sharded step can starve one participant — observed as a
    fatal ``all gather Rendezvous ... Termination timeout`` abort on the
    8-virtual-device mesh.  On CPU ``device_put`` is a zero-copy alias
    anyway, so the consumer-side transfer costs nothing; the worker's job
    reduces to copying batches out of reused ring buffers.

    ``sharding``: optional NamedSharding applied to every array.
    """
    import collections

    import jax

    multi_process = jax.process_count() > 1
    # on a host-memory destination (CPU backend) device_put is zero-copy —
    # the "device" array ALIASES the numpy buffer, so a ring-reused source
    # (stacked_chunks' destination ring) would be rewritten under the
    # consumer; materialize a private copy there.  Real accelerators DMA.
    dest_devices = (
        sharding.device_set if sharding is not None else {jax.devices()[0]}
    )
    aliasing_dest = all(d.platform == "cpu" for d in dest_devices)

    def host_stage(v):
        # private copy when the destination would alias the (possibly
        # ring-reused) source buffer; real accelerators DMA a copy out
        if aliasing_dest and isinstance(v, np.ndarray):
            return np.array(v)
        return v

    def device_stage(v):
        if sharding is None:
            return jax.device_put(v)
        if multi_process:
            # each process holds only its rows of the global batch; stitch
            # them into one globally-sharded array without gathering
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(v)
            )
        return jax.device_put(v, sharding)

    def put(v):
        return device_stage(host_stage(v))

    if multi_process or not threaded:
        queue = collections.deque()

        def put_next() -> bool:
            try:
                batch = next(batches)
            except StopIteration:
                return False
            moved = {k: put(v) for k, v in batch.items()}
            # fence before the NEXT draw may overwrite a ring-reused
            # source buffer (stacked_chunks' destination ring) — same
            # hazard the threaded branch fences; the transfer overlaps
            # the consumer's (async) compute either way
            jax.block_until_ready(moved)
            queue.append(moved)
            return True

        for _ in range(size):
            if not put_next():
                break
        while queue:
            out = queue.popleft()
            put_next()
            yield out
        return

    import queue as queue_mod
    import threading

    q: queue_mod.Queue = queue_mod.Queue(maxsize=max(size, 1))
    stop = threading.Event()
    sentinel = object()

    def offer(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue_mod.Full:
                continue
        return False

    def worker():
        try:
            for batch in batches:
                if stop.is_set():
                    return
                moved = {k: host_stage(v) for k, v in batch.items()}
                if not aliasing_dest:
                    # real accelerator: transfer from the worker and fence —
                    # the source buffers may be ring-reused by the NEXT
                    # draw; don't request it until the DMA completed.  (On
                    # aliasing/CPU dests jax stays off this thread entirely
                    # — see docstring — and host_stage's copy already
                    # detached the batch from the ring.)
                    moved = {k: device_stage(v) for k, v in moved.items()}
                    jax.block_until_ready(moved)
                if not offer(moved):
                    return
            offer(sentinel)
        except BaseException as exc:  # noqa: BLE001 — re-raised by consumer
            offer(exc)

    thread = threading.Thread(
        target=worker, name="crossclr-prefetch", daemon=True
    )
    thread.start()
    try:
        while True:
            # bounded wait + liveness check: if the worker dies without
            # delivering the sentinel or an exception (abrupt thread
            # death), fail loudly instead of hanging the training loop
            # on q.get() forever
            try:
                item = q.get(timeout=5.0)
            except queue_mod.Empty:
                if not thread.is_alive():
                    raise RuntimeError(
                        "prefetch worker thread died without delivering "
                        "a sentinel or exception"
                    ) from None
                continue
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            if aliasing_dest:
                # zero-copy alias of the worker's private copy
                item = {k: device_stage(v) for k, v in item.items()}
            yield item
    finally:
        stop.set()
        # don't leave the worker mid-device_put across interpreter
        # shutdown (daemon threads die abruptly and can fault in the
        # runtime); it re-checks `stop` every 0.1 s when queue-blocked
        thread.join(timeout=10.0)
