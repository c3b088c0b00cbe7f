"""AOT-exported serving artifacts (``jax.export``).

``export_search`` compiles a :class:`~crossclr_tpu.serve.RetrievalService`'s
fused query→top-k computation — query tower and parameters baked in as
constants — into a serialized StableHLO module.  The corpus index rides
along as plain arrays in the same ``.npz`` (exported-function ARGUMENTS,
not embedded constants: the index keeps its storage dtype — fp32 / bf16
/ int8 — so a quantized index stays quantized on disk and in HBM, and
the StableHLO blob stays small enough to deserialize fast).  A consumer
loads the artifact with :class:`SearchArtifact` (or ~25 lines of bare
``jax.export.deserialize`` code — see the class body): **no model code,
config, or checkpoint is needed at load time**, and StableHLO's
compatibility guarantees hold across jax releases (6 months backward /
3 weeks forward).  This is the deployment handoff the reference leaves
to the user (SURVEY.md §1: the reference ships only the loss; serving is
out of its scope).

Contract baked at export time:
  * the query batch dimension is SYMBOLIC — one artifact serves any
    batch size without re-export;
  * ``k`` is static (``lax.top_k`` needs it); requests for smaller k
    slice the first columns (top-k is sorted descending);
  * scoring semantics are IDENTICAL to the live service's (same
    normalize/cast/quantize ops, traced rather than pre-folded);
  * single-device only — a ``--shard-corpus`` service spans a mesh the
    consumer machine cannot be assumed to have.
"""

from __future__ import annotations

import json

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["export_search", "save_artifact", "SearchArtifact"]

ARTIFACT_VERSION = 2


def _corpus_parts(corpus) -> tuple:
    """A service index as a flat tuple of arrays (1 dense or 2 quantized)."""
    from .evaluation.retrieval import QuantizedCorpus

    if isinstance(corpus, QuantizedCorpus):
        return (corpus.values, corpus.scales)
    return (corpus,)


def export_search(
    service,
    *,
    k: int,
    query_shape: tuple[int, ...] | None = None,
    platforms: tuple[str, ...] | None = None,
):
    """Export ``service``'s search as ``(blob: bytes, meta: dict,
    corpus_parts: tuple[np.ndarray, ...])``.

    ``query_shape``: per-query trailing feature shape — ``(D,)`` for
    pooled features (the default, read off the query tower's input dim)
    or ``(S, D)`` for sequence features, which adds a ``[b, S]`` mask
    argument to the exported signature.  ``platforms``: lowering targets
    (e.g. ``("tpu", "cpu")``); defaults to the current backend.
    """
    from jax import export as jax_export

    from .evaluation.retrieval import (
        QuantizedCorpus,
        _quantize_queries,
        _quantized_sim,
    )
    from .losses.functional import l2_normalize

    if service.mesh is not None:
        raise ValueError(
            "cannot export a sharded-corpus service: the artifact must "
            "run on a consumer machine without this mesh (serve without "
            "--shard-corpus to export)"
        )
    k = int(min(k, service.corpus_rows))
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    encode = service.trainer.encode_modality_raw(service.query_side)
    # params are baked as module constants (they ARE the "no model code
    # needed" part); the index travels as arguments so its storage dtype
    # survives and the serialized module stays small
    params = jax.device_get(service.state.params)
    corpus_host = tuple(
        np.asarray(p) for p in _corpus_parts(jax.device_get(service.corpus_emb))
    )
    quantized = isinstance(service.corpus_emb, QuantizedCorpus)
    if query_shape is None:
        tower_cfg = getattr(
            service.trainer, f"{service.query_side}_cfg", None
        )
        input_dim = getattr(tower_cfg, "input_dim", None)
        if input_dim is None:
            raise ValueError(
                "could not infer the query feature dim; pass query_shape="
            )
        query_shape = (int(input_dim),)
    with_mask = len(query_shape) == 2

    def fn(features, mask, *corpus):
        q = encode(params, features, mask)
        if quantized:
            qv, qs = _quantize_queries(q)
            sim = _quantized_sim(qv, qs, QuantizedCorpus(*corpus))
        else:
            (c,) = corpus
            qn = l2_normalize(q.astype(jnp.float32), axis=1)
            cn = l2_normalize(c.astype(jnp.float32), axis=1)
            sim = jnp.matmul(qn, cn.T, precision=jax.lax.Precision.HIGHEST)
        return jax.lax.top_k(sim, k)

    (b,) = jax_export.symbolic_shape("b")
    corpus_specs = tuple(
        jax.ShapeDtypeStruct(p.shape, p.dtype) for p in corpus_host
    )
    feat_spec = jax.ShapeDtypeStruct((b, *query_shape), jnp.float32)
    if with_mask:
        mask_spec = jax.ShapeDtypeStruct((b, query_shape[0]), jnp.float32)
        args = (feat_spec, mask_spec, *corpus_specs)
        wrapped = jax.jit(fn)
    else:
        args = (feat_spec, *corpus_specs)
        wrapped = jax.jit(lambda f, *c: fn(f, None, *c))
    exported = jax_export.export(
        wrapped, platforms=list(platforms) if platforms else None
    )(*args)
    meta = {
        "version": ARTIFACT_VERSION,
        "k": k,
        "query_side": service.query_side,
        "corpus_side": service.corpus_side,
        "corpus_rows": service.corpus_rows,
        "query_shape": list(query_shape),
        "with_mask": with_mask,
        "step": service.step,
        "platforms": list(exported.platforms),
        "index_dtype": (
            "int8" if quantized else str(jnp.dtype(service.corpus_dtype))
        ),
        # npz has no native bf16: such parts are stored as a uint16 view
        "corpus_dtypes": [str(p.dtype) for p in corpus_host],
    }
    return exported.serialize(), meta, corpus_host


def save_artifact(
    path: str,
    blob: bytes,
    meta: dict,
    corpus_parts: tuple,
    ids: list[str] | None = None,
) -> None:
    """Write the artifact ``.npz``: the serialized module, a JSON meta
    record, the index arrays, and (optionally) row-aligned corpus ids."""
    arrays = {
        "exported": np.frombuffer(blob, np.uint8),
        "meta": np.asarray(json.dumps(meta)),
    }
    for i, part in enumerate(corpus_parts):
        part = np.asarray(part)
        if part.dtype.kind == "V" or "bfloat16" in str(part.dtype):
            part = part.view(np.uint16)  # npz-storable; meta records bf16
        arrays[f"corpus_{i}"] = part
    if ids is not None:
        arrays["ids"] = np.asarray(ids)
    np.savez(path, **arrays)


class SearchArtifact:
    """Load and run an exported search artifact.

    Needs only ``jax`` + ``numpy`` — no crossclr_tpu config, model code,
    or checkpoint.  ``search`` mirrors the HTTP service's result shape
    (``{"indices", "scores", "ids"?}``).
    """

    def __init__(self, exported, meta: dict, corpus_parts: tuple,
                 ids: list[str] | None = None):
        self.meta = meta
        self.ids = ids
        # commit the index to the device once; jit then reuses the
        # resident arrays instead of re-transferring them per call
        self._corpus = tuple(jnp.asarray(p) for p in corpus_parts)
        # jit over .call: the deserialized module re-dispatches through
        # XLA; jit caches the compilation per concrete batch size
        self._fn = jax.jit(exported.call)

    @classmethod
    def load(cls, path: str) -> "SearchArtifact":
        from jax import export as jax_export

        with np.load(path, allow_pickle=False) as npz:
            exported = jax_export.deserialize(npz["exported"].tobytes())
            meta = json.loads(str(npz["meta"]))
            parts = []
            for i, dtype in enumerate(meta["corpus_dtypes"]):
                part = npz[f"corpus_{i}"]
                if dtype == "bfloat16":
                    import ml_dtypes

                    part = part.view(ml_dtypes.bfloat16)
                parts.append(part)
            ids = [str(i) for i in npz["ids"]] if "ids" in npz else None
        return cls(exported, meta, tuple(parts), ids)

    def search(self, features, mask=None, k: int | None = None) -> dict:
        """Top-k retrieval; ``k`` defaults to (and cannot exceed) the
        baked export-time k — smaller k slices the sorted columns."""
        k_max = self.meta["k"]
        k = k_max if k is None else int(k)
        if not 0 < k <= k_max:
            raise ValueError(
                f"k={k} outside (0, {k_max}] baked into this artifact"
            )
        features = np.asarray(features, np.float32)
        if features.ndim == len(self.meta["query_shape"]):
            features = features[None]  # single-query convenience
        if self.meta["with_mask"]:
            if mask is None:
                mask = np.ones(features.shape[:2], np.float32)
            else:
                mask = np.asarray(mask, np.float32)
                if mask.ndim == 1:  # single-query convenience, like serve
                    mask = mask[None]
            scores, idx = self._fn(features, mask, *self._corpus)
        elif mask is not None:
            raise ValueError("this artifact's queries are pooled (no mask)")
        else:
            scores, idx = self._fn(features, *self._corpus)
        scores = np.asarray(scores)[:, :k]
        idx = np.asarray(idx)[:, :k]
        out = {"indices": idx.tolist(), "scores": scores.tolist()}
        if self.ids is not None:
            out["ids"] = [[self.ids[j] for j in row] for row in idx.tolist()]
        return out
