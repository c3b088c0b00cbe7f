"""AOT-exported serving artifacts (``jax.export``).

``export_search`` compiles a :class:`~crossclr_tpu.serve.RetrievalService`'s
fused query→top-k computation — query tower, parameters, AND the encoded
corpus index baked in as constants — into a serialized StableHLO module.
The artifact is a single ``.npz`` file that a consumer loads with
:class:`SearchArtifact` (or ~20 lines of bare ``jax.export.deserialize``
code — see the class body): **no model code, config, or checkpoint is
needed at load time**, and StableHLO's compatibility guarantees hold
across jax releases (6 months backward / 3 weeks forward).  This is the
deployment handoff the reference leaves to the user (SURVEY.md §1: the
reference ships only the loss; serving is out of its scope).

Contract baked at export time:
  * the query batch dimension is SYMBOLIC — one artifact serves any
    batch size without re-export or recompilation at trace level;
  * ``k`` is static (``lax.top_k`` needs it); requests for smaller k
    slice the first columns (top-k is sorted descending);
  * the index dtype (fp32 / bf16 / int8-quantized) is whatever the
    service was built with;
  * single-device only — a ``--shard-corpus`` service spans a mesh the
    consumer machine cannot be assumed to have.
"""

from __future__ import annotations

import json

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["export_search", "save_artifact", "SearchArtifact"]

ARTIFACT_VERSION = 1


def export_search(
    service,
    *,
    k: int,
    query_shape: tuple[int, ...] | None = None,
    platforms: tuple[str, ...] | None = None,
):
    """Export ``service``'s search as ``(blob: bytes, meta: dict)``.

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
    # pull constants to the host: exported constants must not carry the
    # build machine's device placement/sharding — the artifact is
    # single-device by contract
    params = jax.device_get(service.state.params)
    corpus = jax.device_get(service.corpus_emb)
    quantized = isinstance(corpus, QuantizedCorpus)
    if query_shape is None:
        tower_cfg = getattr(
            service.trainer,
            f"{service.query_side}_cfg",
            None,
        )
        input_dim = getattr(tower_cfg, "input_dim", None)
        if input_dim is None:
            raise ValueError(
                "could not infer the query feature dim; pass query_shape="
            )
        query_shape = (int(input_dim),)
    with_mask = len(query_shape) == 2

    def fn(features, mask=None):
        q = encode(params, features, mask)
        if quantized:
            qv, qs = _quantize_queries(q)
            sim = _quantized_sim(qv, qs, corpus)
        else:
            qn = l2_normalize(q.astype(jnp.float32), axis=1)
            cn = l2_normalize(corpus.astype(jnp.float32), axis=1)
            sim = jnp.matmul(qn, cn.T, precision=jax.lax.Precision.HIGHEST)
        return jax.lax.top_k(sim, k)

    (b,) = jax_export.symbolic_shape("b")
    feat_spec = jax.ShapeDtypeStruct((b, *query_shape), jnp.float32)
    args = (feat_spec,)
    if with_mask:
        args += (jax.ShapeDtypeStruct((b, query_shape[0]), jnp.float32),)
        wrapped = jax.jit(lambda f, m: fn(f, m))
    else:
        wrapped = jax.jit(lambda f: fn(f, None))
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
        "index_dtype": "int8" if quantized else str(service.corpus_dtype),
    }
    return exported.serialize(), meta


def save_artifact(
    path: str, blob: bytes, meta: dict, ids: list[str] | None = None
) -> None:
    """Write the artifact ``.npz``: the serialized module, a JSON meta
    record, and (optionally) the row-aligned corpus ids."""
    arrays = {
        "exported": np.frombuffer(blob, np.uint8),
        "meta": np.asarray(json.dumps(meta)),
    }
    if ids is not None:
        arrays["ids"] = np.asarray(ids)
    np.savez(path, **arrays)


class SearchArtifact:
    """Load and run an exported search artifact.

    Needs only ``jax`` + ``numpy`` — no crossclr_tpu config, model code,
    or checkpoint.  ``search`` mirrors the HTTP service's result shape
    (``{"indices", "scores", "ids"?}``).
    """

    def __init__(self, exported, meta: dict, ids: list[str] | None = None):
        self.meta = meta
        self.ids = ids
        # jit over .call: the deserialized module re-dispatches through
        # XLA; jit caches the compilation per concrete batch size
        self._fn = jax.jit(exported.call)

    @classmethod
    def load(cls, path: str) -> "SearchArtifact":
        from jax import export as jax_export

        with np.load(path, allow_pickle=False) as npz:
            exported = jax_export.deserialize(npz["exported"].tobytes())
            meta = json.loads(str(npz["meta"]))
            ids = [str(i) for i in npz["ids"]] if "ids" in npz else None
        return cls(exported, meta, ids)

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
            scores, idx = self._fn(features, np.asarray(mask, np.float32))
        elif mask is not None:
            raise ValueError("this artifact's queries are pooled (no mask)")
        else:
            scores, idx = self._fn(features)
        scores = np.asarray(scores)[:, :k]
        idx = np.asarray(idx)[:, :k]
        out = {"indices": idx.tolist(), "scores": scores.tolist()}
        if self.ids is not None:
            out["ids"] = [[self.ids[j] for j in row] for row in idx.tolist()]
        return out
