"""PyTorch state_dict → Flax parameter-tree conversion.

The reference is a PyTorch release (``/root/reference/trainer/loss.py``),
so migrating users arrive with torch checkpoints: criterion state (the
vestigial ``logit_scale``, loss.py:52) and — since the reference ships no
model code (SURVEY.md §1) — dual towers they wrote themselves in torch.
This module converts those state_dicts into parameter trees for
:class:`crossclr_tpu.models.MLPTower` / :class:`TransformerTower` /
:class:`DualEncoder`, handling the layout differences:

* ``torch.nn.Linear.weight`` is ``[out, in]``; a Flax ``Dense`` kernel is
  ``[in, out]`` → transpose.
* Attention q/k/v projections are single ``[embed, embed]`` Linears in
  torch; Flax ``DenseGeneral`` kernels are ``[embed, heads, head_dim]``
  (and the output projection ``[heads, head_dim, embed]``) → transpose +
  reshape, with ``heads``/``head_dim`` read off the template leaf.
* ``torch.nn.LayerNorm.weight`` → Flax ``scale``.

Key correspondence is structural: each Flax leaf path joined with ``.``
(``block_0.LayerNorm_0.scale``) maps to the torch key with the leaf name
rewritten (``kernel``/``scale`` → ``weight``), so a torch tower whose
attribute names mirror the Flax module names converts with no extra
configuration.  Towers with other naming pass ``rename=`` — either a
``{torch_prefix: flax_prefix}`` dict applied longest-prefix-first or a
callable on full keys — which is what a real migration writes once per
architecture (see MIGRATING.md).

Numerical caveats a migrating tower must already share with ours (they
are architecture choices, not conversion concerns): tanh-approximate
GELU (``flax.linen.gelu`` default), LayerNorm ``eps=1e-6`` (Flax default;
torch defaults to 1e-5), and query scaling by ``1/sqrt(head_dim)``.
``tests/test_torch_import.py`` pins exact-math equality against live
torch mirrors of both tower kinds.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "params_from_torch",
    "dual_encoder_params_from_torch",
    "logit_scale_from_torch",
    "state_dict_from_params",
]

# torch buffer suffixes that are bookkeeping, not parameters — never
# reported as unconsumed (BatchNorm-style buffers in user towers)
_IGNORED_SUFFIXES = ("num_batches_tracked",)


def _path_names(path) -> tuple:
    """A jax key path as plain names (DictKey.key / SequenceKey.idx)."""
    return tuple(getattr(p, "key", getattr(p, "idx", p)) for p in path)


def _to_numpy(value: Any) -> np.ndarray:
    """torch.Tensor / array-like → float64-safe numpy (no torch import
    required when the caller already passes numpy)."""
    if hasattr(value, "detach"):  # torch.Tensor without importing torch
        value = value.detach().cpu()
        try:
            value = value.numpy()
        except TypeError:
            # bfloat16/float8 tensors have no native numpy dtype; upcast
            # (the template dtype is re-applied in _convert_leaf anyway)
            value = value.float().numpy()
    return np.asarray(value)


def _apply_rename(
    key: str, rename: Mapping[str, str] | Callable[[str], str] | None
) -> str:
    if rename is None:
        return key
    if callable(rename):
        return rename(key)
    # longest-prefix-first so "tower.block." beats "tower."
    for prefix in sorted(rename, key=len, reverse=True):
        if key.startswith(prefix):
            return rename[prefix] + key[len(prefix):]
    return key


def _flax_key_candidates(path: tuple[str, ...]) -> list[str]:
    """Torch state_dict keys that map onto this Flax leaf path."""
    *modules, leaf = path
    base = ".".join(modules)
    if leaf in ("kernel", "scale"):
        names = ["weight"]
    elif leaf == "bias":
        names = ["bias"]
    else:
        # bare param leaf (pos_embed, logit_scale): the torch name is the
        # leaf itself, optionally nested under the same module path
        return [".".join([*modules, leaf])]
    return [f"{base}.{n}" if base else n for n in names]


def _convert_leaf(
    path: tuple[str, ...], template_leaf: jax.ShapeDtypeStruct, value: np.ndarray
) -> np.ndarray:
    """Reshape/transpose one torch tensor into the template leaf's layout."""
    shape = tuple(template_leaf.shape)
    leaf = path[-1]
    if leaf == "kernel":
        if value.ndim != 2:
            raise ValueError(
                f"{'.'.join(path)}: expected a 2-D torch weight, got shape "
                f"{tuple(value.shape)}"
            )
        value = value.T  # [out, in] -> [in, out]
        if value.shape != shape:
            # DenseGeneral: [in, out] -> [in, H, Dh] (q/k/v) or
            # [H*Dh, out] -> [H, Dh, out] (attention out projection)
            if int(np.prod(value.shape)) != int(np.prod(shape)):
                raise ValueError(
                    f"{'.'.join(path)}: torch weight {tuple(value.T.shape)} "
                    f"does not match template kernel {shape}"
                )
            value = value.reshape(shape)
    elif value.shape != shape:
        if int(np.prod(value.shape)) != int(np.prod(shape)):
            raise ValueError(
                f"{'.'.join(path)}: torch tensor {tuple(value.shape)} does "
                f"not match template {shape}"
            )
        value = value.reshape(shape)  # q/k/v bias [embed] -> [H, Dh]
    return value.astype(template_leaf.dtype)


def params_from_torch(
    template: Any,
    state_dict: Mapping[str, Any],
    *,
    rename: Mapping[str, str] | Callable[[str], str] | None = None,
    strict: bool = True,
) -> Any:
    """Convert a torch ``state_dict`` into the layout of ``template``.

    ``template``: a Flax parameter (sub)tree — real arrays or
    ``jax.ShapeDtypeStruct`` leaves (e.g. from ``jax.eval_shape`` on
    ``model.init``) — whose structure defines the output.
    ``rename``: optional torch-key rewrite applied BEFORE matching.
    ``strict``: raise if any non-buffer torch entry goes unconsumed
    (catches silently-dropped weights, the classic porting bug).
    """
    source: dict[str, np.ndarray] = {}
    renamed_from: dict[str, str] = {}
    for torch_key, v in state_dict.items():
        key = _apply_rename(torch_key, rename)
        if key in source:
            # a collapsing rename would silently overwrite a weight —
            # exactly the silent drop `strict` exists to prevent
            raise ValueError(
                f"rename maps both {renamed_from[key]!r} and "
                f"{torch_key!r} to {key!r}"
            )
        source[key] = _to_numpy(v)
        renamed_from[key] = torch_key
    consumed: set[str] = set()

    def convert(path, leaf):
        names = _path_names(path)
        spec = jax.ShapeDtypeStruct(leaf.shape, leaf.dtype)
        for key in _flax_key_candidates(names):
            if key in source:
                consumed.add(key)
                return jnp.asarray(_convert_leaf(names, spec, source[key]))
        raise KeyError(
            f"no torch key for Flax param {'.'.join(names)} (looked for "
            f"{_flax_key_candidates(names)}; state_dict has "
            f"{sorted(source)[:20]}{'...' if len(source) > 20 else ''})"
        )

    out = jax.tree_util.tree_map_with_path(convert, template)

    leftover = [
        k for k in source
        if k not in consumed and not k.endswith(_IGNORED_SUFFIXES)
    ]
    if strict and leftover:
        raise ValueError(
            f"{len(leftover)} torch entries were not consumed: "
            f"{sorted(leftover)[:20]} — pass strict=False to ignore, or fix "
            "the rename map"
        )
    return out


def logit_scale_from_torch(
    criterion_state_dict: Mapping[str, Any], *, key: str = "logit_scale"
) -> jax.Array:
    """The reference criterion's scalar ``logit_scale`` (loss.py:52)."""
    if key not in criterion_state_dict:
        raise KeyError(
            f"{key!r} not in criterion state_dict "
            f"(has {sorted(criterion_state_dict)})"
        )
    value = _to_numpy(criterion_state_dict[key]).reshape(())
    return jnp.asarray(value, jnp.float32)


def dual_encoder_params_from_torch(
    params_template: Any,
    video_state_dict: Mapping[str, Any],
    text_state_dict: Mapping[str, Any],
    criterion_state_dict: Mapping[str, Any] | None = None,
    *,
    video_rename=None,
    text_rename=None,
    strict: bool = True,
) -> Any:
    """Build the full trainer param tree ``{video_tower, text_tower,
    logit_scale}`` from per-tower torch state_dicts.

    ``params_template``: ``TrainState.params``-shaped tree (e.g. from
    ``Trainer.init_state(...).params``).  Without a criterion state_dict
    the template's own ``logit_scale`` is kept (vestigial by default —
    loss.py:52 never affects the math).
    """
    template = dict(params_template)
    out = {
        "video_tower": params_from_torch(
            template["video_tower"], video_state_dict,
            rename=video_rename, strict=strict,
        ),
        "text_tower": params_from_torch(
            template["text_tower"], text_state_dict,
            rename=text_rename, strict=strict,
        ),
    }
    for k, v in template.items():
        if k not in out and k != "logit_scale":
            raise KeyError(
                f"template has an unexpected top-level entry {k!r}; "
                "dual_encoder_params_from_torch handles the standard "
                "{video_tower, text_tower, logit_scale} layout"
            )
    if criterion_state_dict is not None:
        out["logit_scale"] = logit_scale_from_torch(criterion_state_dict)
    elif "logit_scale" in template:
        out["logit_scale"] = jnp.asarray(template["logit_scale"])
    return out


def state_dict_from_params(
    params: Any,
    *,
    rename: Mapping[str, str] | Callable[[str], str] | None = None,
) -> dict[str, np.ndarray]:
    """The REVERSE conversion: a Flax parameter (sub)tree → a torch-layout
    ``state_dict`` of numpy arrays (``torch.save``-able after
    ``{k: torch.from_numpy(v) for ...}``) — the migration escape hatch, so
    moving here is a two-way door.

    Inverts :func:`params_from_torch` exactly: ``Dense`` kernels
    transpose back to ``[out, in]``; ``DenseGeneral`` attention kernels
    ``[E, H, Dh]`` / ``[H, Dh, E]`` flatten to ``[E, E]`` Linears (their
    biases to ``[E]``); ``scale`` leaves become ``weight``.  Keys are the
    structural Flax paths with the leaf rewritten (``kernel``/``scale`` →
    ``weight``); ``rename`` rewrites them AFTERWARD (a
    ``{flax_prefix: torch_prefix}`` map or a callable), mirroring the
    import direction's knob.  bf16/fp8 params upcast to float32 (numpy
    views of those dtypes have no ``torch.from_numpy`` path).  Round-trip
    is exact: ``params_from_torch(t, state_dict_from_params(p)) == p``
    (pinned in tests/test_torch_import.py).
    """
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    by_names = {_path_names(path): leaf for path, leaf in leaves}

    flat: dict[str, np.ndarray] = {}
    emitted_from: dict[str, str] = {}
    for names, leaf in by_names.items():
        *modules, leaf_name = names
        value = np.asarray(jax.device_get(leaf))
        if value.dtype.kind == "V" or "bfloat16" in str(value.dtype):
            # ml_dtypes bf16/fp8 have no torch.from_numpy path; upcast
            # (mirrors _to_numpy's handling in the import direction)
            value = value.astype(np.float32)
        if leaf_name == "kernel":
            if value.ndim == 2:
                value = value.T  # [in, out] -> [out, in]
            elif value.ndim == 3:
                # flax MultiHeadDotProductAttention: the out projection
                # groups its LEADING head axes as the input ([H, Dh, E]
                # -> [H*Dh, E]); q/k/v group their TRAILING head axes as
                # the output ([E, H, Dh] -> [E, H*Dh]).  Which one this
                # kernel is cannot be read off the shape (E == H*Dh for
                # the usual square attention), so consult the SIBLING
                # bias: q/k/v biases are [H, Dh], the out bias is [E]
                # (the flax module guarantees this).  Biasless modules
                # fall back to flax's out-projection module name.
                bias = by_names.get((*modules, "bias"))
                if bias is not None:
                    is_out_proj = np.ndim(bias) == 1
                else:
                    is_out_proj = bool(modules) and str(modules[-1]) == "out"
                if is_out_proj:
                    value = value.reshape(-1, value.shape[-1]).T
                else:
                    value = value.reshape(value.shape[0], -1).T
            else:
                raise ValueError(
                    f"{'.'.join(map(str, names))}: cannot express a "
                    f"{value.ndim}-D kernel as a torch Linear"
                )
            torch_leaf = "weight"
        elif leaf_name == "scale":
            torch_leaf = "weight"  # LayerNorm
        else:
            torch_leaf = str(leaf_name)
            if torch_leaf == "bias" and value.ndim > 1:
                value = value.reshape(-1)  # q/k/v bias [H, Dh] -> [E]
        key = (
            ".".join([*map(str, modules), torch_leaf])
            if modules else torch_leaf
        )
        rk = _apply_rename(key, rename)
        src = ".".join(map(str, names))
        if rk in flat:
            raise ValueError(
                f"params {emitted_from[rk]!r} and {src!r} both map to the "
                f"torch key {rk!r}"
                + (" — fix the rename map" if rename is not None else "")
            )
        # writable + contiguous so the documented torch.from_numpy recipe
        # works without warnings (device_get views are read-only)
        flat[rk] = np.ascontiguousarray(value)
        emitted_from[rk] = src
    return flat
