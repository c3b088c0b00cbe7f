"""PyTorch → Flax weight import (utils.torch_import).

The migration on-ramp: torch towers (the reference ships none — users
wrote their own around /root/reference/trainer/loss.py) convert into
crossclr_tpu tower params with EXACT forward equality, pinned here
against live torch mirrors of both tower kinds, plus the reference
criterion's ``logit_scale`` (loss.py:52) from the real file.
"""

import sys

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from crossclr_tpu.models import DualEncoder, MLPTower, TowerConfig, TransformerTower
from crossclr_tpu.utils.torch_import import (
    dual_encoder_params_from_torch,
    logit_scale_from_torch,
    params_from_torch,
)

REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# torch mirrors of the Flax towers (fp32, tanh GELU, LayerNorm eps=1e-6)
# ---------------------------------------------------------------------------


class TorchMLPTower(tnn.Module):
    """Mirror of models.MLPTower with state_dict keys matching the Flax
    module names (skip/fc1/fc2[_i], norm)."""

    def __init__(self, cfg: TowerConfig):
        super().__init__()
        self.cfg = cfg
        in_dim = cfg.input_dim
        for layer in range(max(cfg.num_layers, 1)):
            suffix = "" if layer == 0 else f"_{layer}"
            setattr(self, f"skip{suffix}", tnn.Linear(in_dim, cfg.embed_dim))
            setattr(self, f"fc1{suffix}", tnn.Linear(in_dim, cfg.hidden_dim))
            setattr(self, f"fc2{suffix}", tnn.Linear(cfg.hidden_dim, cfg.embed_dim))
            in_dim = cfg.embed_dim
        self.norm = tnn.LayerNorm(cfg.embed_dim, eps=1e-6)

    def forward(self, x):
        h = x
        for layer in range(max(self.cfg.num_layers, 1)):
            suffix = "" if layer == 0 else f"_{layer}"
            skip = getattr(self, f"skip{suffix}")(h)
            y = tF.gelu(getattr(self, f"fc1{suffix}")(h), approximate="tanh")
            y = getattr(self, f"fc2{suffix}")(y)
            h = skip + y
        return self.norm(h)


class TorchAttention(tnn.Module):
    """q/k/v/out as plain [E, E] Linears — the usual torch layout the
    importer reshapes into Flax DenseGeneral kernels."""

    def __init__(self, embed_dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        for name in ("query", "key", "value", "out"):
            setattr(self, name, tnn.Linear(embed_dim, embed_dim))

    def forward(self, x, mask):
        b, s, e = x.shape
        h, dh = self.num_heads, self.head_dim

        def heads(t):
            return t.view(b, s, h, dh).transpose(1, 2)  # [B, H, S, Dh]

        q = heads(self.query(x)) / dh ** 0.5
        k, v = heads(self.key(x)), heads(self.value(x))
        scores = q @ k.transpose(-1, -2)
        if mask is not None:
            bias = torch.where(
                mask[:, None, None, :] > 0, 0.0, torch.finfo(scores.dtype).min
            )
            scores = scores + bias
        out = tF.softmax(scores, dim=-1) @ v
        out = out.transpose(1, 2).reshape(b, s, e)
        return self.out(out)


class TorchBlock(tnn.Module):
    def __init__(self, cfg: TowerConfig):
        super().__init__()
        setattr(self, "LayerNorm_0", tnn.LayerNorm(cfg.embed_dim, eps=1e-6))
        setattr(
            self,
            "MultiHeadDotProductAttention_0",
            TorchAttention(cfg.embed_dim, cfg.num_heads),
        )
        setattr(self, "LayerNorm_1", tnn.LayerNorm(cfg.embed_dim, eps=1e-6))
        setattr(self, "Dense_0", tnn.Linear(cfg.embed_dim, cfg.hidden_dim))
        setattr(self, "Dense_1", tnn.Linear(cfg.hidden_dim, cfg.embed_dim))

    def forward(self, x, mask):
        y = self.MultiHeadDotProductAttention_0(self.LayerNorm_0(x), mask)
        x = x + y
        y = tF.gelu(self.Dense_0(self.LayerNorm_1(x)), approximate="tanh")
        return x + self.Dense_1(y)


class TorchTransformerTower(tnn.Module):
    """Mirror of models.TransformerTower (learned pos embed, pre-norm
    blocks, masked mean pooling, output projection)."""

    def __init__(self, cfg: TowerConfig):
        super().__init__()
        self.cfg = cfg
        self.input_proj = tnn.Linear(cfg.input_dim, cfg.embed_dim)
        self.pos_embed = tnn.Parameter(
            0.02 * torch.randn(cfg.max_seq_len, cfg.embed_dim)
        )
        for i in range(cfg.num_layers):
            setattr(self, f"block_{i}", TorchBlock(cfg))
        self.final_norm = tnn.LayerNorm(cfg.embed_dim, eps=1e-6)
        self.output_proj = tnn.Linear(cfg.embed_dim, cfg.embed_dim)

    def forward(self, x, mask=None):
        s = x.shape[1]
        h = self.input_proj(x) + self.pos_embed[None, :s, :]
        for i in range(self.cfg.num_layers):
            h = getattr(self, f"block_{i}")(h, mask)
        h = self.final_norm(h)
        if mask is None:
            pooled = h.mean(dim=1)
        else:
            w = mask.float()[:, :, None]
            pooled = (h * w).sum(dim=1) / w.sum(dim=1).clamp(min=1.0)
        return self.output_proj(pooled)


def _np(t):
    return np.asarray(t.detach())


MLP_CFG = TowerConfig(
    kind="mlp", input_dim=24, embed_dim=16, hidden_dim=40, num_layers=2,
    dtype=jnp.float32,
)
TR_CFG = TowerConfig(
    kind="transformer", input_dim=20, embed_dim=16, hidden_dim=48,
    num_layers=2, num_heads=4, max_seq_len=7, dtype=jnp.float32,
)


# ---------------------------------------------------------------------------
# forward equality through the conversion
# ---------------------------------------------------------------------------


def test_mlp_tower_roundtrip(rng):
    torch.manual_seed(0)
    tm = TorchMLPTower(MLP_CFG)
    x = rng.standard_normal((6, MLP_CFG.input_dim)).astype(np.float32)

    flax_tower = MLPTower(MLP_CFG)
    template = jax.eval_shape(
        lambda: flax_tower.init(jax.random.PRNGKey(0), jnp.zeros_like(x))
    )["params"]
    params = params_from_torch(template, tm.state_dict())

    got = flax_tower.apply({"params": params}, jnp.asarray(x))
    want = _np(tm(torch.from_numpy(x)))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("masked", [False, True])
def test_transformer_tower_roundtrip(rng, masked):
    torch.manual_seed(1)
    tm = TorchTransformerTower(TR_CFG)
    b, s = 5, TR_CFG.max_seq_len
    x = rng.standard_normal((b, s, TR_CFG.input_dim)).astype(np.float32)
    mask = None
    if masked:
        lengths = rng.integers(1, s + 1, size=b)
        mask = (np.arange(s)[None, :] < lengths[:, None]).astype(np.float32)

    flax_tower = TransformerTower(TR_CFG)
    template = jax.eval_shape(
        lambda: flax_tower.init(
            jax.random.PRNGKey(0), jnp.zeros_like(x),
            None if mask is None else jnp.zeros_like(mask),
        )
    )["params"]
    params = params_from_torch(template, tm.state_dict())

    got = flax_tower.apply(
        {"params": params}, jnp.asarray(x),
        None if mask is None else jnp.asarray(mask),
    )
    want = _np(tm(
        torch.from_numpy(x),
        None if mask is None else torch.from_numpy(mask),
    ))
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5, rtol=1e-4)


def test_rename_map_natural_torch_names(rng):
    """A tower with idiomatic torch naming converts via a rename map and
    produces the identical param tree."""
    torch.manual_seed(0)
    tm = TorchMLPTower(MLP_CFG)
    natural = {
        k.replace("skip", "proj_skip").replace("fc", "mlp.fc"): v
        for k, v in tm.state_dict().items()
    }

    def rename(key):
        return key.replace("proj_skip", "skip").replace("mlp.fc", "fc")

    template = jax.eval_shape(
        lambda: MLPTower(MLP_CFG).init(
            jax.random.PRNGKey(0), jnp.zeros((1, MLP_CFG.input_dim))
        )
    )["params"]
    direct = params_from_torch(template, tm.state_dict())
    renamed = params_from_torch(template, natural, rename=rename)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        direct, renamed,
    )


# ---------------------------------------------------------------------------
# error contracts
# ---------------------------------------------------------------------------


def _mlp_template():
    return jax.eval_shape(
        lambda: MLPTower(MLP_CFG).init(
            jax.random.PRNGKey(0), jnp.zeros((1, MLP_CFG.input_dim))
        )
    )["params"]


def test_missing_key_raises():
    torch.manual_seed(0)
    sd = TorchMLPTower(MLP_CFG).state_dict()
    del sd["fc1.weight"]
    with pytest.raises(KeyError, match="fc1.kernel"):
        params_from_torch(_mlp_template(), sd)


def test_strict_leftover_raises():
    torch.manual_seed(0)
    sd = dict(TorchMLPTower(MLP_CFG).state_dict())
    sd["extra.weight"] = torch.zeros(3, 3)
    with pytest.raises(ValueError, match="not consumed"):
        params_from_torch(_mlp_template(), sd)
    params_from_torch(_mlp_template(), sd, strict=False)  # tolerated


def test_shape_mismatch_raises():
    torch.manual_seed(0)
    sd = dict(TorchMLPTower(MLP_CFG).state_dict())
    sd["fc1.weight"] = torch.zeros(MLP_CFG.hidden_dim + 1, MLP_CFG.input_dim)
    with pytest.raises(ValueError, match="does not match"):
        params_from_torch(_mlp_template(), sd)


def test_buffers_ignored():
    torch.manual_seed(0)
    sd = dict(TorchMLPTower(MLP_CFG).state_dict())
    sd["bn.num_batches_tracked"] = torch.zeros((), dtype=torch.long)
    params_from_torch(_mlp_template(), sd)  # strict, but buffers pass


# ---------------------------------------------------------------------------
# the reference criterion's logit_scale (loss.py:52) from the REAL file
# ---------------------------------------------------------------------------


def test_logit_scale_from_real_reference_criterion():
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from trainer.loss import CrossCLR_onlyIntraModality
    finally:
        sys.path.remove(REFERENCE_ROOT)
    crit = CrossCLR_onlyIntraModality(temperature=0.05, negative_weight=0.7)
    with torch.no_grad():
        crit.logit_scale.mul_(0.37)
    got = logit_scale_from_torch(crit.state_dict())
    assert got.dtype == jnp.float32 and got.shape == ()
    np.testing.assert_allclose(float(got), 0.37, rtol=1e-6)
    with pytest.raises(KeyError, match="logit_scale"):
        logit_scale_from_torch({})


# ---------------------------------------------------------------------------
# full dual-encoder import + CLI script + checkpoint roundtrip
# ---------------------------------------------------------------------------


def test_import_cli_roundtrip(tmp_path, rng):
    torch.manual_seed(2)
    video_cfg = MLP_CFG
    text_cfg = TowerConfig(
        kind="mlp", input_dim=18, embed_dim=16, hidden_dim=32, num_layers=1,
        dtype=jnp.float32,
    )
    tv, tt = TorchMLPTower(video_cfg), TorchMLPTower(text_cfg)
    flat = {f"video_tower.{k}": v for k, v in tv.state_dict().items()}
    flat.update({f"text_tower.{k}": v for k, v in tt.state_dict().items()})
    flat["criterion.logit_scale"] = torch.full([], 0.25)
    pt_path = tmp_path / "towers.pt"
    torch.save(flat, pt_path)

    from crossclr_tpu.utils.config import DataConfig, ExperimentConfig, save_config
    cfg = ExperimentConfig(
        video_tower=video_cfg, text_tower=text_cfg,
        data=DataConfig(
            num_pairs=32, batch_size=8,
            video_dim=video_cfg.input_dim, text_dim=text_cfg.input_dim,
        ),
    )
    cfg_path = tmp_path / "cfg.json"
    save_config(cfg, cfg_path)

    sys.path.insert(0, "/root/repo/scripts")
    try:
        import import_torch_checkpoint
    finally:
        sys.path.remove("/root/repo/scripts")
    out_dir = tmp_path / "ckpt"
    assert import_torch_checkpoint.main([
        "--config", str(cfg_path), "--torch-ckpt", str(pt_path),
        "--output", str(out_dir), "--criterion-prefix", "criterion.",
    ]) == 0

    # the eval/serve entry restores it and encodes identically to torch
    from crossclr_tpu.training import CheckpointManager, Trainer
    trainer = Trainer(video_cfg, text_cfg, cfg.train)
    video = rng.standard_normal((8, video_cfg.input_dim)).astype(np.float32)
    text = rng.standard_normal((8, text_cfg.input_dim)).astype(np.float32)
    state = trainer.init_state(jnp.asarray(video), jnp.asarray(text))
    state = CheckpointManager(out_dir).restore(state, step=0)

    np.testing.assert_allclose(float(state.params["logit_scale"]), 0.25, rtol=1e-6)
    v_emb, t_emb = trainer.encode(
        state, {"video": jnp.asarray(video), "text": jnp.asarray(text)}
    )
    model = DualEncoder(video_cfg, text_cfg)
    np.testing.assert_allclose(
        np.asarray(v_emb), _np(tv(torch.from_numpy(video))), atol=2e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(t_emb), _np(tt(torch.from_numpy(text))), atol=2e-5, rtol=1e-5
    )


def test_dual_encoder_params_template_passthrough(rng):
    """Without a criterion state_dict the template's logit_scale is kept."""
    torch.manual_seed(3)
    tv, tt = TorchMLPTower(MLP_CFG), TorchMLPTower(MLP_CFG)
    model = DualEncoder(MLP_CFG, MLP_CFG)
    x = jnp.zeros((2, MLP_CFG.input_dim))
    template = dict(model.init(jax.random.PRNGKey(0), x, x)["params"])
    template["logit_scale"] = jnp.asarray(0.5, jnp.float32)
    params = dual_encoder_params_from_torch(
        template, tv.state_dict(), tt.state_dict()
    )
    assert float(params["logit_scale"]) == 0.5


def test_rename_collision_raises():
    """A rename that collapses two torch keys to one name must raise, not
    silently overwrite a weight (the silent drop `strict` exists for)."""
    torch.manual_seed(0)
    sd = dict(TorchMLPTower(MLP_CFG).state_dict())
    sd["shadow_fc1.weight"] = torch.zeros_like(sd["fc1.weight"])
    with pytest.raises(ValueError, match="maps both"):
        params_from_torch(
            _mlp_template(), sd, rename={"shadow_fc1.": "fc1."}
        )


def test_bfloat16_state_dict_imports():
    """bf16-trained torch checkpoints convert (tensor.numpy() has no
    bf16 path; the importer upcasts) and match the fp32 conversion to
    bf16 rounding."""
    torch.manual_seed(0)
    tower = TorchMLPTower(MLP_CFG)
    got = params_from_torch(
        _mlp_template(),
        {k: v.bfloat16() for k, v in tower.state_dict().items()},
    )
    want = params_from_torch(_mlp_template(), tower.state_dict())
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-2, atol=1e-2
        )


def test_import_cli_criterion_key_and_no_data(tmp_path):
    """--criterion-key works without --video-key/--text-key, and the
    conversion never touches the training data (a files-source config
    with nonexistent paths still converts)."""
    torch.manual_seed(3)
    text_cfg = TowerConfig(
        kind="mlp", input_dim=18, embed_dim=16, hidden_dim=32, num_layers=1,
        dtype=jnp.float32,
    )
    tv, tt = TorchMLPTower(MLP_CFG), TorchMLPTower(text_cfg)
    blob = {f"video_tower.{k}": v for k, v in tv.state_dict().items()}
    blob.update({f"text_tower.{k}": v for k, v in tt.state_dict().items()})
    blob["criterion"] = {"logit_scale": torch.full([], 0.75)}
    pt_path = tmp_path / "mixed.pt"
    torch.save(blob, pt_path)

    from crossclr_tpu.utils.config import (
        DataConfig, ExperimentConfig, save_config,
    )
    cfg = ExperimentConfig(
        video_tower=MLP_CFG, text_tower=text_cfg,
        data=DataConfig(
            source="files",
            video_path=str(tmp_path / "missing_v.npy"),
            text_path=str(tmp_path / "missing_t.npy"),
        ),
    )
    cfg_path = tmp_path / "cfg.json"
    save_config(cfg, cfg_path)

    sys.path.insert(0, "/root/repo/scripts")
    try:
        import import_torch_checkpoint
    finally:
        sys.path.remove("/root/repo/scripts")
    out_dir = tmp_path / "ckpt"
    assert import_torch_checkpoint.main([
        "--config", str(cfg_path), "--torch-ckpt", str(pt_path),
        "--output", str(out_dir), "--criterion-key", "criterion",
    ]) == 0

    from crossclr_tpu.training import CheckpointManager, Trainer
    trainer = Trainer(MLP_CFG, text_cfg, cfg.train)
    state = trainer.init_state(
        jnp.zeros((2, MLP_CFG.input_dim)), jnp.zeros((2, 18))
    )
    mgr = CheckpointManager(str(out_dir))
    state = mgr.restore(state)
    mgr.close()
    # the nested-key criterion state landed
    np.testing.assert_allclose(
        float(state.params["logit_scale"]), 0.75, rtol=1e-6
    )

    # both criterion selectors at once is an error
    with pytest.raises(SystemExit, match="not both"):
        import_torch_checkpoint.main([
            "--config", str(cfg_path), "--torch-ckpt", str(pt_path),
            "--output", str(tmp_path / "x"),
            "--criterion-key", "criterion", "--criterion-prefix", "c.",
        ])


def test_reverse_export_roundtrips_exactly(rng):
    """state_dict_from_params inverts params_from_torch bit-exactly for
    both tower kinds (transposes/reshapes only, no arithmetic)."""
    from crossclr_tpu.utils.torch_import import state_dict_from_params

    torch.manual_seed(4)
    for mirror, cfg, flax_cls, example in (
        (TorchMLPTower, MLP_CFG, MLPTower,
         (jnp.zeros((1, MLP_CFG.input_dim)),)),
        (TorchTransformerTower, TR_CFG, TransformerTower,
         (jnp.zeros((1, TR_CFG.max_seq_len, TR_CFG.input_dim)), None)),
    ):
        tm = mirror(cfg)
        sd = {k: _np(v) for k, v in tm.state_dict().items()}
        template = jax.eval_shape(
            lambda flax_cls=flax_cls, cfg=cfg, example=example:
            flax_cls(cfg).init(jax.random.PRNGKey(0), *example)
        )["params"]
        params = params_from_torch(template, sd)
        back = state_dict_from_params(params)
        assert sorted(back) == sorted(sd)
        for k in sd:
            np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_reverse_export_runs_in_torch(rng):
    """A FLAX-initialized transformer tower exports to a state_dict a
    live torch mirror loads strictly, and the two forwards agree — the
    migration is a two-way door."""
    from crossclr_tpu.utils.torch_import import state_dict_from_params

    b, s = 4, TR_CFG.max_seq_len
    x = rng.standard_normal((b, s, TR_CFG.input_dim)).astype(np.float32)
    flax_tower = TransformerTower(TR_CFG)
    params = flax_tower.init(
        jax.random.PRNGKey(7), jnp.asarray(x), None
    )["params"]

    sd = state_dict_from_params(params)
    tm = TorchTransformerTower(TR_CFG)
    tm.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    got = _np(tm(torch.from_numpy(x)))
    want = np.asarray(flax_tower.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)

    # rename knob mirrors the import direction
    renamed = state_dict_from_params(
        params, rename={"input_proj.": "stem."}
    )
    assert "stem.weight" in renamed and "input_proj.weight" not in renamed


def test_reverse_export_bf16_and_from_numpy():
    """bf16 Flax params export as fp32 numpy the documented
    torch.from_numpy recipe accepts (no ml_dtypes leak, no read-only
    warning)."""
    from crossclr_tpu.utils.torch_import import state_dict_from_params

    params = {
        "fc1": {
            "kernel": jnp.ones((4, 3), jnp.bfloat16),
            "bias": jnp.zeros((3,), jnp.bfloat16),
        }
    }
    sd = state_dict_from_params(params)
    assert sd["fc1.weight"].dtype == np.float32
    assert sd["fc1.weight"].shape == (3, 4)
    t = {k: torch.from_numpy(v) for k, v in sd.items()}  # must not raise
    assert t["fc1.bias"].shape == (3,)


def test_reverse_export_out_projection_by_sibling_bias():
    """An out-projection kernel under a NON-'out' module name flattens
    correctly: the [E] sibling bias (vs q/k/v's [H, Dh]) disambiguates,
    so the roundtrip holds for renamed attention modules too."""
    from crossclr_tpu.utils.torch_import import state_dict_from_params

    h, dh, e = 2, 3, 6
    rng = np.random.default_rng(0)
    params = {
        "o_proj": {  # out-projection layout, arbitrary name
            "kernel": jnp.asarray(rng.standard_normal((h, dh, e)), jnp.float32),
            "bias": jnp.asarray(rng.standard_normal((e,)), jnp.float32),
        },
        "q_proj": {  # q/k/v layout, arbitrary name
            "kernel": jnp.asarray(rng.standard_normal((e, h, dh)), jnp.float32),
            "bias": jnp.asarray(rng.standard_normal((h, dh)), jnp.float32),
        },
    }
    sd = state_dict_from_params(params)
    assert sd["o_proj.weight"].shape == (e, h * dh)
    assert sd["q_proj.weight"].shape == (h * dh, e)
    back = params_from_torch(
        jax.tree.map(lambda v: jax.ShapeDtypeStruct(v.shape, v.dtype), params),
        sd,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        back, params,
    )


def test_reverse_export_structural_collision_names_both():
    """A structural key collision (no rename involved) reports BOTH
    colliding param paths and does not blame a rename map."""
    from crossclr_tpu.utils.torch_import import state_dict_from_params

    params = {
        "m": {
            "kernel": jnp.ones((2, 2), jnp.float32),  # -> m.weight
            "weight": jnp.ones((2,), jnp.float32),    # -> m.weight too
        }
    }
    with pytest.raises(ValueError, match=r"m\.kernel.*m\.weight|m\.weight.*m\.kernel"):
        state_dict_from_params(params)
