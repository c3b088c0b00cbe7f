"""End-to-end verify: crossclr_tpu on the REAL TPU vs the actual PyTorch
reference implementation (``/root/reference/trainer/loss.py:44-113``).

The in-suite counterpart is ``tests/test_reference_file_parity.py`` (CPU);
this driver runs the same ground truth against the LIVE TPU backend:
jnp criterion, both fused Pallas tiers, and the rect global kernel with a
traced temperature.  The reference hard-codes ``.cuda()`` (loss.py:66,
103-104), so it is imported with that stubbed.

Usage (from the repo root, with a TPU visible):
    python scripts/verify_live_tpu.py        # prints VERDICT: PASS/FAIL
"""
import sys

import numpy as np
import torch

torch.Tensor.cuda = lambda self, *a, **k: self  # reference hard-codes .cuda()
sys.path.insert(0, "/root/reference")
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
from trainer.loss import CrossCLR_onlyIntraModality as RefCriterion  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from crossclr_tpu.losses import CrossCLR_onlyIntraModality  # noqa: E402
from crossclr_tpu.ops import cross_clr_intra_fused  # noqa: E402
from crossclr_tpu.ops.fused_global import fused_lse_rows  # noqa: E402
from crossclr_tpu.losses.functional import l2_normalize  # noqa: E402

assert jax.default_backend() == "tpu", jax.default_backend()
B, D = 256, 512
rng = np.random.default_rng(7)
v_np = rng.standard_normal((B, D)).astype(np.float32)
t_np = rng.standard_normal((B, D)).astype(np.float32)

failures = []


def check(name, got, want, tol):
    err = float(np.max(np.abs(np.asarray(got) - np.asarray(want))))
    ok = err <= tol
    print(f"{'PASS' if ok else 'FAIL'} {name}: max|Δ|={err:.3g} (tol {tol})")
    if not ok:
        failures.append(name)


# ---- ground truth: the actual reference, forward + input grads
vt = torch.tensor(v_np, requires_grad=True)
tt = torch.tensor(t_np, requires_grad=True)
ref = RefCriterion(temperature=0.03, negative_weight=0.8)
loss_ref = ref(vt, tt)
loss_ref.backward()
ref_loss = float(loss_ref)
ref_gv, ref_gt = vt.grad.numpy(), tt.grad.numpy()

# ---- jnp criterion on TPU
crit = CrossCLR_onlyIntraModality(temperature=0.03, negative_weight=0.8)
jit_loss = jax.jit(lambda v, t: crit(v, t))
jit_grad = jax.jit(jax.grad(lambda v, t: crit(v, t), argnums=(0, 1)))
v_j, t_j = jnp.asarray(v_np), jnp.asarray(t_np)
check("criterion fwd vs reference", jit_loss(v_j, t_j), ref_loss, 5e-5)
gv, gt = jit_grad(v_j, t_j)
check("criterion d/dv vs reference", gv, ref_gv, 1e-6)
check("criterion d/dt vs reference", gt, ref_gt, 1e-6)

# ---- fused Pallas paths on TPU (highest + default tiers)
for tier, ftol, gtol in (("highest", 5e-5, 1e-6), ("default", 5e-2, 5e-4)):
    f = jax.jit(lambda v, t, tier=tier: cross_clr_intra_fused(v, t, precision=tier))
    g = jax.jit(jax.grad(
        lambda v, t, tier=tier: cross_clr_intra_fused(v, t, precision=tier),
        argnums=(0, 1),
    ))
    check(f"fused[{tier}] fwd vs reference", f(v_j, t_j), ref_loss, ftol)
    fgv, fgt = g(v_j, t_j)
    check(f"fused[{tier}] d/dv vs reference", fgv, ref_gv, gtol)
    check(f"fused[{tier}] d/dt vs reference", fgt, ref_gt, gtol)

# ---- rect global kernel with TRACED temperature on TPU: whole-batch rows
# (offset 0, candidates == batch) must reproduce the reference loss, and
# dτ must match autodiff of the jnp formulation
v_n, t_n = l2_normalize(v_j, 1), l2_normalize(t_j, 1)


def rows_loss(tau):
    lse_v = fused_lse_rows(v_n, v_n, t_n, jnp.zeros(()), temperature=tau)
    lse_t = fused_lse_rows(t_n, t_n, v_n, jnp.zeros(()), temperature=tau)
    pos = jnp.sum(v_n * t_n, axis=1, keepdims=True) / tau
    return (jnp.mean(lse_v - pos) + jnp.mean(lse_t - pos)) / 2


def ref_rows_loss(tau):
    hp = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
    eye = jnp.eye(B, dtype=bool)
    out = 0.0
    for a, o in ((v_n, t_n), (t_n, v_n)):
        inter = hp(a, o.T) / tau
        intra = jnp.where(eye, 0.0, 0.8 * hp(a, a.T) / tau)
        lse = jax.scipy.special.logsumexp(
            jnp.concatenate([inter, intra], 1), axis=1
        )
        out = out + jnp.mean(lse - jnp.diag(inter))
    return out / 2


tau0 = jnp.asarray(0.03, jnp.float32)
got_l, got_d = jax.jit(jax.value_and_grad(rows_loss))(tau0)
want_l, want_d = jax.jit(jax.value_and_grad(ref_rows_loss))(tau0)
check("rect-kernel traced-tau fwd vs reference", got_l, ref_loss, 5e-5)
check("rect-kernel d/dtau vs autodiff", got_d, want_d, abs(float(want_d)) * 2e-3)

print("VERDICT:", "FAIL " + ",".join(failures) if failures else "PASS")
sys.exit(1 if failures else 0)
