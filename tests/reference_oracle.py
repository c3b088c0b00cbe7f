"""CPU torch oracle for the reference loss semantics.

This is NOT a copy of ``/root/reference/trainer/loss.py`` — that file is
CUDA-only (unconditional ``.cuda()`` at loss.py:66,103-104) and its
``MaxMargin_coot`` cannot even be instantiated (NameError, loss.py:24).
Instead this module re-implements the *behavioral spec* documented in
SURVEY.md §2.2 step by step on CPU, preserving the two load-bearing quirks:

1. the intra-modal diagonal is ZEROED (multiplied by ``1−I``), not excluded,
   so each softmax denominator carries a spurious ``exp(0)=1`` term
   (loss.py:95-97);
2. the masks are float64 (the reference builds them via ``np.eye`` →
   ``torch.from_numpy``), which promotes the whole softmax tail to float64
   even for fp32 inputs (loss.py:96-109).

The oracle is the ground truth the JAX implementations are tested against
(BASELINE.json config 1: numerical parity on random [256, 512] features).
"""

import torch


def oracle_crossclr_intra(
    video: torch.Tensor,
    text: torch.Tensor,
    temperature: float = 0.03,
    negative_weight: float = 0.8,
) -> torch.Tensor:
    b = video.shape[0]
    v = torch.nn.functional.normalize(video, dim=1)
    t = torch.nn.functional.normalize(text, dim=1)

    inter_v = (v @ t.t()) / temperature
    inter_t = (t @ v.t()) / temperature
    intra_v = (v @ v.t()) / temperature
    intra_t = (t @ t.t()) / temperature

    # float64 off-diagonal mask → zeroed diagonal + f64 promotion (quirks 1+2)
    off_diag = 1.0 - torch.eye(b, dtype=torch.float64)
    cand_v = torch.cat([inter_v, negative_weight * (intra_v * off_diag)], dim=1)
    cand_t = torch.cat([inter_t, negative_weight * (intra_t * off_diag)], dim=1)

    pick = torch.cat(
        [torch.eye(b, dtype=torch.float64), torch.zeros(b, b, dtype=torch.float64)],
        dim=1,
    )

    def nll(candidates: torch.Tensor) -> torch.Tensor:
        return -torch.log((torch.softmax(candidates, dim=1) * pick).sum(dim=1))

    return (nll(cand_v).mean() + nll(cand_t).mean()) / 2


def oracle_max_margin(
    im: torch.Tensor, s: torch.Tensor, margin: float = 0.1
) -> torch.Tensor:
    """Intended behavior of ``MaxMargin_coot`` (SURVEY.md §2.1 row 2)."""
    scores = im @ s.t()
    diag = scores.diag()
    cost_s = (margin + scores - diag.unsqueeze(1)).clamp(min=0)
    cost_im = (margin + scores - diag.unsqueeze(0)).clamp(min=0)
    keep = ~(torch.eye(scores.shape[0], dtype=torch.bool))
    total = (cost_s * keep).sum() + (cost_im * keep).sum()
    return total / (im.shape[0] * s.shape[0])
