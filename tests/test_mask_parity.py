"""Mask-level (pixel-flip) parity: torch checkpoint -> converted flax
model must binarize to the SAME masks, up to flips inside the narrow
probability band implied by the measured logit parity (north-star
"bitwise-comparable masks at matched seeds"; VERDICT r2 next #5).

A torch smp-Unet is actually TRAINED for a few steps on synthetic
blobs (so its outputs have a real decision boundary crossing object
edges, unlike random weights whose probs cluster at 0.5), saved in the
reference's checkpoint format (train_bce_dice.py:364-374), converted,
and both inference paths run over a held-out corpus. Every flipped
pixel must lie within |p_torch - t| <= band where band is the measured
max probability deviation; the flip count is reported into
docs/mask_parity.json for PARITY.md.
"""

import json
from pathlib import Path

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from benchmarks.torch_smp import SmpUnetTorch
from cartseg_tpu.models import build_model
from cartseg_tpu.models.torch_import import import_smp_unet

DOCS = Path(__file__).resolve().parent.parent / "docs"


def _blob_batch(rng, n, hw=64):
    """Images whose bright region correlates with the mask — learnable
    in a handful of steps."""
    ys, xs = np.mgrid[:hw, :hw]
    imgs = np.empty((n, 3, hw, hw), np.float32)
    masks = np.empty((n, 1, hw, hw), np.float32)
    for i in range(n):
        cy, cx = rng.uniform(12, hw - 12, 2)
        r = rng.uniform(6, 14)
        m = ((ys - cy) ** 2 + (xs - cx) ** 2 < r * r).astype(np.float32)
        base = rng.normal(0.0, 0.3, (3, hw, hw)).astype(np.float32)
        imgs[i] = base + m[None] * 1.5
        masks[i, 0] = m
    return imgs, masks


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    torch.manual_seed(11)
    model = SmpUnetTorch("resnet34")
    opt = torch.optim.Adam(model.parameters(), lr=2e-3)
    lossf = torch.nn.BCEWithLogitsLoss()
    rng = np.random.default_rng(5)
    model.train()
    for _ in range(20):
        x, y = _blob_batch(rng, 4)
        opt.zero_grad()
        loss = lossf(model(torch.from_numpy(x)), torch.from_numpy(y))
        loss.backward()
        opt.step()
    model.eval()
    p = tmp_path_factory.mktemp("ckpt") / "best.pth"
    # the reference's checkpoint dict format (train_bce_dice.py:364-374)
    torch.save({"epoch": 1, "model_state_dict": model.state_dict(),
                "val_dice": 0.0}, p)
    return model, p


def test_binarized_masks_flip_only_in_logit_parity_band(trained_ckpt):
    tmodel, ckpt_path = trained_ckpt

    sd = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    variables = import_smp_unet(sd["model_state_dict"], "resnet34")
    fmodel = build_model("resnet34")

    rng = np.random.default_rng(17)
    x, _ = _blob_batch(rng, 16)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x)).numpy()
    t_probs = 1.0 / (1.0 + np.exp(-t_logits.astype(np.float64)))

    j_logits = np.asarray(fmodel.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False))
    j_logits = np.transpose(j_logits, (0, 3, 1, 2))
    j_probs = 1.0 / (1.0 + np.exp(-j_logits.astype(np.float64)))

    # logit parity at the converter's proven tolerance
    dlogit = np.abs(j_logits - t_logits).max()
    assert dlogit < 1e-3, dlogit
    dprob = np.abs(j_probs - t_probs).max()

    thr = 0.5
    tm = t_probs > thr
    jm = j_probs > thr
    flips = tm != jm
    n_flips = int(flips.sum())
    total = flips.size

    # the corpus must actually exercise the decision boundary
    assert 0.01 < tm.mean() < 0.9, tm.mean()

    # every flip sits inside the probability band implied by the
    # measured deviation (with 2x slack for the double rounding)
    if n_flips:
        band = np.abs(t_probs - thr) <= 2.0 * max(dprob, 1e-12)
        assert bool(band[flips].all()), (
            f"{(~band[flips]).sum()} flips outside the parity band")

    # and the flip rate itself is tiny
    assert n_flips / total < 1e-3, (n_flips, total)

    DOCS.mkdir(exist_ok=True)
    (DOCS / "mask_parity.json").write_text(json.dumps({
        "encoder": "resnet34", "corpus_px": total,
        "pixel_flips": n_flips, "flip_rate": n_flips / total,
        "max_abs_dlogit": float(dlogit), "max_abs_dprob": float(dprob),
        "threshold": thr,
        "protocol": "20-step torch-trained smp-Unet, reference ckpt "
                    "format, 16x64x64 held-out corpus, eval mode",
    }, indent=1) + "\n")
