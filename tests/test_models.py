"""Model zoo: shape contracts, torch-checkpoint conversion parity
(classic UNet output-equivalence vs a torch reference module;
smp-naming round-trip for resnet34/efficientnet-b0)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from cartseg_tpu.models import (
    build_model, init_model, param_groups,
    ResNetEncoder, EfficientNetEncoder,
)
from cartseg_tpu.models.torch_import import (
    import_classic_unet, import_smp_unet, export_flax_to_torch_naming,
)


# ------------------------------------------------------------- contracts

@pytest.mark.parametrize("enc", ["resnet34", "efficientnet-b0", "classic"])
def test_forward_shapes(enc):
    model = build_model(enc)
    variables = init_model(model, jax.random.key(0), (1, 64, 64, 3))
    x = jnp.zeros((2, 64, 64, 3))
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 64, 64, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_resnet34_stage_channels():
    enc = ResNetEncoder()
    v = enc.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
    feats = enc.apply(v, jnp.zeros((1, 64, 64, 3)), train=False)
    assert [f.shape[-1] for f in feats] == [64, 64, 128, 256, 512]
    assert [f.shape[1] for f in feats] == [32, 16, 8, 4, 2]


def test_effnet_stage_channels():
    enc = EfficientNetEncoder()
    v = enc.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
    feats = enc.apply(v, jnp.zeros((1, 64, 64, 3)), train=False)
    assert [f.shape[-1] for f in feats] == [32, 24, 40, 112, 320]
    assert [f.shape[1] for f in feats] == [32, 16, 8, 4, 2]


def test_param_groups_labels():
    model = build_model("resnet34")
    variables = init_model(model, jax.random.key(0), (1, 32, 32, 3))
    labels = param_groups(variables["params"])
    flat = jax.tree_util.tree_leaves(labels)
    assert set(flat) == {"encoder", "decoder", "head"}


def test_batchnorm_mutable_in_train_mode():
    model = build_model("resnet34")
    variables = init_model(model, jax.random.key(0), (1, 32, 32, 3))
    out, updates = model.apply(
        variables, jnp.ones((2, 32, 32, 3)), train=True,
        mutable=["batch_stats"])
    assert "batch_stats" in updates


# ----------------------------------------------- classic UNet torch parity

class _TDouble(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)

    def forward(self, x):
        return torch.relu(self.conv2(torch.relu(self.conv1(x))))


class _TClassicUNet(tnn.Module):
    """Torch statement of the classic UNet (create_testset.py:40-83)
    with parameter names matching import_classic_unet."""

    def __init__(self, base=16):
        super().__init__()
        ws = [base, base * 2, base * 4, base * 8]
        self.downs = tnn.ModuleList()
        cin = 3
        for w in ws:
            self.downs.append(_TDouble(cin, w))
            cin = w
        self.bottleneck = _TDouble(ws[-1], base * 16)
        self.ups = tnn.ModuleList()
        self.updcs = tnn.ModuleList()
        cin = base * 16
        for w in reversed(ws):
            self.ups.append(tnn.ConvTranspose2d(cin, w, 2, stride=2))
            self.updcs.append(_TDouble(w * 2, w))
            cin = w
        self.head = tnn.Conv2d(ws[0], 1, 1)

    def forward(self, x):
        skips = []
        for d in self.downs:
            x = d(x)
            skips.append(x)
            x = torch.max_pool2d(x, 2)
        x = self.bottleneck(x)
        for i, (up, dc) in enumerate(zip(self.ups, self.updcs)):
            x = up(x)
            x = torch.cat([skips[-(i + 1)], x], dim=1)
            x = dc(x)
        return torch.sigmoid(self.head(x))


def test_classic_unet_matches_torch_with_converted_weights(rng):
    torch.manual_seed(0)
    tmodel = _TClassicUNet(base=16).eval()
    sd = tmodel.state_dict()
    variables = import_classic_unet(sd)

    from cartseg_tpu.models import ClassicUNet
    model = ClassicUNet(base=16)

    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    # fp32 conv reassociation across 23 layers: ~1e-4 drift is expected
    np.testing.assert_allclose(ours, ref, atol=3e-4)


# ------------------------------------------------- smp naming round-trip

@pytest.mark.parametrize("enc", ["resnet34", "efficientnet-b0"])
def test_smp_export_import_roundtrip(enc):
    model = build_model(enc)
    variables = init_model(model, jax.random.key(1), (1, 64, 64, 3))
    sd = export_flax_to_torch_naming(variables, enc)
    # every exported tensor must import back to the identical tree
    back = import_smp_unet(sd, enc)

    flat_a = dict(jax.tree_util.tree_leaves_with_path(variables["params"]))
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back["params"]))
    assert set(map(str, flat_a)) == set(map(str, flat_b))
    for k in flat_a:
        np.testing.assert_allclose(np.asarray(flat_a[k]),
                                   np.asarray(flat_b[k]), atol=1e-6,
                                   err_msg=str(k))
    # batch stats too
    sa = dict(jax.tree_util.tree_leaves_with_path(variables["batch_stats"]))
    sb = dict(jax.tree_util.tree_leaves_with_path(back["batch_stats"]))
    assert set(map(str, sa)) == set(map(str, sb))

    # outputs identical through the converted tree
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(1, 64, 64, 3)).astype(np.float32))
    o1 = np.asarray(model.apply(variables, x, train=False))
    o2 = np.asarray(model.apply(back, x, train=False))
    np.testing.assert_allclose(o1, o2, atol=1e-6)


def test_smp_export_key_format(ruleset=None):
    """Exported keys must look like real smp checkpoints."""
    model = build_model("resnet34")
    variables = init_model(model, jax.random.key(0), (1, 32, 32, 3))
    sd = export_flax_to_torch_naming(variables, "resnet34")
    keys = set(sd)
    assert "encoder.conv1.weight" in keys
    assert "encoder.layer1.0.conv1.weight" in keys
    assert "encoder.layer4.2.bn2.running_var" in keys
    assert "decoder.blocks.0.conv1.0.weight" in keys
    assert "decoder.blocks.4.conv2.1.running_mean" in keys
    assert "segmentation_head.0.weight" in keys
    assert "segmentation_head.0.bias" in keys
    # conv weights are OIHW
    assert sd["encoder.conv1.weight"].shape == (64, 3, 7, 7)


def test_unetpp_forward_shapes():
    model = build_model("resnet18", decoder="unetpp")
    variables = init_model(model, jax.random.key(0), (1, 64, 64, 3))
    out = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
    assert out.shape == (2, 64, 64, 1)
    assert np.isfinite(np.asarray(out)).all()
    labels = param_groups(variables["params"])
    assert set(jax.tree_util.tree_leaves(labels)) == {"encoder", "decoder",
                                                      "head"}
