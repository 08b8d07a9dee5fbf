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


# ------------------------------------------------- fused decoder lane

def test_fused_decoder_equivalence():
    """The transposed-conv decoder (FusedUpsampleConv: up2+conv3x3 ==
    stride-2 transposed 4x4 conv; concat conv == split conv sum) is
    EXACT math over the same params — outputs and grads must match the
    plain lane, and the param pytrees must be identical."""
    plain = build_model("resnet18", fused_decoder=False)
    fused = build_model("resnet18", fused_decoder=True)
    variables = init_model(plain, jax.random.key(0), (1, 64, 64, 3))
    # identical param structure: fused init == plain init shapes
    vf = init_model(fused, jax.random.key(0), (1, 64, 64, 3))
    assert (jax.tree_util.tree_structure(vf["params"])
            == jax.tree_util.tree_structure(variables["params"]))

    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3)),
                    jnp.float32)
    y = jnp.asarray((np.random.default_rng(1).random((2, 64, 64, 1)) > 0.5),
                    jnp.float32)
    o_plain = plain.apply(variables, x, train=False)
    o_fused = fused.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(o_plain), np.asarray(o_fused),
                               atol=2e-4)

    def loss(model, p):
        out, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return jnp.mean((jax.nn.sigmoid(out) - y) ** 2)

    g_plain = jax.grad(lambda p: loss(plain, p))(variables["params"])
    g_fused = jax.grad(lambda p: loss(fused, p))(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-3)


def test_fused_decoder_odd_tail_shapes():
    """512-style pyramids (16->32...) and 96-style (3->6) both hit the
    exact-2x upsample contract."""
    fused = build_model("resnet18", fused_decoder=True)
    variables = init_model(fused, jax.random.key(0), (1, 96, 96, 3))
    out = fused.apply(variables, jnp.zeros((1, 96, 96, 3)), train=False)
    assert out.shape == (1, 96, 96, 1)


def test_unetpp_fused_equivalence():
    """UNet++ fused node lane (FusedUpsampleConv skip_first layout) is
    exact math over identical params vs the plain up2+concat+conv."""
    plain = build_model("resnet18", decoder="unetpp", fused_decoder=False)
    fused = build_model("resnet18", decoder="unetpp", fused_decoder=True)
    variables = init_model(plain, jax.random.key(0), (1, 64, 64, 3))
    vf = init_model(fused, jax.random.key(0), (1, 64, 64, 3))
    assert (jax.tree_util.tree_structure(vf["params"])
            == jax.tree_util.tree_structure(variables["params"]))
    for a, b in zip(jax.tree_util.tree_leaves(vf["params"]),
                    jax.tree_util.tree_leaves(variables["params"])):
        assert a.shape == b.shape

    x = jnp.asarray(np.random.default_rng(2).random((2, 64, 64, 3)),
                    jnp.float32)
    o_plain = plain.apply(variables, x, train=False)
    o_fused = fused.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(o_plain), np.asarray(o_fused),
                               atol=2e-4)


def test_unetpp_deep_supervision():
    """unetpp_ds: aux heads over X[0][j] averaged with the final head
    (UNet++ 'accurate mode'); aux params label as 'head'."""
    model = build_model("resnet18", decoder="unetpp_ds")
    variables = init_model(model, jax.random.key(0), (1, 64, 64, 3))
    assert any(k.startswith("aux_head") for k in variables["params"])
    out = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
    assert out.shape == (2, 64, 64, 1)
    labels = param_groups(variables["params"])
    assert labels["aux_head_1"]["conv"]["kernel"] == "head"
