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


# --------------------------------------------------- TpuBatchNorm parity

def _bn_pair(dtype):
    import flax.linen as nn
    from cartseg_tpu.models.norm import TpuBatchNorm
    ours = TpuBatchNorm(use_running_average=False, momentum=0.9,
                        epsilon=1e-5, dtype=dtype)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9,
                       epsilon=1e-5, dtype=dtype)
    return ours, ref


@pytest.mark.parametrize("shape", [(8, 16, 16, 16),   # pallas lane
                                   (2, 5, 7, 3)])     # xla fallback lane
def test_tpu_batch_norm_forward_and_stats(rng, shape):
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32) * 2 + 0.5)
    ours, ref = _bn_pair(jnp.float32)
    vo = ours.init(jax.random.key(0), x)
    vr = ref.init(jax.random.key(0), x)
    yo, mo = ours.apply(vo, x, mutable=["batch_stats"])
    yr, mr = ref.apply(vr, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yo), np.asarray(yr),
                               rtol=1e-5, atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(mo["batch_stats"][k]),
                                   np.asarray(mr["batch_stats"][k]),
                                   rtol=1e-5, atol=1e-6)
    # eval mode on the updated stats
    vo2 = {**vo, "batch_stats": mo["batch_stats"]}
    vr2 = {**vr, "batch_stats": mr["batch_stats"]}
    ours_e = type(ours)(use_running_average=True, momentum=0.9,
                        epsilon=1e-5, dtype=jnp.float32)
    import flax.linen as nn
    ref_e = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours_e.apply(vo2, x)),
                               np.asarray(ref_e.apply(vr2, x)),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", [(8, 16, 16, 16), (2, 5, 7, 3)])
def test_tpu_batch_norm_grads_match_autodiff(rng, shape):
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    ours, ref = _bn_pair(jnp.float32)
    vo = ours.init(jax.random.key(1), x)
    # non-trivial scale/bias so dgamma/dbeta interact with the stats
    vo = jax.tree_util.tree_map(lambda p: p, vo)
    params = {"scale": jnp.asarray(rng.normal(size=shape[-1:]),
                                   jnp.float32) + 1.5,
              "bias": jnp.asarray(rng.normal(size=shape[-1:]), jnp.float32)}
    variables = {"params": params,
                 "batch_stats": vo["batch_stats"]}

    def loss(mod, xx, pp):
        y, _ = mod.apply({"params": pp["params"],
                          "batch_stats": pp["batch_stats"]}, xx,
                         mutable=["batch_stats"])
        return jnp.sum(y * w)

    go = jax.grad(loss, argnums=(1, 2))(ours, x, variables)
    gr = jax.grad(loss, argnums=(1, 2))(ref, x, variables)
    np.testing.assert_allclose(np.asarray(go[0]), np.asarray(gr[0]),
                               rtol=2e-4, atol=2e-5)
    for k in ("scale", "bias"):
        np.testing.assert_allclose(np.asarray(go[1]["params"][k]),
                                   np.asarray(gr[1]["params"][k]),
                                   rtol=2e-4, atol=2e-4)


def test_tpu_batch_norm_bf16_close_to_flax(rng):
    x = jnp.asarray(rng.normal(size=(8, 8, 16, 32)).astype(np.float32))
    ours, ref = _bn_pair(jnp.bfloat16)
    v = ours.init(jax.random.key(2), x)
    yo, _ = ours.apply(v, x, mutable=["batch_stats"])
    yr, _ = ref.apply(v, x, mutable=["batch_stats"])
    assert yo.dtype == jnp.bfloat16 and yr.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(yo, np.float32),
                               np.asarray(yr, np.float32),
                               rtol=0.05, atol=0.05)


def test_channel_sums_oracle(rng):
    from cartseg_tpu.ops.pallas.channel_sums import (
        channel_sums_pallas, channel_sums_xla, supported)
    a = jnp.asarray(rng.normal(size=(4, 6, 8, 16)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(4, 6, 8, 16)).astype(np.float32))
    assert supported(a.shape)
    sa_p, sab_p = channel_sums_pallas(a, b)
    sa_x, sab_x = channel_sums_xla(a, b)
    np.testing.assert_allclose(np.asarray(sa_p), np.asarray(sa_x),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sab_p), np.asarray(sab_x),
                               rtol=1e-5, atol=1e-4)
    assert not supported((2, 5, 7, 3))


def test_upconv2x_custom_vjp_matches_autodiff(rng):
    """The fused decoder's transposed-conv custom VJP (reverse-free
    gradient convs) vs jax autodiff of the same primitive."""
    from cartseg_tpu.models.unet import _upconv2x

    def ref(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    for (B, H, W, Ci, Co) in [(2, 8, 8, 5, 7), (2, 16, 8, 4, 6)]:
        x = jnp.asarray(rng.normal(size=(B, H, W, Ci)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(4, 4, Ci, Co)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(B, 2 * H, 2 * W, Co)), jnp.float32)
        np.testing.assert_allclose(np.asarray(_upconv2x(x, k)),
                                   np.asarray(ref(x, k)), atol=1e-5)
        go = jax.grad(lambda x, k: jnp.sum(_upconv2x(x, k) * w),
                      argnums=(0, 1))(x, k)
        gr = jax.grad(lambda x, k: jnp.sum(ref(x, k) * w),
                      argnums=(0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(go[0]), np.asarray(gr[0]),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(go[1]), np.asarray(gr[1]),
                                   atol=1e-3)
