"""Torch checkpoint interop: convert reference `.pth` state dicts
(smp.Unet with torchvision-resnet34 / timm-efficientnet-b0 encoders,
and the classic UNet) into flax variables, and export back.

This is the Dice-parity bridge (SURVEY.md section 7 hard part #4): a
user can load the reference's trained checkpoints
(`ckpt["model_state_dict"]`, train_bce_dice.py:368-374) into the TPU
models. Tensor layout rules:

  torch Conv2d  [O,I,H,W]  -> flax kernel [H,W,I,O]
  torch depthwise [C,1,H,W] -> flax [H,W,1,C] (feature_group_count=C)
  torch ConvTranspose2d [I,O,H,W] -> flax [H,W,I,O] (spatially flipped:
    torch computes cross-correlation of the gradient, flax ConvTranspose
    convolves, so kernels flip along H,W)
  BatchNorm weight/bias -> scale/bias; running_{mean,var} -> batch_stats
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

import flax
import jax.numpy as jnp


def _conv_w(t):
    return jnp.asarray(np.transpose(np.asarray(t), (2, 3, 1, 0)))


def _convT_w(t):
    w = np.transpose(np.asarray(t), (2, 3, 0, 1))
    return jnp.asarray(w[::-1, ::-1])


def _inv_conv_w(k):
    return np.transpose(np.asarray(k), (3, 2, 0, 1))


def _inv_convT_w(k):
    k = np.asarray(k)[::-1, ::-1]
    return np.transpose(k, (2, 3, 0, 1))


class _TreeBuilder:
    def __init__(self):
        self.params: Dict[str, Any] = {}
        self.stats: Dict[str, Any] = {}

    def conv(self, fpath, sd, tkey, bias=False, transpose=False):
        d = self._at(self.params, fpath)
        d["kernel"] = _convT_w(sd[tkey + ".weight"]) if transpose \
            else _conv_w(sd[tkey + ".weight"])
        if bias:
            d["bias"] = jnp.asarray(np.asarray(sd[tkey + ".bias"]))

    def bn(self, fpath, sd, tkey):
        d = self._at(self.params, fpath)
        d["scale"] = jnp.asarray(np.asarray(sd[tkey + ".weight"]))
        d["bias"] = jnp.asarray(np.asarray(sd[tkey + ".bias"]))
        s = self._at(self.stats, fpath)
        s["mean"] = jnp.asarray(np.asarray(sd[tkey + ".running_mean"]))
        s["var"] = jnp.asarray(np.asarray(sd[tkey + ".running_var"]))

    @staticmethod
    def _at(tree, path):
        d = tree
        for p in path.split("/"):
            d = d.setdefault(p, {})
        return d

    def variables(self):
        return {"params": self.params, "batch_stats": self.stats}


def _strip_prefix(sd, prefix: str = "") -> Dict[str, Any]:
    if not prefix:
        return dict(sd)
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


# --------------------------------------------------------------- resnet

_RESNET34_SIZES = (3, 4, 6, 3)


def _import_resnet_encoder(tb: _TreeBuilder, sd, sizes=_RESNET34_SIZES):
    tb.conv("encoder/conv1", sd, "conv1")
    tb.bn("encoder/bn1", sd, "bn1")
    for li, n in enumerate(sizes):
        for bi in range(n):
            f = f"encoder/layer{li + 1}_{bi}"
            t = f"layer{li + 1}.{bi}"
            tb.conv(f + "/conv1", sd, t + ".conv1")
            tb.bn(f + "/bn1", sd, t + ".bn1")
            tb.conv(f + "/conv2", sd, t + ".conv2")
            tb.bn(f + "/bn2", sd, t + ".bn2")
            if t + ".downsample.0.weight" in sd:
                tb.conv(f + "/downsample_conv", sd, t + ".downsample.0")
                tb.bn(f + "/downsample_bn", sd, t + ".downsample.1")


# ---------------------------------------------------------- efficientnet

_B0_GROUPS = ((1, 1), (6, 2), (6, 2), (6, 3), (6, 3), (6, 4), (6, 1))


def _import_effnet_encoder(tb: _TreeBuilder, sd):
    tb.conv("encoder/stem_conv", sd, "conv_stem")
    tb.bn("encoder/stem_bn", sd, "bn1")
    for gi, (expand, reps) in enumerate(_B0_GROUPS):
        for r in range(reps):
            f = f"encoder/block{gi}_{r}"
            t = f"blocks.{gi}.{r}"
            if expand == 1:
                # timm DepthwiseSeparableConv: conv_dw/bn1, se, conv_pw/bn2
                tb.conv(f + "/dw_conv", sd, t + ".conv_dw")
                tb.bn(f + "/dw_bn", sd, t + ".bn1")
                tb.conv(f + "/se_reduce", sd, t + ".se.conv_reduce", bias=True)
                tb.conv(f + "/se_expand", sd, t + ".se.conv_expand", bias=True)
                tb.conv(f + "/project_conv", sd, t + ".conv_pw")
                tb.bn(f + "/project_bn", sd, t + ".bn2")
            else:
                # timm InvertedResidual: conv_pw/bn1, conv_dw/bn2, se, conv_pwl/bn3
                tb.conv(f + "/expand_conv", sd, t + ".conv_pw")
                tb.bn(f + "/expand_bn", sd, t + ".bn1")
                tb.conv(f + "/dw_conv", sd, t + ".conv_dw")
                tb.bn(f + "/dw_bn", sd, t + ".bn2")
                tb.conv(f + "/se_reduce", sd, t + ".se.conv_reduce", bias=True)
                tb.conv(f + "/se_expand", sd, t + ".se.conv_expand", bias=True)
                tb.conv(f + "/project_conv", sd, t + ".conv_pwl")
                tb.bn(f + "/project_bn", sd, t + ".bn3")


# -------------------------------------------------------------- decoder

def _import_unet_decoder(tb: _TreeBuilder, sd, n_blocks: int = 5):
    for i in range(n_blocks):
        f = f"decoder/block{i}"
        t = f"blocks.{i}"
        for c in (1, 2):
            tb.conv(f"{f}/conv{c}", sd, f"{t}.conv{c}.0")
            tb.bn(f"{f}/bn{c}", sd, f"{t}.conv{c}.1")
    tb.conv("segmentation_head/conv", sd, "head.0", bias=True)


def import_smp_unet(state_dict, encoder_name: str = "resnet34"):
    """smp.Unet state dict -> flax variables for
    cartseg_tpu.models.build_model(encoder_name)."""
    sd = {k: v for k, v in state_dict.items()}
    tb = _TreeBuilder()
    enc = _strip_prefix(sd, "encoder.")
    if encoder_name.startswith("resnet"):
        sizes = _RESNET34_SIZES if encoder_name == "resnet34" else (2, 2, 2, 2)
        _import_resnet_encoder(tb, {f"{k}": v for k, v in enc.items()}, sizes)
    elif encoder_name == "efficientnet-b0":
        _import_effnet_encoder(tb, enc)
    else:
        raise ValueError(encoder_name)
    dec = {**_strip_prefix(sd, "decoder."),
           **{"head.0." + k[len("segmentation_head.0."):]: v
              for k, v in sd.items()
              if k.startswith("segmentation_head.0.")}}
    _import_unet_decoder(tb, dec)
    return flax.core.freeze(tb.variables()).unfreeze()


def import_encoder_state_dict(state_dict, encoder_name: str = "resnet34"):
    """Raw torchvision-resnet34 / timm-efficientnet_b0 state dict (the
    ImageNet checkpoint format, NO 'encoder.' prefix) -> encoder-subtree
    variables {'params': {'encoder': ...}, 'batch_stats': {...}}.

    This is the TPU equivalent of smp's encoder_weights="imagenet"
    (train_bce_dice.py:297; src/train_with_pretrained.py:317-325): the
    encoder starts from the converted checkpoint, decoder/head stay at
    their fresh init. Classifier keys (fc.*, classifier.*, conv_head.*,
    bn2.* on timm B0) are ignored."""
    tb = _TreeBuilder()
    if encoder_name.startswith("resnet"):
        sizes = _RESNET34_SIZES if encoder_name == "resnet34" else (2, 2, 2, 2)
        _import_resnet_encoder(tb, dict(state_dict), sizes)
    elif encoder_name == "efficientnet-b0":
        _import_effnet_encoder(tb, dict(state_dict))
    else:
        raise ValueError(encoder_name)
    return tb.variables()


def load_pretrained_encoder(variables, state_dict,
                            encoder_name: str = "resnet34"):
    """Merge a converted encoder checkpoint into freshly-initialized
    model variables, asserting every leaf shape matches. Returns new
    variables (input not mutated)."""
    import jax

    enc = import_encoder_state_dict(state_dict, encoder_name)

    def merge(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"converted key {path}/{k} not in model")
            if isinstance(v, dict):
                out[k] = merge(dst[k], v, f"{path}/{k}")
            else:
                if tuple(dst[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: model "
                        f"{tuple(dst[k].shape)} vs checkpoint "
                        f"{tuple(v.shape)}")
                out[k] = v.astype(dst[k].dtype)
        return out

    new_vars = dict(variables)
    new_params = dict(new_vars["params"])
    new_params["encoder"] = merge(new_vars["params"]["encoder"],
                                  enc["params"]["encoder"], "params/encoder")
    new_vars["params"] = new_params
    new_stats = dict(new_vars.get("batch_stats", {}))
    new_stats["encoder"] = merge(new_stats["encoder"],
                                 enc["batch_stats"]["encoder"],
                                 "batch_stats/encoder")
    new_vars["batch_stats"] = new_stats
    n_leaves = len(jax.tree_util.tree_leaves(enc))
    assert n_leaves > 50, f"suspiciously small encoder import: {n_leaves}"
    return new_vars


def import_classic_unet(state_dict):
    """Classic UNet (create_testset.py:40-83) .pth -> flax variables.
    Expected torch naming: downs.{i}.conv{1,2}, bottleneck.conv{1,2},
    ups.{i} (ConvTranspose), updcs.{i}.conv{1,2}, head."""
    sd = dict(state_dict)
    tb = _TreeBuilder()
    for i in range(4):
        for c in (1, 2):
            tb.conv(f"down{i}/conv{c}", sd, f"downs.{i}.conv{c}", bias=True)
            tb.conv(f"updc{i}/conv{c}", sd, f"updcs.{i}.conv{c}", bias=True)
        tb.conv(f"up{i}", sd, f"ups.{i}", bias=True, transpose=True)
    for c in (1, 2):
        tb.conv(f"bottleneck/conv{c}", sd, f"bottleneck.conv{c}", bias=True)
    tb.conv("head", sd, "head", bias=True)
    return {"params": tb.params}


# --------------------------------------------------------------- export

def export_flax_to_torch_naming(variables, encoder_name: str = "resnet34"
                                ) -> Dict[str, np.ndarray]:
    """Inverse of import_smp_unet (for round-trip tests and for writing
    checkpoints the reference tooling can read)."""
    out: Dict[str, np.ndarray] = {}

    def walk(params, stats, fprefix: Tuple[str, ...]):
        for k, v in params.items():
            if isinstance(v, dict):
                walk(v, stats.get(k, {}) if isinstance(stats, dict) else {},
                     fprefix + (k,))
            else:
                out["/".join(fprefix + (k,))] = np.asarray(v)
        if isinstance(stats, dict):
            for k, v in stats.items():
                if not isinstance(v, dict):
                    out["/".join(fprefix + (k,))] = np.asarray(v)

    walk(variables["params"], variables.get("batch_stats", {}), ())
    # translate flax flat paths to torch keys
    torch_sd: Dict[str, np.ndarray] = {}
    for fk, v in out.items():
        tk = _flax_path_to_torch_key(fk, encoder_name)
        if tk is None:
            continue
        if fk.endswith("/kernel") and v.ndim == 4:
            v = _inv_conv_w(v)
        torch_sd[tk] = v
    return torch_sd


_BN_LEAF = {"scale": "weight", "bias": "bias",
            "mean": "running_mean", "var": "running_var"}


def _flax_path_to_torch_key(path: str, encoder_name: str):
    parts = path.split("/")
    leaf = parts[-1]
    mod = parts[:-1]

    def bn_leaf():
        return _BN_LEAF[leaf]

    if mod[0] == "encoder":
        m = mod[1]
        if encoder_name.startswith("resnet"):
            if m == "conv1":
                return "encoder.conv1.weight"
            if m == "bn1":
                return f"encoder.bn1.{bn_leaf()}"
            layer, blk = m.split("_")
            sub = mod[2]
            tsub = {"conv1": "conv1.weight", "conv2": "conv2.weight",
                    "downsample_conv": "downsample.0.weight"}.get(sub)
            if tsub:
                return f"encoder.{layer}.{blk}.{tsub}"
            tbn = {"bn1": "bn1", "bn2": "bn2",
                   "downsample_bn": "downsample.1"}[sub]
            return f"encoder.{layer}.{blk}.{tbn}.{bn_leaf()}"
        else:  # efficientnet-b0
            if m == "stem_conv":
                return "encoder.conv_stem.weight"
            if m == "stem_bn":
                return f"encoder.bn1.{bn_leaf()}"
            g, r = m[len("block"):].split("_")
            expand1 = _B0_GROUPS[int(g)][0] == 1
            sub = mod[2]
            conv_map = {
                "dw_conv": "conv_dw.weight",
                "se_reduce": f"se.conv_reduce.{leaf if leaf == 'bias' else 'weight'}",
                "se_expand": f"se.conv_expand.{leaf if leaf == 'bias' else 'weight'}",
            }
            if expand1:
                conv_map["project_conv"] = "conv_pw.weight"
                bn_map = {"dw_bn": "bn1", "project_bn": "bn2"}
            else:
                conv_map["expand_conv"] = "conv_pw.weight"
                conv_map["project_conv"] = "conv_pwl.weight"
                bn_map = {"expand_bn": "bn1", "dw_bn": "bn2",
                          "project_bn": "bn3"}
            if sub in conv_map:
                return f"encoder.blocks.{g}.{r}.{conv_map[sub]}"
            return f"encoder.blocks.{g}.{r}.{bn_map[sub]}.{bn_leaf()}"

    if mod[0] == "decoder":
        i = mod[1][len("block"):]
        sub = mod[2]
        if sub.startswith("conv"):
            return f"decoder.blocks.{i}.{sub}.0.weight"
        c = sub[len("bn"):]
        return f"decoder.blocks.{i}.conv{c}.1.{bn_leaf()}"

    if mod[0] == "segmentation_head":
        return f"segmentation_head.0.{'weight' if leaf == 'kernel' else 'bias'}"
    return None
