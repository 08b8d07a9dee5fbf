"""Export a trained segmenter to a self-contained StableHLO artifact.

The exported program is the full device-side inference path: uint8
letterboxed batch -> normalize -> model forward (eval-mode BN) ->
sigmoid probabilities. Either way the artifact directory is deployable
with ONLY jax (+flax's msgpack codec) installed — no model code or
orbax checkpoint:

  * embed_params=True (default): parameters are closed over and baked
    into the module as constants — one self-contained file.
  * embed_params=False: the program takes the variables tree as an
    argument and the weights ship as a msgpack sidecar. Use this on
    relayed/remote-compile runtimes: a baked resnet34@512² module
    carries ~90 MB of literals that are re-shipped on every compile,
    and this class of transport rejects big literal blobs outright
    (HTTP 413 at ~375 MB — docs/ROADMAP.md SAM trap (a)).

Artifact layout:
    <dir>/model.stablehlo   serialized jax.export module
    <dir>/params.msgpack    variables tree (embed_params=False only)
    <dir>/manifest.json     encoder, img hw, batch, dtype, threshold,
                            normalization, export platforms

The decision threshold comes from the training run's `.threshold.json`
sidecar (engine.py threshold sweep — the reference persists and
consumes the same sidecar, finetune_for_224.py:383-388 /
create_pseudo_labels.py:37-41).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np


# artifact schema version: bump on any incompatible manifest/program
# change; loaders refuse artifacts from a NEWER schema than they know
ARTIFACT_FORMAT = "cartseg_tpu.segmenter"
ARTIFACT_VERSION = 1
_REQUIRED_MANIFEST_KEYS = ("batch_size", "img_hw", "threshold")


def validate_manifest(artifact_dir) -> dict:
    """Load + validate an artifact directory's manifest before touching
    the program bytes: a clear error here beats a deserializer
    stack-trace (or silently serving with a wrong threshold) later."""
    d = Path(artifact_dir)
    mpath = d / "manifest.json"
    if not mpath.exists():
        raise ValueError(f"{d}: not a serving artifact "
                         "(manifest.json missing)")
    try:
        manifest = json.loads(mpath.read_text())
    except json.JSONDecodeError as e:
        raise ValueError(f"{mpath}: corrupt manifest ({e})") from e
    fmt = manifest.get("format", ARTIFACT_FORMAT)  # pre-v1 artifacts
    if fmt != ARTIFACT_FORMAT:
        raise ValueError(f"{d}: unknown artifact format {fmt!r} "
                         f"(expected {ARTIFACT_FORMAT!r})")
    ver = int(manifest.get("artifact_version", 1))
    if ver > ARTIFACT_VERSION:
        raise ValueError(
            f"{d}: artifact_version {ver} is newer than this loader "
            f"supports ({ARTIFACT_VERSION}) — upgrade cartseg_tpu")
    missing = [k for k in _REQUIRED_MANIFEST_KEYS if k not in manifest]
    if missing:
        raise ValueError(f"{d}: manifest missing keys {missing}")
    if not (d / "model.stablehlo").exists():
        raise ValueError(f"{d}: model.stablehlo missing")
    if (not manifest.get("embed_params", True)
            and not (d / "params.msgpack").exists()):
        raise ValueError(f"{d}: manifest says embed_params=false but "
                         "params.msgpack is missing")
    return manifest


def _infer_fn(model, mean, std):
    import jax
    import jax.numpy as jnp

    def infer(variables, x_u8):
        x = x_u8.astype(jnp.float32)
        x = (x / 255.0 - jnp.asarray(mean, jnp.float32)) \
            / jnp.asarray(std, jnp.float32)
        logits = model.apply(variables, x, train=False)
        return jax.nn.sigmoid(logits[..., 0]).astype(jnp.float32)

    return infer


def export_segmenter(
    out_dir,
    checkpoint_dir=None,
    variables=None,
    encoder: str = "resnet34",
    img_hw: Tuple[int, int] = (512, 512),
    batch_size: int = 16,
    threshold: Optional[float] = None,
    imagenet_norm: bool = False,
    compute_dtype: str = "bfloat16",
    platforms: Optional[Sequence[str]] = None,
    embed_params: bool = True,
) -> Path:
    """Build the artifact from either an orbax checkpoint dir (with its
    .threshold.json sidecar) or an in-memory variables tree. Returns
    the artifact path."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from cartseg_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD
    from cartseg_tpu.models import build_model, init_model

    model = build_model(encoder, dtype=jnp.dtype(compute_dtype))
    if variables is None:
        if checkpoint_dir is None:
            raise ValueError("need checkpoint_dir or variables")
        from cartseg_tpu.train import checkpoint as ckpt_lib
        like = init_model(model, jax.random.key(0),
                          (1, img_hw[0], img_hw[1], 3))
        variables = ckpt_lib.load_checkpoint(
            Path(checkpoint_dir),
            {"params": like["params"],
             "batch_stats": like.get("batch_stats", {})})
        if threshold is None:
            sidecar = Path(checkpoint_dir) / "threshold.json"
            if sidecar.exists():
                threshold = float(json.loads(
                    sidecar.read_text())["threshold"])
    threshold = 0.5 if threshold is None else float(threshold)

    mean = IMAGENET_MEAN if imagenet_norm else (0.0, 0.0, 0.0)
    std = IMAGENET_STD if imagenet_norm else (1.0, 1.0, 1.0)
    infer = _infer_fn(model, mean, std)
    vtree = {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})}
    spec = jax.ShapeDtypeStruct((batch_size, img_hw[0], img_hw[1], 3),
                                jnp.uint8)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    if embed_params:
        fn = jax.jit(lambda x: infer(vtree, x))
        exported = jexport.export(fn, **kwargs)(spec)
    else:
        from flax.serialization import msgpack_serialize
        vspec = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(jnp.shape(a), a.dtype), vtree)
        exported = jexport.export(jax.jit(infer), **kwargs)(vspec, spec)
        (out / "params.msgpack").write_bytes(msgpack_serialize(
            jax.tree_util.tree_map(lambda a: np.asarray(a), vtree)))
    (out / "model.stablehlo").write_bytes(exported.serialize())
    (out / "manifest.json").write_text(json.dumps({
        "format": ARTIFACT_FORMAT,
        "artifact_version": ARTIFACT_VERSION,
        "encoder": encoder,
        "img_hw": list(img_hw),
        "batch_size": batch_size,
        "threshold": threshold,
        "imagenet_norm": imagenet_norm,
        "compute_dtype": compute_dtype,
        "platforms": list(exported.platforms),
        "embed_params": embed_params,
        "input": "uint8 [B,H,W,3] letterboxed RGB",
        "output": "float32 [B,H,W] sigmoid probabilities",
    }, indent=1))
    return out


class ServedSegmenter:
    """A loaded artifact: fixed-batch device program + geometry glue.

    `predict_probs(batch_u8)` pads ragged batches to the exported batch
    size (XLA sees one static shape) and strips the padding after.
    `segment(image)` runs one original-resolution RGB frame end to end:
    letterbox -> infer -> threshold -> inverse letterbox.
    """

    def __init__(self, artifact_dir):
        from jax import export as jexport

        d = Path(artifact_dir)
        self.manifest = validate_manifest(d)
        self._exported = jexport.deserialize(
            (d / "model.stablehlo").read_bytes())
        self.batch_size = int(self.manifest["batch_size"])
        self.img_hw = tuple(self.manifest["img_hw"])
        self.threshold = float(self.manifest["threshold"])
        self._variables = None
        if not self.manifest.get("embed_params", True):
            import jax
            from flax.serialization import msgpack_restore

            self._variables = jax.tree_util.tree_map(
                jax.numpy.asarray,
                msgpack_restore((d / "params.msgpack").read_bytes()))

    def predict_probs(self, batch_u8: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        n = batch_u8.shape[0]
        if n > self.batch_size:
            raise ValueError(f"batch {n} > exported {self.batch_size}")
        if n < self.batch_size:
            pad = np.zeros((self.batch_size - n,) + batch_u8.shape[1:],
                           batch_u8.dtype)
            batch_u8 = np.concatenate([batch_u8, pad])
        x = jnp.asarray(batch_u8, jnp.uint8)
        if self._variables is None:
            probs = self._exported.call(x)
        else:
            probs = self._exported.call(self._variables, x)
        return np.asarray(probs)[:n]

    def segment(self, image: np.ndarray) -> np.ndarray:
        """HxWx3 uint8 RGB at any resolution -> HxW uint8 {0,255} mask
        at the original resolution."""
        from cartseg_tpu import geometry

        h, w = image.shape[:2]
        x = geometry.letterbox_and_resize(image, self.img_hw)
        probs = self.predict_probs(x[None])[0]
        mask = (probs >= self.threshold).astype(np.uint8) * 255
        return geometry.remove_letterbox(mask, orig_w=w, orig_h=h)


def load_segmenter(artifact_dir) -> ServedSegmenter:
    return ServedSegmenter(artifact_dir)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="Export a checkpoint to a serving artifact")
    ap.add_argument("--checkpoint", required=True,
                    help="orbax checkpoint dir (…/model.ckpt)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--encoder", default="resnet34")
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--imagenet_norm", action="store_true")
    ap.add_argument("--threshold", type=float, default=None,
                    help="override the .threshold.json sidecar")
    ap.add_argument("--no_embed_params", action="store_true",
                    help="ship weights as a msgpack sidecar instead of "
                         "baking them into the module (lean program for "
                         "remote-compile transports)")
    args = ap.parse_args(argv)
    out = export_segmenter(
        args.out, checkpoint_dir=args.checkpoint, encoder=args.encoder,
        img_hw=(args.img, args.img), batch_size=args.batch_size,
        threshold=args.threshold, imagenet_norm=args.imagenet_norm,
        embed_params=not args.no_embed_params)
    print(f"artifact: {out}")
    print((out / "manifest.json").read_text())


if __name__ == "__main__":
    main()
