import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import cartseg_tpu
from cartseg_tpu import geometry
from cartseg_tpu.models import build_model, init_model
from cartseg_tpu.losses import bce_dice_loss
print("backend:", jax.default_backend(), flush=True)

rng = np.random.default_rng(0)
frame = (rng.random((1080, 1920, 3)) * 255).astype(np.uint8)
img, meta = geometry.letterbox_and_resize(frame, 224)
assert img.shape == (224, 224, 3), img.shape

model = build_model("resnet34", dtype=jnp.bfloat16)
variables = init_model(model, jax.random.key(0), (1, 224, 224, 3))
x = jnp.asarray(img[None].astype(np.float32) / 255.0)
logits = jax.jit(lambda v, x: model.apply(
    {"params": v["params"], "batch_stats": v["batch_stats"]},
    x, train=False))(variables, x)
assert logits.shape == (1, 224, 224, 1), logits.shape
mask = (np.asarray(jax.nn.sigmoid(logits[0, ..., 0].astype(jnp.float32)))
        >= 0.5)
loss = float(bce_dice_loss(logits, jnp.asarray(
    mask[None, ..., None], jnp.float32)))
assert np.isfinite(loss)
restored = geometry.remove_letterbox(mask.astype(np.uint8) * 255, meta,
                                     (1080, 1920))
assert restored.shape == (1080, 1920), restored.shape

# the new QC surface end-to-end (median + batched canny + CC clean)
from cartseg_tpu.infer.engine import qc_stats_fn
qc = qc_stats_fn()
B = 2
probs = jnp.asarray(rng.random((B, 224, 224)), jnp.float32)
imgs = jnp.asarray((rng.random((B, 224, 224, 3)) * 255).astype(np.uint8))
stats = {k: np.asarray(v) for k, v in
         qc(probs, probs, imgs, jnp.float32(0.5)).items()}
for k, v in stats.items():
    assert v.shape == (B,) and np.isfinite(v).all(), (k, v)
conf = np.abs(np.asarray(probs).reshape(B, -1) - 0.5) * 2
assert np.allclose(stats["fg_conf"], np.median(conf, axis=1), atol=1e-5)
print("library surface ok; loss:", round(loss, 4),
      "fg_conf:", stats["fg_conf"].round(4).tolist(), flush=True)
