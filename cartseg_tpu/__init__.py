"""cartseg_tpu — a TPU-native (JAX/XLA/Flax/Pallas/pjit) framework for
binary shopping-cart segmentation, re-built from scratch with the full
capability surface of the reference `endressa/cart-segmentation-unet`
(a PyTorch/CUDA research codebase of ~14 standalone training scripts,
a loss zoo with CUDA kernels, and a pseudo-labeling toolchain).

Design principles (TPU-first, not a port):
  * One shared core replaces the reference's copy-pasted logic: the
    letterbox geometry, dataset plumbing, model zoo, losses, metrics,
    and train engine are each written once; the reference's entry
    points become thin configs in :mod:`cartseg_tpu.workloads`.
  * NHWC layout everywhere (XLA's preferred conv layout on TPU MXU).
  * All hot-path math lives under `jax.jit`: losses, metrics, QC
    statistics, EDT, morphology, augmentations — no per-step host
    roundtrips (the reference's ABL loss calls scipy EDT per sample
    per step on the CPU; here it is a jump-flood kernel on device).
  * Scaling via `jax.sharding.Mesh` data parallelism (the reference is
    single-device only).
  * Pallas TPU kernels for the fused loss ops that the reference
    implements in CUDA (`lsr_cpp` extension), each with a pure-jnp
    oracle and parity tests.
"""

__version__ = "0.1.0"

from cartseg_tpu import geometry, metrics  # noqa: F401
