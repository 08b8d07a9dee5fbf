"""BatchNorm with TPU-layout-friendly statistic/gradient reductions.

`TpuBatchNorm` is drop-in equivalent to the `nn.BatchNorm` the models
used (same param/collection tree: params {scale, bias}, batch_stats
{mean, var}; same momentum/epsilon semantics, flax convention
ra = m*ra + (1-m)*batch), but the four full-tensor reductions of
train-mode BN (sum x / sum x^2 forward, sum dy / sum dy*xhat backward)
run through ops/pallas/channel_sums instead of XLA reduces. On the
low-channel high-resolution stages (C=16/32 at 512^2) XLA's reduces
run ~20x below HBM bandwidth due to lane-padded layouts and cost
~53 ms of the 129 ms step (docs/step_trace.json); the kernel reads the
same bytes as compact [B*H, W*C] rows at bandwidth.

The elementwise normalize math mirrors flax.linen.BatchNorm's op order
and dtype promotion exactly (promote to `dtype`, y = (x - mean) *
(scale * rsqrt(var + eps)) + bias), so outputs match the flax lane to
dtype rounding; gradients match autodiff analytically (standard BN
backward). Parity: tests/test_models.py::test_tpu_batch_norm*.

Lane selection (`batch_norm` factory): flax EVERYWHERE by default —
on-chip measurement (docs/bn_bench.json) showed the custom lane loses
to XLA's conv+stat fusion (see use_pallas_bn). CARTSEG_PALLAS_BN=force
enables the kernel lane (interpret mode off-TPU, for tests). Note the
flax lane is also the mesh-correct one (a Pallas custom call is opaque
to the pjit partitioner; XLA's reduce partitions into global-batch
stats).
"""

from __future__ import annotations

import functools
import os

import flax.linen as nn
import jax
import jax.numpy as jnp

from cartseg_tpu.ops.pallas.channel_sums import channel_sums, supported


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_train(x, scale, bias, eps):
    """Train-mode batch norm over (B,H,W). Returns (y, mean, var) with
    mean/var f32 [C] (biased variance, flax convention). The mean/var
    outputs exist for the running-stats update and are NOT
    differentiated through (their cotangents are ignored — flax's
    running update is outside the grad path too)."""
    y, mean, var = _bn_fwd_math(x, scale, bias, eps)
    return y, mean, var


def _bn_fwd_math(x, scale, bias, eps):
    n = x.shape[0] * x.shape[1] * x.shape[2]
    s, ss = channel_sums(x, x)
    mean = s / n
    var = ss / n - mean * mean
    dt = x.dtype
    # flax _normalize op order/promotion: all terms in `dtype`
    mul = scale.astype(dt) * jax.lax.rsqrt(var.astype(dt) + jnp.asarray(
        eps, dt))
    y = (x - mean.astype(dt)) * mul + bias.astype(dt)
    return y, mean, var


def _bn_fwd(x, scale, bias, eps):
    y, mean, var = _bn_fwd_math(x, scale, bias, eps)
    rstd = jax.lax.rsqrt(var + eps)
    return (y, mean, var), (x, scale, mean, rstd)


def _bn_bwd(eps, res, cts):
    x, scale, mean, rstd = res
    dy = cts[0]  # cotangents of mean/var (running stats) are zero
    n = x.shape[0] * x.shape[1] * x.shape[2]
    s_dy, s_dyx = channel_sums(dy, x)
    dbeta = s_dy
    dgamma = rstd * (s_dyx - mean * s_dy)
    # dx = (gamma*rstd) * (dy - dbeta/n - xhat * dgamma/n), folded into
    # one fused elementwise pass A*dy - D*x + B over per-channel f32
    # coefficients
    a = scale * rstd
    d = a * rstd * (dgamma / n)
    b = -a * (dbeta / n) + d * mean
    dt = x.dtype
    dx = (a.astype(dt) * dy - d.astype(dt) * x + b.astype(dt))
    return dx, dgamma, dbeta


bn_train.defvjp(_bn_fwd, _bn_bwd)


class TpuBatchNorm(nn.Module):
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        if self.use_running_average:
            dt = self.dtype
            mul = scale.astype(dt) * jax.lax.rsqrt(
                ra_var.value.astype(dt) + jnp.asarray(self.epsilon, dt))
            return (x.astype(dt) - ra_mean.value.astype(dt)) * mul \
                + bias.astype(dt)
        y, mean, var = bn_train(x.astype(self.dtype), scale, bias,
                                self.epsilon)
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var
        return y


def use_pallas_bn() -> bool:
    """Default OFF: measured on-chip (docs/bn_bench.json), the custom
    reduction LOSES to XLA's conv+stat fusion — the flax lane's BN
    statistic reduces fuse into the producing convolutions' epilogues,
    while a custom call forces an extra relayout + full re-read of
    every activation (0.56x fwd / 0.69x step at 512^2). Kept as a
    measured experiment per the keep-what-wins policy; enable with
    CARTSEG_PALLAS_BN=force."""
    return os.environ.get("CARTSEG_PALLAS_BN", "0") in ("1", "force")


def batch_norm(use_running_average: bool, dtype, name: str,
               momentum: float = 0.9, epsilon: float = 1e-5) -> nn.Module:
    """The models' norm factory: TpuBatchNorm on a single TPU chip,
    nn.BatchNorm elsewhere (identical trees either way, so checkpoints
    and the torch importer are lane-agnostic)."""
    cls = TpuBatchNorm if use_pallas_bn() else nn.BatchNorm
    return cls(use_running_average=use_running_average, momentum=momentum,
               epsilon=epsilon, dtype=dtype, name=name)
