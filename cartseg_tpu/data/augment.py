"""On-device augmentation pipeline — replaces albumentations
(train_bce_dice.py:164-181 and the 224 variant
finetune_for_224.py:88-109) with jit-compiled jax transforms that run
inside the train step: no host round-trips, fused with the forward.

TPU-native design (measured on v5e):
  * Photometric ops (brightness/contrast, HSV, color-jitter, noise,
    blur) are batched elementwise passes with per-sample parameters
    broadcast as [B,1,1,1] — XLA fuses the whole chain into one VPU
    sweep (~2 ms at 32x224^2).
  * Geometric warps are the TPU hazard: a per-sample gather-based
    bilinear warp costs ~56 ms/batch (scattered 2-D gathers defeat the
    vector units). Instead all warp-like ops (Rotate, zoom,
    ShiftScaleRotate) compose into ONE affine resample whose parameters
    are shared per batch; with batch*channel moved to the minor axis
    the warp is a single shared-index slice-gather (~1 ms). Horizontal
    flip stays per-sample (a reverse is free).

Distribution parity vs albumentations (SURVEY.md hard part #6 —
statistical, not bitwise, for stochastic ops): marginal per-image
distributions match; geometric parameters are batch-correlated (shared
within a batch) — the documented TPU-native trade. The reference's
RandomScale+Resize pair is geometrically a no-op (uniform resize
down/up); we implement the evident intent (zoom about center) behind
scale_mode="zoom"; "noop" restores literal behavior. Sequential warps
(Rotate then zoom) are composed into one resample (less interpolation
blur than the reference's double resample).

Normalization: (x/255 - mean)/std; ImageNet or zero/one
(train_bce_dice.py:173 uses mean 0 / std 1).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    # geometric
    hflip_p: float = 0.5
    rotate_p: float = 0.5
    rotate_limit: float = 20.0
    scale_p: float = 0.5
    scale_limit: float = 0.12
    scale_mode: str = "zoom"  # "zoom" | "noop"
    shift_scale_rotate_p: float = 0.0  # the 224 finetune transform
    ssr_shift_limit: float = 0.02
    ssr_scale_limit: float = 0.12
    ssr_rotate_limit: float = 5.0
    # photometric
    brightness_contrast_p: float = 0.3
    brightness_limit: float = 0.2
    contrast_limit: float = 0.2
    hsv_p: float = 0.2
    hue_shift: float = 20.0
    sat_shift: float = 30.0
    val_shift: float = 20.0
    color_jitter_p: float = 0.0
    cj_brightness: float = 0.08
    cj_contrast: float = 0.08
    cj_saturation: float = 0.05
    cj_hue: float = 0.02
    noise_p: float = 0.15
    noise_var: Tuple[float, float] = (10.0, 50.0)
    motion_blur_p: float = 0.15
    # per-sample geometric parameters: exact albumentations marginal
    # AND joint distribution, at the cost of per-sample gather warps
    # (~56 ms vs ~1 ms per 32x224^2 batch — see module docstring)
    per_sample_warp: bool = False
    # normalization
    mean: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    std: Tuple[float, float, float] = (1.0, 1.0, 1.0)

    @staticmethod
    def train_512(imagenet_norm: bool = False) -> "AugmentConfig":
        """The train_bce_dice.py:164-175 pipeline."""
        return AugmentConfig(
            mean=IMAGENET_MEAN if imagenet_norm else (0, 0, 0),
            std=IMAGENET_STD if imagenet_norm else (1, 1, 1))

    @staticmethod
    def train_224(imagenet_norm: bool = True) -> "AugmentConfig":
        """The finetune_for_224.py:88-109 pipeline."""
        return AugmentConfig(
            hflip_p=0.5, rotate_p=0.0, scale_p=0.0,
            brightness_contrast_p=0.0, hsv_p=0.0, noise_p=0.0,
            motion_blur_p=0.0,
            shift_scale_rotate_p=0.20, color_jitter_p=0.15,
            mean=IMAGENET_MEAN if imagenet_norm else (0, 0, 0),
            std=IMAGENET_STD if imagenet_norm else (1, 1, 1))

    @staticmethod
    def none(imagenet_norm: bool = False) -> "AugmentConfig":
        """Val transform: normalize only."""
        return AugmentConfig(
            hflip_p=0, rotate_p=0, scale_p=0, brightness_contrast_p=0,
            hsv_p=0, noise_p=0, motion_blur_p=0, shift_scale_rotate_p=0,
            color_jitter_p=0,
            mean=IMAGENET_MEAN if imagenet_norm else (0, 0, 0),
            std=IMAGENET_STD if imagenet_norm else (1, 1, 1))

    @property
    def any_warp(self) -> bool:
        return (self.rotate_p > 0
                or (self.scale_p > 0 and self.scale_mode == "zoom")
                or self.shift_scale_rotate_p > 0)


# ------------------------------------------------------------- warping

def _reflect101(coord, n):
    """OpenCV BORDER_REFLECT_101 index folding."""
    period = 2.0 * (n - 1)
    c = jnp.abs(coord) % period
    return jnp.where(c > n - 1, period - c, c)


def _per_sample_affine_warp(images, masks, angles, scales, tys, txs):
    """Per-sample parameters via vmap over the shared-warp math on
    single-sample 'batches' — slow (scattered gathers) but distribution
    -exact; gated behind AugmentConfig.per_sample_warp."""
    def one(img, m, a, s, ty, tx):
        oi, om = _shared_affine_warp(img[None], m[None], a, s, ty, tx)
        return oi[0], om[0]

    return jax.vmap(one)(images, masks, angles, scales, tys, txs)


def _shared_affine_warp(images, masks, angle_deg, scale, ty, tx):
    """One affine resample shared across the batch.

    images [B,H,W,C] uint8 or float (bilinear), masks [B,H,W,1]
    (nearest). Batch*channel is moved to the minor axis so the bilinear
    taps are 4 shared-index slice-gathers instead of B*H*W scattered
    lookups; the gathers (and the two relayout transposes) run in the
    INPUT dtype — callers pass uint8 so the 4 taps move 1/4 the bytes —
    and only the 4 tap values are lifted to f32 for the lerp (exact:
    u8 is representable in f32; the reference's cv2.warpAffine rounds
    to uint8 after its lerp, so this is strictly more precise).
    reflect-101 border (albumentations Rotate default). Returns f32.
    """
    B, H, W, C = images.shape
    th = -angle_deg * jnp.pi / 180.0
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    c, s = jnp.cos(th), jnp.sin(th)
    inv_s = 1.0 / scale
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    # output (y,x) -> input coords (inverse transform about center+shift)
    dy, dx = yy - (cy + ty), xx - (cx + tx)
    sy = _reflect101((c * dy - s * dx) * inv_s + cy, H)
    sx = _reflect101((s * dy + c * dx) * inv_s + cx, W)

    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y0 = jnp.clip(y0, 0, H - 1)
    x0 = jnp.clip(x0, 0, W - 1)
    wy = (sy - y0)[..., None]
    wx = (sx - x0)[..., None]

    flat_img = jnp.transpose(images, (1, 2, 0, 3)).reshape(H * W, B * C)

    def gi(yi, xi):
        taps = flat_img[(yi * W + xi).reshape(-1)].reshape(H, W, B * C)
        return taps.astype(jnp.float32)

    out = (gi(y0, x0) * (1 - wy) * (1 - wx) + gi(y0, x1) * (1 - wy) * wx
           + gi(y1, x0) * wy * (1 - wx) + gi(y1, x1) * wy * wx)
    out_img = jnp.transpose(out.reshape(H, W, B, C), (2, 0, 1, 3))

    # nearest for masks
    yn = jnp.clip(jnp.round(sy).astype(jnp.int32), 0, H - 1)
    xn = jnp.clip(jnp.round(sx).astype(jnp.int32), 0, W - 1)
    flat_m = jnp.transpose(masks, (1, 2, 0, 3)).reshape(H * W, B)
    out_m = flat_m[(yn * W + xn).reshape(-1)].reshape(H, W, B)
    out_mask = jnp.transpose(out_m, (2, 0, 1))[..., None]
    return out_img, out_mask


# ----------------------------------------------------------- color ops

def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn
    safe_d = jnp.where(d == 0, 1.0, d)
    h = jnp.where(
        mx == r, ((g - b) / safe_d) % 6.0,
        jnp.where(mx == g, (b - r) / safe_d + 2.0, (r - g) / safe_d + 4.0))
    h = jnp.where(d == 0, 0.0, h) / 6.0
    sat = jnp.where(mx == 0, 0.0, d / jnp.where(mx == 0, 1.0, mx))
    return h, sat, mx


def _hsv_to_rgb(h, s, v):
    """Sector-free formula: per channel n in {5,3,1},
    c = v - v*s*clip(min(k, 4-k), 0, 1) with k = (n + 6h) mod 6 —
    identical output to the classic 6-way select table
    (colorsys-oracle-tested); measured on-chip at parity with the
    select version (XLA fuses both into one VPU sweep), kept for the
    smaller expression."""
    h6 = (h % 1.0) * 6.0
    vs = v * s

    def chan(n):
        kk = (n + h6) % 6.0
        return v - vs * jnp.clip(jnp.minimum(kk, 4.0 - kk), 0.0, 1.0)

    return jnp.stack([chan(5.0), chan(3.0), chan(1.0)], axis=-1)


def normalize_batch(img, mean, std):
    """(x/255 - mean)/std on 0..255 floats (albumentations Normalize)."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (img / 255.0 - mean) / std


def _u(key, lo, hi, shape=()):
    return jax.random.uniform(key, shape, minval=lo, maxval=hi)


def draw_warp_params(k, cfg: AugmentConfig, shape, H, W):
    """Draw the composed affine parameters (angle deg, scale, ty, tx)
    with albumentations-matching marginals: Rotate(p, limit) U-mixture,
    zoom 1+U(-s,s) w.p. p, ShiftScaleRotate triple. shape=() draws one
    batch-shared set; shape=(B,) one per sample (the exact albu joint).
    Exposed separately so the distribution audit (tests/test_augment
    KS tests) can sample it directly."""
    angle = jnp.zeros(shape, jnp.float32)
    scale = jnp.ones(shape, jnp.float32)
    ty = jnp.zeros(shape, jnp.float32)
    tx = jnp.zeros(shape, jnp.float32)
    if cfg.rotate_p > 0:
        kr = jax.random.split(k["rot"], 2)
        do = _u(kr[0], 0, 1, shape) < cfg.rotate_p
        angle += jnp.where(do, _u(kr[1], -cfg.rotate_limit,
                                  cfg.rotate_limit, shape), 0.0)
    if cfg.scale_p > 0 and cfg.scale_mode == "zoom":
        kz = jax.random.split(k["zoom"], 2)
        do = _u(kz[0], 0, 1, shape) < cfg.scale_p
        scale *= jnp.where(do, 1.0 + _u(kz[1], -cfg.scale_limit,
                                        cfg.scale_limit, shape), 1.0)
    if cfg.shift_scale_rotate_p > 0:
        ks = jax.random.split(k["ssr"], 5)
        do = _u(ks[0], 0, 1, shape) < cfg.shift_scale_rotate_p
        angle += jnp.where(do, _u(ks[1], -cfg.ssr_rotate_limit,
                                  cfg.ssr_rotate_limit, shape), 0.0)
        scale *= jnp.where(do, 1.0 + _u(ks[2], -cfg.ssr_scale_limit,
                                        cfg.ssr_scale_limit, shape), 1.0)
        ty += jnp.where(do, _u(ks[3], -cfg.ssr_shift_limit,
                               cfg.ssr_shift_limit, shape) * H, 0.0)
        tx += jnp.where(do, _u(ks[4], -cfg.ssr_shift_limit,
                               cfg.ssr_shift_limit, shape) * W, 0.0)
    return angle, scale, ty, tx


def augment_batch(key, images_u8, masks, cfg: AugmentConfig):
    """[B,H,W,3] uint8 + [B,H,W,1] float -> (normalized float images,
    masks), all on device, one fused program."""
    B, H, W, _ = images_u8.shape
    # flip + warp run on the RAW uint8 tensor (4x less HBM traffic in
    # the warp gathers — docs/augment_bench.json); the warp lifts its
    # taps to f32 for the lerp, losslessly.
    img = images_u8
    masks = jnp.asarray(masks, jnp.float32)
    k = {name: jax.random.fold_in(key, i) for i, name in enumerate(
        ["flip", "rot", "zoom", "ssr", "bc", "hsv", "cj", "noise", "blur"])}
    col = lambda x: x[:, None, None, None]  # [B] -> broadcastable

    # --- horizontal flip (per-sample, reverse is free)
    if cfg.hflip_p > 0:
        do = col(_u(k["flip"], 0, 1, (B,)) < cfg.hflip_p)
        img = jnp.where(do, img[:, :, ::-1], img)
        masks = jnp.where(do, masks[:, :, ::-1], masks)

    # --- composed geometric warp (per-batch shared parameters by
    # default; per_sample_warp draws one parameter set per sample)
    if cfg.any_warp:
        shape = (B,) if cfg.per_sample_warp else ()
        angle, scale, ty, tx = draw_warp_params(k, cfg, shape, H, W)
        if cfg.per_sample_warp:
            img, masks = _per_sample_affine_warp(img, masks, angle, scale,
                                                 ty, tx)
        else:
            img, masks = _shared_affine_warp(img, masks, angle, scale,
                                             ty, tx)
    else:
        img = img.astype(jnp.float32)

    # --- brightness / contrast (per-sample)
    if cfg.brightness_contrast_p > 0:
        kb = jax.random.split(k["bc"], 3)
        do = col(_u(kb[0], 0, 1, (B,)) < cfg.brightness_contrast_p)
        alpha = col(1.0 + _u(kb[1], -cfg.contrast_limit,
                             cfg.contrast_limit, (B,)))
        beta = col(_u(kb[2], -cfg.brightness_limit,
                      cfg.brightness_limit, (B,)) * 255.0)
        img = jnp.where(do, jnp.clip(img * alpha + beta, 0, 255), img)

    # --- HSV jitter (per-sample, OpenCV scales)
    if cfg.hsv_p > 0:
        kh = jax.random.split(k["hsv"], 4)
        do = col(_u(kh[0], 0, 1, (B,)) < cfg.hsv_p)
        dh = col(_u(kh[1], -cfg.hue_shift, cfg.hue_shift, (B,)) / 180.0)
        ds = col(_u(kh[2], -cfg.sat_shift, cfg.sat_shift, (B,)) / 255.0)
        dv = col(_u(kh[3], -cfg.val_shift, cfg.val_shift, (B,)) / 255.0)
        h, s, v = _rgb_to_hsv(img / 255.0)
        out = _hsv_to_rgb((h[..., None] + dh)[..., 0] % 1.0,
                          jnp.clip((s[..., None] + ds)[..., 0], 0, 1),
                          jnp.clip((v[..., None] + dv)[..., 0], 0, 1))
        img = jnp.where(do, jnp.clip(out * 255.0, 0, 255), img)

    # --- ColorJitter (224 finetune, per-sample)
    if cfg.color_jitter_p > 0:
        kc = jax.random.split(k["cj"], 5)
        do = col(_u(kc[0], 0, 1, (B,)) < cfg.color_jitter_p)
        br = col(1.0 + _u(kc[1], -cfg.cj_brightness, cfg.cj_brightness, (B,)))
        ct = col(1.0 + _u(kc[2], -cfg.cj_contrast, cfg.cj_contrast, (B,)))
        st = col(1.0 + _u(kc[3], -cfg.cj_saturation, cfg.cj_saturation, (B,)))
        hu = col(_u(kc[4], -cfg.cj_hue, cfg.cj_hue, (B,)))
        out = img * br
        mean = jnp.mean(out, axis=(1, 2, 3), keepdims=True)
        out = jnp.clip((out - mean) * ct + mean, 0, 255)
        h, s, v = _rgb_to_hsv(out / 255.0)
        out = _hsv_to_rgb((h[..., None] + hu)[..., 0] % 1.0,
                          jnp.clip((s[..., None] * st)[..., 0], 0, 1), v)
        img = jnp.where(do, jnp.clip(out * 255.0, 0, 255), img)

    # --- gaussian noise (per-sample variance). The full-image normal
    # draw is the one BIG tensor of random bits in the pipeline
    # (B*H*W*3 floats); threefry costs ~1.4 ms of shift/xor chains per
    # step at bs128@224^2 (docs/step_trace.json), so the bits come from
    # the hardware RngBitGenerator ('rbg') instead — seeded from the
    # threefry stream, still deterministic per (key, step), same N(0,1)
    # marginal; tiny per-sample draws stay threefry.
    if cfg.noise_p > 0:
        kn = jax.random.split(k["noise"], 3)
        do = col(_u(kn[0], 0, 1, (B,)) < cfg.noise_p)
        var = col(_u(kn[1], cfg.noise_var[0], cfg.noise_var[1], (B,)))
        kd = jax.random.key_data(kn[2])  # threefry key = 2 x u32
        rk = jax.random.wrap_key_data(
            jnp.concatenate([kd, kd ^ jnp.uint32(0x9E3779B9)]),
            impl="rbg")  # seed from raw key data: no threefry block
        noise = jax.random.normal(rk, img.shape) * jnp.sqrt(var)
        img = jnp.where(do, jnp.clip(img + noise, 0, 255), img)

    # --- motion blur: 3-tap line, per-batch direction, per-sample gate
    if cfg.motion_blur_p > 0:
        km = jax.random.split(k["blur"], 2)
        do = col(_u(km[0], 0, 1, (B,)) < cfg.motion_blur_p)
        d = jax.random.randint(km[1], (), 0, 4)
        offs = jnp.array([[[0, -1], [0, 1]],     # horizontal
                          [[-1, 0], [1, 0]],     # vertical
                          [[-1, -1], [1, 1]],    # diagonal
                          [[-1, 1], [1, -1]]])   # anti-diagonal
        sel = offs[d]
        blurred = (img
                   + jnp.roll(img, (sel[0, 0], sel[0, 1]), axis=(1, 2))
                   + jnp.roll(img, (sel[1, 0], sel[1, 1]), axis=(1, 2))) / 3.0
        img = jnp.where(do, blurred, img)

    return normalize_batch(img, cfg.mean, cfg.std), masks
