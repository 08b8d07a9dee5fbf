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


def _rng(u, lo, hi):
    """Map a U[0,1) draw onto U[lo,hi)."""
    return lo + (hi - lo) * u


def draw_warp_params(k, cfg: AugmentConfig, shape, H, W):
    """Draw the composed affine parameters (angle deg, scale, ty, tx)
    with albumentations-matching marginals: Rotate(p, limit) U-mixture,
    zoom 1+U(-s,s) w.p. p, ShiftScaleRotate triple. shape=() draws one
    batch-shared set; shape=(B,) one per sample (the exact albu joint).
    Exposed separately so the distribution audit (tests/test_augment
    KS tests) can sample it directly.

    All nine underlying uniforms come from ONE `jax.random.uniform`
    call — each tiny threefry draw is a separate ~launch-bound op on
    this runtime (the u32 shift/xor chains showed up at several ms per
    step in docs/step_trace.json), so the pipeline draws its bits in
    bulk and slices."""
    u = jax.random.uniform(k["rot"], (9,) + tuple(shape))
    angle = jnp.zeros(shape, jnp.float32)
    scale = jnp.ones(shape, jnp.float32)
    ty = jnp.zeros(shape, jnp.float32)
    tx = jnp.zeros(shape, jnp.float32)
    if cfg.rotate_p > 0:
        do = u[0] < cfg.rotate_p
        angle += jnp.where(do, _rng(u[1], -cfg.rotate_limit,
                                    cfg.rotate_limit), 0.0)
    if cfg.scale_p > 0 and cfg.scale_mode == "zoom":
        do = u[2] < cfg.scale_p
        scale *= jnp.where(do, 1.0 + _rng(u[3], -cfg.scale_limit,
                                          cfg.scale_limit), 1.0)
    if cfg.shift_scale_rotate_p > 0:
        do = u[4] < cfg.shift_scale_rotate_p
        angle += jnp.where(do, _rng(u[5], -cfg.ssr_rotate_limit,
                                    cfg.ssr_rotate_limit), 0.0)
        scale *= jnp.where(do, 1.0 + _rng(u[6], -cfg.ssr_scale_limit,
                                          cfg.ssr_scale_limit), 1.0)
        ty += jnp.where(do, _rng(u[7], -cfg.ssr_shift_limit,
                                 cfg.ssr_shift_limit) * H, 0.0)
        tx += jnp.where(do, _rng(u[8], -cfg.ssr_shift_limit,
                                 cfg.ssr_shift_limit) * W, 0.0)
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
    # ALL the tiny parameter draws come from one (17,B) uniform matrix
    # (one threefry op) — ~50 separate fold_in/split/uniform ops cost
    # several ms/step of launch-bound u32 chains on this runtime
    # (docs/step_trace.json). Rows are exclusive per op; the warp
    # triple and the noise bits get their own keys.
    kw, kps, kn = jax.random.split(key, 3)
    U = jax.random.uniform(kps, (17, B))
    col = lambda x: x[:, None, None, None]  # [B] -> broadcastable

    # --- horizontal flip (per-sample, reverse is free)
    if cfg.hflip_p > 0:
        do = col(U[0] < cfg.hflip_p)
        img = jnp.where(do, img[:, :, ::-1], img)
        masks = jnp.where(do, masks[:, :, ::-1], masks)

    # --- composed geometric warp (per-batch shared parameters by
    # default; per_sample_warp draws one parameter set per sample)
    if cfg.any_warp:
        shape = (B,) if cfg.per_sample_warp else ()
        angle, scale, ty, tx = draw_warp_params({"rot": kw}, cfg, shape,
                                                H, W)
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
        do = col(U[1] < cfg.brightness_contrast_p)
        alpha = col(1.0 + _rng(U[2], -cfg.contrast_limit,
                               cfg.contrast_limit))
        beta = col(_rng(U[3], -cfg.brightness_limit,
                        cfg.brightness_limit) * 255.0)
        img = jnp.where(do, jnp.clip(img * alpha + beta, 0, 255), img)

    # --- HSV jitter (per-sample, OpenCV scales)
    if cfg.hsv_p > 0:
        do = col(U[4] < cfg.hsv_p)
        dh = col(_rng(U[5], -cfg.hue_shift, cfg.hue_shift) / 180.0)
        ds = col(_rng(U[6], -cfg.sat_shift, cfg.sat_shift) / 255.0)
        dv = col(_rng(U[7], -cfg.val_shift, cfg.val_shift) / 255.0)
        h, s, v = _rgb_to_hsv(img / 255.0)
        out = _hsv_to_rgb((h[..., None] + dh)[..., 0] % 1.0,
                          jnp.clip((s[..., None] + ds)[..., 0], 0, 1),
                          jnp.clip((v[..., None] + dv)[..., 0], 0, 1))
        img = jnp.where(do, jnp.clip(out * 255.0, 0, 255), img)

    # --- ColorJitter (224 finetune, per-sample)
    if cfg.color_jitter_p > 0:
        do = col(U[8] < cfg.color_jitter_p)
        br = col(1.0 + _rng(U[9], -cfg.cj_brightness, cfg.cj_brightness))
        ct = col(1.0 + _rng(U[10], -cfg.cj_contrast, cfg.cj_contrast))
        st = col(1.0 + _rng(U[11], -cfg.cj_saturation, cfg.cj_saturation))
        hu = col(_rng(U[12], -cfg.cj_hue, cfg.cj_hue))
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
        do = col(U[13] < cfg.noise_p)
        var = col(_rng(U[14], cfg.noise_var[0], cfg.noise_var[1]))
        kd = jax.random.key_data(kn)  # threefry key = 2 x u32
        rk = jax.random.wrap_key_data(
            jnp.concatenate([kd, kd ^ jnp.uint32(0x9E3779B9)]),
            impl="rbg")  # seed from raw key data: no threefry block
        noise = jax.random.normal(rk, img.shape) * jnp.sqrt(var)
        img = jnp.where(do, jnp.clip(img + noise, 0, 255), img)

    # --- motion blur: 3-tap line, per-batch direction, per-sample gate
    if cfg.motion_blur_p > 0:
        do = col(U[15] < cfg.motion_blur_p)
        d = jnp.minimum((U[16, 0] * 4.0).astype(jnp.int32), 3)
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
