"""Flax SAM (Segment Anything, ViT-B) — a TPU-native replacement for
the `segment_anything` host dependency the reference's annotation tools
import (src/create_testset.py:8,94-96 `sam_model_registry["vit_b"]` +
`SamPredictor`; src/data_preprocessing/create_hard_masks.py uses the
same predictor interface).

The reference runs SAM on CUDA purely as an interactive annotation
assistant: `set_image` → ViT-B image embedding (the slow part, done in
a prefetch thread, create_testset.py:163-198), then point/box
`predict` calls against the cached embedding. This module provides the
same three-part model (image encoder / prompt encoder / mask decoder)
as Flax NHWC modules jittable on TPU, plus:

  * `convert_torch_sam(state_dict)` — maps the official
    `sam_vit_b_*.pth` checkpoint naming onto the Flax param tree
    (weights themselves cannot be fetched in this zero-egress
    container; the converter is validated against a synthetically
    initialized tree using the official key names and shapes,
    tests/test_sam.py).
  * `TpuSamPredictor` — drop-in for `segment_anything.SamPredictor`
    as the annotation tool drives it (tools/annotate.py:178-193):
    `set_image`, `get_image_embedding`, `.features` injection, and
    `predict(point_coords=…, point_labels=…, box=…,
    multimask_output=…)`.

Architecture notes (kept faithful to the official modeling code so the
converter is weight-compatible):
  - image encoder: ViT-B/16, 12 layers, 768 dim, windowed attention
    (window 14) with global attention at layers {2,5,8,11}, decomposed
    relative position embeddings, 2-conv neck to 256ch.
  - prompt encoder: random-Fourier positional encoding, 4 point-type
    embeddings (neg/pos point, 2 box corners), dense no-mask embedding.
  - mask decoder: 2-layer two-way transformer (token<->image cross
    attention, downsample rate 2), 4 mask tokens + IoU token,
    2x2-stride transposed-conv upscaler, per-token hypernetwork MLPs.

Everything is NHWC; the decomposed-rel-pos attention and the two-way
transformer are plain XLA (einsums + softmax — MXU-friendly, nothing
here needs Pallas).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "SamConfig", "Sam", "ImageEncoderViT", "PromptEncoder", "MaskDecoder",
    "TpuSamPredictor", "convert_torch_sam", "build_sam_vit_b",
]


# ----------------------------------------------------------- config

@dataclasses.dataclass(frozen=True)
class SamConfig:
    """ViT-B defaults; shrink for tests (img_size=256, depth=2, ...)."""

    img_size: int = 1024
    patch_size: int = 16
    encoder_dim: int = 768
    encoder_depth: int = 12
    encoder_heads: int = 12
    encoder_mlp_ratio: float = 4.0
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    prompt_dim: int = 256
    mask_in_chans: int = 16
    decoder_heads: int = 8
    decoder_mlp_dim: int = 2048
    decoder_depth: int = 2
    num_multimask_outputs: int = 3
    mask_threshold: float = 0.0
    pixel_mean: Tuple[float, float, float] = (123.675, 116.28, 103.53)
    pixel_std: Tuple[float, float, float] = (58.395, 57.12, 57.375)
    # fp32 softmax in the ViT attention (official numerics). False keeps
    # the global blocks' (12, 4096, 4096) logits bf16 end-to-end with an
    # fp32-accumulated row sum -- measured quality/speed in
    # docs/sam_bench.json before flipping any default.
    attn_softmax_fp32: bool = True
    # route the global blocks through the Pallas flash-attention kernel
    # (ops/pallas/flash_attention.py): never materializes the
    # (12, 4096, 4096) logits; fp32 online softmax (official numerics).
    # Trainable (custom VJP — flash backward kernels, grads parity-
    # tested vs autodiff of the XLA lane). Measured faster in BOTH
    # modes — 1.33x inference (40.1 vs 53.3 ms/img,
    # docs/sam_bench.json) and 1.09x fine-tune-shaped fwd+bwd at
    # 1024^2 (107.6 vs 117.5 ms/step, docs/sam_train_bench.json) —
    # but stays False on the BARE model so its numerics are the
    # checkpoint-faithful XLA lane (1.0% max rel dev matters for
    # conversion-parity oracles); every perf surface opts in:
    # TpuSamPredictor defaults it ON.
    global_attn_flash: bool = False

    @property
    def embed_hw(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1


# ------------------------------------------------ image encoder (ViT)

def _get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray):
    """Slice the (2*size-1, head_dim) relative-position table into a
    (q_size, k_size, head_dim) lookup. q_size == k_size everywhere in
    SAM (window or full grid), so no interpolation branch is needed."""
    coords = (jnp.arange(q_size)[:, None] - jnp.arange(k_size)[None, :]
              + (k_size - 1))
    # jnp.asarray: params may arrive as numpy (torch-converted trees),
    # whose __getitem__ cannot take a traced index array under jit
    return jnp.asarray(rel_pos)[coords]


def _add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, hw):
    """attn: (B*nH, q_hw, k_hw); q: (B*nH, q_hw, head_dim)."""
    h, w = hw
    rh = _get_rel_pos(h, h, rel_pos_h)
    rw = _get_rel_pos(w, w, rel_pos_w)
    bnh = q.shape[0]
    r_q = q.reshape(bnh, h, w, -1)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, rh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, rw)
    attn = (attn.reshape(bnh, h, w, h, w)
            + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :])
    return attn.reshape(bnh, h * w, h * w)


class ViTAttention(nn.Module):
    """Multi-head attention over an (B, H, W, C) grid with decomposed
    relative position embeddings (official image_encoder.Attention)."""

    dim: int
    num_heads: int
    input_size: int           # H == W of the grid this block attends over
    dtype: jnp.dtype = jnp.float32
    softmax_fp32: bool = True
    use_flash: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(
            3, b * self.num_heads, h * w, head_dim)
        q, k, v = qkv[0], qkv[1], qkv[2]
        rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                           (2 * self.input_size - 1, head_dim))
        rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                           (2 * self.input_size - 1, head_dim))

        from cartseg_tpu.ops.pallas import flash_attention as fa

        if (self.use_flash and h == w == self.input_size
                and fa.supported(h, h * w, head_dim)):
            # same two small einsum factors the XLA lane computes; the
            # kernel rebuilds the (S, S) bias from them on the fly
            bnh = q.shape[0]
            r_q = q.reshape(bnh, h, w, head_dim)
            rh = _get_rel_pos(h, h, rel_h.astype(q.dtype))
            rw = _get_rel_pos(w, w, rel_w.astype(q.dtype))
            rel_hf = jnp.einsum("bhwc,hkc->bhwk", r_q, rh).reshape(
                bnh, h * w, h)
            rel_wf = jnp.einsum("bhwc,wkc->bhwk", r_q, rw).reshape(
                bnh, h * w, w)
            out = fa.flash_attention_relpos(
                q, k, v, rel_hf, rel_wf,
                scale=head_dim ** -0.5, grid_size=h)
            out = out.reshape(b, self.num_heads, h, w, head_dim)
            out = out.transpose(0, 2, 3, 1, 4).reshape(b, h, w, self.dim)
            return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)

        attn = (q * (head_dim ** -0.5)) @ k.transpose(0, 2, 1)
        attn = _add_decomposed_rel_pos(
            attn, q, rel_h.astype(attn.dtype), rel_w.astype(attn.dtype),
            (h, w))
        if self.softmax_fp32 or attn.dtype == jnp.float32:
            # official numerics: full softmax in fp32
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        else:
            # keep the (bnh, hw, hw) logits in bf16 end-to-end and only
            # accumulate the row-sum in fp32: for the global blocks the
            # fp32 materialization is 805 MB per block of pure HBM
            # traffic that the (already bf16) attn @ v discards anyway
            amax = jax.lax.stop_gradient(attn.max(axis=-1, keepdims=True))
            e = jnp.exp(attn - amax)
            s = e.sum(axis=-1, keepdims=True, dtype=jnp.float32)
            attn = e / s.astype(e.dtype)
        attn = attn.astype(v.dtype)
        out = (attn @ v).reshape(b, self.num_heads, h, w, head_dim)
        out = out.transpose(0, 2, 3, 1, 4).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


def _window_partition(x, window: int):
    b, h, w, c = x.shape
    ph, pw = (-h) % window, (-w) % window
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (hp, wp)


def _window_unpartition(wins, window: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = wins.shape[0] // (hp // window * wp // window)
    x = wins.reshape(b, hp // window, wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    window_size: int          # 0 => global attention
    grid_size: int            # full embedding grid (img/patch)
    dtype: jnp.dtype = jnp.float32
    softmax_fp32: bool = True
    use_flash: bool = False   # global blocks only

    @nn.compact
    def __call__(self, x):
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if self.window_size > 0:
            h, w = y.shape[1], y.shape[2]
            y, pad_hw = _window_partition(y, self.window_size)
            attn_size = self.window_size
        else:
            attn_size = self.grid_size
        y = ViTAttention(self.dim, self.num_heads, attn_size,
                         dtype=self.dtype, softmax_fp32=self.softmax_fp32,
                         use_flash=self.use_flash and self.window_size == 0,
                         name="attn")(y)
        if self.window_size > 0:
            y = _window_unpartition(y, self.window_size, pad_hw, (h, w))
        x = shortcut + y
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        y = nn.Dense(hidden, dtype=self.dtype, name="mlp_lin1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_lin2")(y)
        return x + y


class ImageEncoderViT(nn.Module):
    cfg: SamConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, img, img, 3) preprocessed floats -> (B, g, g, 256)."""
        c = self.cfg
        g = c.embed_hw
        y = nn.Conv(c.encoder_dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    dtype=self.dtype, name="patch_embed_proj")(x)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, g, g, c.encoder_dim))
        y = y + pos.astype(y.dtype)
        for i in range(c.encoder_depth):
            win = 0 if i in c.global_attn_indexes else c.window_size
            y = ViTBlock(c.encoder_dim, c.encoder_heads, c.encoder_mlp_ratio,
                         win, g, dtype=self.dtype,
                         softmax_fp32=c.attn_softmax_fp32,
                         use_flash=c.global_attn_flash,
                         name=f"block{i}")(y)
        y = nn.Conv(c.prompt_dim, (1, 1), use_bias=False, dtype=self.dtype,
                    name="neck_conv1")(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="neck_ln1")(y)
        y = nn.Conv(c.prompt_dim, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="neck_conv2")(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="neck_ln2")(y)
        return y


# ----------------------------------------------------- prompt encoder

class PromptEncoder(nn.Module):
    """Point/box/dense prompt embeddings (official prompt_encoder.py).
    Labels: 1 = positive point, 0 = negative point, -1 = padding,
    2/3 = box corners."""

    cfg: SamConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        d = c.prompt_dim
        # PositionEmbeddingRandom's gaussian matrix is a buffer in the
        # official code; kept as a param here so the converter loads it.
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, d // 2))
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0), (4, d))
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (1, d))
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, d))

    def _pe_encoding(self, coords01):
        """coords01 in [0,1] -> (…, prompt_dim) Fourier features."""
        coords = 2.0 * coords01 - 1.0
        coords = coords @ self.pe_gaussian.astype(coords.dtype)
        coords = 2.0 * jnp.pi * coords
        return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)

    def dense_pe(self):
        """(1, g, g, prompt_dim) positional encoding of the image grid."""
        g = self.cfg.embed_hw
        ys = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
        xs = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
        return self._pe_encoding(grid)[None]

    def embed_points(self, coords, labels):
        """coords: (B, N, 2) pixel xy in the model input frame;
        labels: (B, N) int. Returns (B, N, prompt_dim)."""
        c = self.cfg
        coords = (coords + 0.5) / c.img_size
        pe = self._pe_encoding(coords.astype(jnp.float32))
        lab = labels[..., None]
        out = jnp.where(lab == -1, self.not_a_point_embed[0], pe)
        out = jnp.where(lab == 0, out + self.point_embeddings[0], out)
        out = jnp.where(lab == 1, out + self.point_embeddings[1], out)
        out = jnp.where(lab == 2, out + self.point_embeddings[2], out)
        out = jnp.where(lab == 3, out + self.point_embeddings[3], out)
        return out

    def dense_no_mask(self, batch: int):
        g = self.cfg.embed_hw
        return jnp.broadcast_to(
            self.no_mask_embed.reshape(1, 1, 1, -1),
            (batch, g, g, self.cfg.prompt_dim))

    def __call__(self, coords, labels):
        # flax requires a __call__ for init; embed everything once.
        return (self.embed_points(coords, labels),
                self.dense_no_mask(coords.shape[0]), self.dense_pe())


# ------------------------------------------------------- mask decoder

class DecoderAttention(nn.Module):
    """q/k/v-projected attention with internal downsampling
    (official transformer.Attention)."""

    dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, key_mask=None):
        """key_mask: optional (B, Nk) bool — False keys are excluded
        from the softmax (used to make jit-bucket prompt padding
        attention-neutral, see TpuSamPredictor._pad_prompts)."""
        inner = self.dim // self.downsample_rate
        head_dim = inner // self.num_heads
        q = nn.Dense(inner, dtype=self.dtype, name="q_proj")(q)
        k = nn.Dense(inner, dtype=self.dtype, name="k_proj")(k)
        v = nn.Dense(inner, dtype=self.dtype, name="v_proj")(v)

        def split(x):
            b, n, _ = x.shape
            return x.reshape(b, n, self.num_heads, head_dim).transpose(
                0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        attn = (q / math.sqrt(head_dim)) @ k.transpose(0, 1, 3, 2)
        attn = attn.astype(jnp.float32)
        if key_mask is not None:
            attn = jnp.where(key_mask[:, None, None, :], attn, -1e9)
        attn = jax.nn.softmax(attn, axis=-1)
        out = attn.astype(v.dtype) @ v
        b, nh, n, hd = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, nh * hd)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_dim: int
    skip_first_layer_pe: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe, token_mask=None):
        # Decoder LayerNorms use torch nn.LayerNorm's default eps=1e-5
        # (official TwoWayTransformer), unlike the encoder/neck which
        # explicitly pass eps=1e-6 (ADVICE r2 low).
        if self.skip_first_layer_pe:
            queries = DecoderAttention(
                self.dim, self.num_heads, dtype=self.dtype,
                name="self_attn")(queries, queries, queries,
                                  key_mask=token_mask)
        else:
            q = queries + query_pe
            queries = queries + DecoderAttention(
                self.dim, self.num_heads, dtype=self.dtype,
                name="self_attn")(q, q, queries, key_mask=token_mask)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                               name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DecoderAttention(
            self.dim, self.num_heads, 2, dtype=self.dtype,
            name="cross_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                               name="norm2")(queries)

        y = nn.Dense(self.mlp_dim, dtype=self.dtype, name="mlp_lin1")(queries)
        y = nn.relu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_lin2")(y)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                               name="norm3")(queries + y)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DecoderAttention(
            self.dim, self.num_heads, 2, dtype=self.dtype,
            name="cross_attn_image_to_token")(k, q, queries,
                                              key_mask=token_mask)
        keys = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    cfg: SamConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding,
                 token_mask=None):
        """image_embedding/image_pe: (B, g, g, C); point_embedding:
        (B, N, C); token_mask: optional (B, N) bool, False = jit-bucket
        pad token to exclude from attention. Returns
        (queries (B,N,C), keys (B,g*g,C))."""
        c = self.cfg
        b, g1, g2, ch = image_embedding.shape
        keys = image_embedding.reshape(b, g1 * g2, ch)
        key_pe = jnp.broadcast_to(
            image_pe.reshape(1, g1 * g2, ch), keys.shape)
        queries = point_embedding
        for i in range(c.decoder_depth):
            queries, keys = TwoWayAttentionBlock(
                c.prompt_dim, c.decoder_heads, c.decoder_mlp_dim,
                skip_first_layer_pe=(i == 0), dtype=self.dtype,
                name=f"layer{i}")(queries, keys, point_embedding, key_pe,
                                  token_mask=token_mask)
        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + DecoderAttention(
            c.prompt_dim, c.decoder_heads, 2, dtype=self.dtype,
            name="final_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                               name="norm_final_attn")(queries)
        return queries, keys


class MaskDecoder(nn.Module):
    cfg: SamConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt,
                 dense_prompt, prompt_mask=None):
        """image_embeddings: (B, g, g, C) (already per-prompt-batch),
        sparse_prompt: (B, N, C), dense_prompt: (B, g, g, C),
        prompt_mask: optional (B, N) bool — False marks jit-bucket pad
        prompt tokens that must be attention-neutral (the iou/mask
        output tokens are always valid).
        Returns (masks (B, num_mask_tokens, 4g, 4g), iou (B, tokens))."""
        c = self.cfg
        d = c.prompt_dim
        nm = c.num_mask_tokens
        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, d))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (nm, d))
        b = sparse_prompt.shape[0]
        out_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        out_tokens = jnp.broadcast_to(out_tokens[None], (b,) + out_tokens.shape)
        tokens = jnp.concatenate(
            [out_tokens, sparse_prompt.astype(out_tokens.dtype)], axis=1)

        token_mask = None
        if prompt_mask is not None:
            token_mask = jnp.concatenate(
                [jnp.ones((b, 1 + nm), bool), prompt_mask], axis=1)
        src = image_embeddings + dense_prompt
        hs, src = TwoWayTransformer(c, dtype=self.dtype, name="transformer")(
            src, image_pe, tokens, token_mask=token_mask)
        iou_out = hs[:, 0]
        mask_out = hs[:, 1:1 + nm]

        g = image_embeddings.shape[1]
        src = src.reshape(b, g, g, d)
        y = nn.ConvTranspose(d // 4, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="upscale_conv1")(src)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         name="upscale_ln")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.ConvTranspose(d // 8, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="upscale_conv2")(y)
        y = jax.nn.gelu(y, approximate=False)   # (B, 4g, 4g, d//8)

        hyper = []
        for i in range(nm):
            t = mask_out[:, i]
            for j, feats in enumerate((d, d, d // 8)):
                t = nn.Dense(feats, dtype=self.dtype,
                             name=f"hyper_mlp{i}_lin{j}")(t)
                if j < 2:
                    t = nn.relu(t)
            hyper.append(t)
        hyper_in = jnp.stack(hyper, axis=1)          # (B, nm, d//8)
        up = y.reshape(b, -1, d // 8)                # (B, 16g^2, d//8)
        masks = jnp.einsum("bnc,bpc->bnp", hyper_in, up)
        masks = masks.reshape(b, nm, 4 * g, 4 * g)

        t = iou_out
        for j, feats in enumerate((d, d, nm)):
            t = nn.Dense(feats, dtype=self.dtype, name=f"iou_mlp_lin{j}")(t)
            if j < 2:
                t = nn.relu(t)
        return masks, t


# ------------------------------------------------------------ wrapper

class Sam(nn.Module):
    """Full model; `__call__` runs encoder+prompts+decoder end to end
    (used for init and the jitted one-shot path). The predictor calls
    the parts separately so the image embedding is computed once."""

    cfg: SamConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.image_encoder = ImageEncoderViT(self.cfg, self.dtype)
        self.prompt_encoder = PromptEncoder(self.cfg, self.dtype)
        self.mask_decoder = MaskDecoder(self.cfg, self.dtype)

    def preprocess(self, x_u8):
        """(B, H, W, 3) uint8/float RGB (longest side already resized
        to img_size) -> normalized, zero-padded (B, img, img, 3)."""
        c = self.cfg
        x = x_u8.astype(jnp.float32)
        mean = jnp.asarray(c.pixel_mean)
        std = jnp.asarray(c.pixel_std)
        x = (x - mean) / std
        ph = c.img_size - x.shape[1]
        pw = c.img_size - x.shape[2]
        return jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))

    def encode_image(self, x):
        return self.image_encoder(x)

    def decode(self, features, coords, labels, prompt_mask=None):
        """prompt_mask: optional (B, N) bool — False = jit-bucket pad
        token, excluded from attention so the output is bit-identical
        to running the un-padded prompt list (the official predictor's
        single label=-1 pad point, appended iff no box, is a REAL
        attended token and must be passed with mask True)."""
        sparse = self.prompt_encoder.embed_points(coords, labels)
        dense = self.prompt_encoder.dense_no_mask(coords.shape[0])
        pe = self.prompt_encoder.dense_pe()
        feats = jnp.broadcast_to(
            features, (coords.shape[0],) + features.shape[1:])
        return self.mask_decoder(feats, pe, sparse, dense,
                                 prompt_mask=prompt_mask)

    def __call__(self, x, coords, labels):
        feats = self.encode_image(self.preprocess(x))
        return self.decode(feats, coords, labels)


def build_sam_vit_b(dtype=jnp.float32, cfg: Optional[SamConfig] = None):
    return Sam(cfg or SamConfig(), dtype)


# ------------------------------------------------- torch .pth import

def _t(x):
    return np.ascontiguousarray(x)


def convert_torch_sam(state_dict, cfg: Optional[SamConfig] = None) -> dict:
    """Map an official `sam_vit_b_*.pth` state dict (torch tensors or
    numpy arrays keyed by the `segment_anything` module names) onto
    this file's Flax param tree. Returns {"params": ...}.

    Torch->Flax layout rules: Linear weight (out,in) -> (in,out);
    Conv2d (out,in,kh,kw) -> (kh,kw,in,out); ConvTranspose2d
    (in,out,kh,kw) -> (kh,kw,in,out); LayerNorm/LayerNorm2d keep (C).
    """
    c = cfg or SamConfig()

    sd = {}
    for k, v in state_dict.items():
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        sd[k] = arr

    def lin(prefix):
        return {"kernel": _t(sd[f"{prefix}.weight"].T),
                "bias": _t(sd[f"{prefix}.bias"])}

    def lin_nobias_ok(prefix):
        out = {"kernel": _t(sd[f"{prefix}.weight"].T)}
        if f"{prefix}.bias" in sd:
            out["bias"] = _t(sd[f"{prefix}.bias"])
        return out

    def conv(prefix, bias=True):
        out = {"kernel": _t(sd[f"{prefix}.weight"].transpose(2, 3, 1, 0))}
        if bias:
            out["bias"] = _t(sd[f"{prefix}.bias"])
        return out

    def convT(prefix):
        # torch ConvTranspose2d scatters: out[y*s+dy, x*s+dx] +=
        # in[y,x] * w[in, out, dy, dx] — the *gradient* of a conv.
        # flax nn.ConvTranspose (transpose_kernel=False) instead runs a
        # plain correlation over the zero-dilated input, so the torch
        # weight needs its spatial dims FLIPPED on top of the
        # (in,out,kh,kw)->(kh,kw,in,out) relayout; without the flip a
        # 2x2-stride-2 upscaler scrambles every 2x2 output block
        # (ADVICE r2 high; oracle test tests/test_sam.py::
        # test_convtranspose_matches_torch_oracle).
        w = sd[f"{prefix}.weight"].transpose(2, 3, 0, 1)[::-1, ::-1]
        return {"kernel": _t(w), "bias": _t(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"scale": _t(sd[f"{prefix}.weight"]),
                "bias": _t(sd[f"{prefix}.bias"])}

    enc = {"patch_embed_proj": conv("image_encoder.patch_embed.proj"),
           "pos_embed": _t(sd["image_encoder.pos_embed"]),
           "neck_conv1": conv("image_encoder.neck.0", bias=False),
           "neck_ln1": ln("image_encoder.neck.1"),
           "neck_conv2": conv("image_encoder.neck.2", bias=False),
           "neck_ln2": ln("image_encoder.neck.3")}
    for i in range(c.encoder_depth):
        p = f"image_encoder.blocks.{i}"
        enc[f"block{i}"] = {
            "norm1": ln(f"{p}.norm1"),
            "norm2": ln(f"{p}.norm2"),
            "attn": {"qkv": lin(f"{p}.attn.qkv"),
                     "proj": lin(f"{p}.attn.proj"),
                     "rel_pos_h": _t(sd[f"{p}.attn.rel_pos_h"]),
                     "rel_pos_w": _t(sd[f"{p}.attn.rel_pos_w"])},
            "mlp_lin1": lin(f"{p}.mlp.lin1"),
            "mlp_lin2": lin(f"{p}.mlp.lin2"),
        }

    pe = {"pe_gaussian":
          _t(sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]),
          "point_embeddings": _t(np.concatenate(
              [sd[f"prompt_encoder.point_embeddings.{i}.weight"]
               for i in range(4)], axis=0)),
          "not_a_point_embed": _t(sd["prompt_encoder.not_a_point_embed.weight"]),
          "no_mask_embed": _t(sd["prompt_encoder.no_mask_embed.weight"])}

    def attn(prefix):
        return {"q_proj": lin(f"{prefix}.q_proj"),
                "k_proj": lin(f"{prefix}.k_proj"),
                "v_proj": lin(f"{prefix}.v_proj"),
                "out_proj": lin(f"{prefix}.out_proj")}

    tr = {"final_attn_token_to_image":
          attn("mask_decoder.transformer.final_attn_token_to_image"),
          "norm_final_attn": ln("mask_decoder.transformer.norm_final_attn")}
    for i in range(c.decoder_depth):
        p = f"mask_decoder.transformer.layers.{i}"
        tr[f"layer{i}"] = {
            "self_attn": attn(f"{p}.self_attn"),
            "cross_attn_token_to_image": attn(f"{p}.cross_attn_token_to_image"),
            "cross_attn_image_to_token": attn(f"{p}.cross_attn_image_to_token"),
            "norm1": ln(f"{p}.norm1"), "norm2": ln(f"{p}.norm2"),
            "norm3": ln(f"{p}.norm3"), "norm4": ln(f"{p}.norm4"),
            "mlp_lin1": lin(f"{p}.mlp.lin1"),
            "mlp_lin2": lin(f"{p}.mlp.lin2"),
        }

    dec = {"iou_token": _t(sd["mask_decoder.iou_token.weight"]),
           "mask_tokens": _t(sd["mask_decoder.mask_tokens.weight"]),
           "transformer": tr,
           "upscale_conv1": convT("mask_decoder.output_upscaling.0"),
           "upscale_ln": ln("mask_decoder.output_upscaling.1"),
           "upscale_conv2": convT("mask_decoder.output_upscaling.3")}
    for i in range(c.num_mask_tokens):
        p = f"mask_decoder.output_hypernetworks_mlps.{i}"
        for j in range(3):
            dec[f"hyper_mlp{i}_lin{j}"] = lin(f"{p}.layers.{j}")
    for j in range(3):
        dec[f"iou_mlp_lin{j}"] = lin(
            f"mask_decoder.iou_prediction_head.layers.{j}")

    return {"params": {"image_encoder": enc, "prompt_encoder": pe,
                       "mask_decoder": dec}}


def official_sam_keys(cfg: Optional[SamConfig] = None):
    """The exact state-dict key set of the official checkpoint for this
    config (used by tests to validate the converter without the
    zero-egress-blocked weight file)."""
    c = cfg or SamConfig()
    keys = ["image_encoder.patch_embed.proj.weight",
            "image_encoder.patch_embed.proj.bias",
            "image_encoder.pos_embed"]
    for i in range(c.encoder_depth):
        p = f"image_encoder.blocks.{i}"
        keys += [f"{p}.norm1.weight", f"{p}.norm1.bias",
                 f"{p}.attn.rel_pos_h", f"{p}.attn.rel_pos_w",
                 f"{p}.attn.qkv.weight", f"{p}.attn.qkv.bias",
                 f"{p}.attn.proj.weight", f"{p}.attn.proj.bias",
                 f"{p}.norm2.weight", f"{p}.norm2.bias",
                 f"{p}.mlp.lin1.weight", f"{p}.mlp.lin1.bias",
                 f"{p}.mlp.lin2.weight", f"{p}.mlp.lin2.bias"]
    keys += ["image_encoder.neck.0.weight", "image_encoder.neck.1.weight",
             "image_encoder.neck.1.bias", "image_encoder.neck.2.weight",
             "image_encoder.neck.3.weight", "image_encoder.neck.3.bias"]
    keys += ["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix",
             "prompt_encoder.not_a_point_embed.weight",
             "prompt_encoder.no_mask_embed.weight"]
    keys += [f"prompt_encoder.point_embeddings.{i}.weight" for i in range(4)]
    # mask_downscaling exists in the checkpoint but feeds the optional
    # mask-prompt path the annotation tools never use; the converter
    # ignores it (documented).
    keys += [f"prompt_encoder.mask_downscaling.{i}.{w}"
             for i in (0, 1, 3, 4, 6) for w in ("weight", "bias")]
    for i in range(c.decoder_depth):
        p = f"mask_decoder.transformer.layers.{i}"
        for a in ("self_attn", "cross_attn_token_to_image",
                  "cross_attn_image_to_token"):
            for pr in ("q_proj", "k_proj", "v_proj", "out_proj"):
                keys += [f"{p}.{a}.{pr}.weight", f"{p}.{a}.{pr}.bias"]
        for n in ("norm1", "norm2", "norm3", "norm4"):
            keys += [f"{p}.{n}.weight", f"{p}.{n}.bias"]
        keys += [f"{p}.mlp.lin1.weight", f"{p}.mlp.lin1.bias",
                 f"{p}.mlp.lin2.weight", f"{p}.mlp.lin2.bias"]
    p = "mask_decoder.transformer.final_attn_token_to_image"
    for pr in ("q_proj", "k_proj", "v_proj", "out_proj"):
        keys += [f"{p}.{pr}.weight", f"{p}.{pr}.bias"]
    keys += ["mask_decoder.transformer.norm_final_attn.weight",
             "mask_decoder.transformer.norm_final_attn.bias",
             "mask_decoder.iou_token.weight", "mask_decoder.mask_tokens.weight",
             "mask_decoder.output_upscaling.0.weight",
             "mask_decoder.output_upscaling.0.bias",
             "mask_decoder.output_upscaling.1.weight",
             "mask_decoder.output_upscaling.1.bias",
             "mask_decoder.output_upscaling.3.weight",
             "mask_decoder.output_upscaling.3.bias"]
    for i in range(c.num_mask_tokens):
        for j in range(3):
            keys += [f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}.weight",
                     f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}.bias"]
    for j in range(3):
        keys += [f"mask_decoder.iou_prediction_head.layers.{j}.weight",
                 f"mask_decoder.iou_prediction_head.layers.{j}.bias"]
    return keys


# ----------------------------------------------------------- predictor

class TpuSamPredictor:
    """Drop-in for `segment_anything.SamPredictor` as the annotation
    tool uses it (tools/annotate.py): set_image / get_image_embedding /
    `.features` injection / predict(point_coords, point_labels, box,
    multimask_output). The image embedding and decoder both run as
    jitted TPU programs; prompt counts are padded to a small fixed set
    of sizes so jit signatures stay stable (CLAUDE.md)."""

    _PAD_SIZES = (2, 4, 8, 16, 32, 64)

    def __init__(self, variables: dict, cfg: Optional[SamConfig] = None,
                 dtype=jnp.float32):
        # inference path: default the global blocks onto the Pallas
        # flash-attention lane — measured 40.1 vs 53.3 ms/img on chip
        # (docs/sam_bench.json, 2026-08-18), 1.0% max rel embedding dev
        # vs the fp32-softmax lane. The base SamConfig keeps it off to
        # stay checkpoint-faithful by default (the kernel is trainable
        # — custom VJP); pass an explicit cfg to override.
        self.cfg = cfg or SamConfig(global_attn_flash=True)
        self.model = Sam(self.cfg, dtype)
        # device-resident jnp leaves (converted trees arrive as numpy)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
        self.variables = variables
        self.features = None
        self._orig_hw: Optional[Tuple[int, int]] = None
        self._input_hw: Optional[Tuple[int, int]] = None

        mdl = self.model

        # params are jit ARGUMENTS, not closure constants: a closed-over
        # 93.7M-param tree would be baked into the HLO as 375 MB of
        # literals (too large for the remote-compile transport, and
        # re-staged on every recompile)
        @jax.jit
        def _encode(v, x):
            return mdl.apply(v, mdl.preprocess(x),
                             method=mdl.encode_image)

        @jax.jit
        def _decode(v, features, coords, labels, prompt_mask):
            return mdl.apply(v, features, coords, labels, prompt_mask,
                             method=mdl.decode)

        self._encode = lambda x: _encode(self.variables, x)
        self._decode = lambda f, c, l, m: _decode(
            self.variables, f, c, l, m)

    # --- SamPredictor API
    def set_image(self, image_rgb: np.ndarray):
        import cv2

        h, w = image_rgb.shape[:2]
        self._orig_hw = (h, w)
        scale = self.cfg.img_size / max(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        self._input_hw = (nh, nw)
        resized = cv2.resize(image_rgb, (nw, nh),
                             interpolation=cv2.INTER_LINEAR)
        self.features = self._encode(jnp.asarray(resized[None]))
        return self.features

    def get_image_embedding(self):
        return self.features

    def _pad_prompts(self, coords: np.ndarray, labels: np.ndarray):
        """Pad the real token list to a jit-bucket size. Real tokens
        (mask True) reproduce the official predictor exactly — the
        caller has already appended the official single label=-1 pad
        point iff no box was given; everything past `n` is a bucket
        filler excluded from attention via the mask, so the decoder
        output is invariant to the bucket size (tests/test_sam.py::
        test_bucket_padding_is_attention_neutral)."""
        n = len(labels)
        size = next((s for s in self._PAD_SIZES if s >= n), None)
        if size is None:
            # beyond the ladder: round up to the next multiple of the
            # top rung so a long annotation session recompiles at most
            # once every 64 clicks instead of on every click
            top = self._PAD_SIZES[-1]
            size = ((n + top - 1) // top) * top
            import warnings
            warnings.warn(
                f"{n} prompt tokens exceeds the compiled pad ladder "
                f"(max {top}); padding to {size} — expect a one-off "
                "recompile (20-450 s on the relayed runtime)")
        pc = np.zeros((1, size, 2), np.float32)
        pl = np.full((1, size), -1, np.int32)
        pm = np.zeros((1, size), bool)
        pc[0, :n] = coords
        pl[0, :n] = labels
        pm[0, :n] = True
        return jnp.asarray(pc), jnp.asarray(pl), jnp.asarray(pm)

    def predict(self, point_coords=None, point_labels=None, box=None,
                mask_input=None, multimask_output: bool = True,
                return_logits: bool = False):
        if self.features is None:
            raise RuntimeError("call set_image first")
        if mask_input is not None:
            raise NotImplementedError(
                "mask prompts are not used by the annotation tools")
        oh, ow = self._orig_hw
        scale = self.cfg.img_size / max(oh, ow)
        pts, labs = [], []
        if point_coords is not None:
            pts += [np.asarray(point_coords, np.float32) * scale]
            labs += [np.asarray(point_labels, np.int32)]
        if box is None:
            # official PromptEncoder._embed_points(pad=True): exactly
            # one REAL (0,0)/label=-1 pad point is appended iff no box
            # is given (and none when a box is present) — it is
            # attended like any other token, unlike our bucket fillers
            pts += [np.zeros((1, 2), np.float32)]
            labs += [np.asarray([-1], np.int32)]
        else:
            b = np.asarray(box, np.float32).reshape(2, 2) * scale
            pts += [b]
            labs += [np.asarray([2, 3], np.int32)]
        if point_coords is None and box is None:
            raise ValueError(
                "predict() needs point_coords and/or box "
                "(SamPredictor.predict has the same requirement)")
        coords = np.concatenate(pts, axis=0)
        labels = np.concatenate(labs, axis=0)
        jc, jl, jm = self._pad_prompts(coords, labels)
        masks, iou = self._decode(self.features, jc, jl, jm)

        masks = self._postprocess(masks)
        iou = np.asarray(iou)[0]
        masks = np.asarray(masks)[0]
        if multimask_output:
            masks, iou = masks[1:], iou[1:]
        else:
            masks, iou = masks[:1], iou[:1]
        if not return_logits:
            masks = masks > self.cfg.mask_threshold
        return masks, iou, None

    def _postprocess(self, masks):
        """(B, nm, 4g, 4g) low-res logits -> original resolution
        (official Sam.postprocess_masks: upsample to img_size, crop the
        un-padded region, upsample to the original size)."""
        c = self.cfg
        b, nm = masks.shape[:2]
        ih, iw = self._input_hw
        oh, ow = self._orig_hw
        m = jax.image.resize(masks, (b, nm, c.img_size, c.img_size),
                             method="bilinear")
        m = m[:, :, :ih, :iw]
        return jax.image.resize(m, (b, nm, oh, ow), method="bilinear")


def load_tpu_sam(checkpoint_path, cfg: Optional[SamConfig] = None,
                 dtype=jnp.float32) -> TpuSamPredictor:
    """Build a TpuSamPredictor from an official torch .pth checkpoint
    (torch is used only to deserialize the file)."""
    import torch

    sd = torch.load(checkpoint_path, map_location="cpu",
                    weights_only=True)
    variables = convert_torch_sam(sd, cfg)
    return TpuSamPredictor(variables, cfg, dtype)
