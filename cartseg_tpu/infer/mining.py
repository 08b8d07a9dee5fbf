"""Active-learning hard-case mining — reference mine_hard_cases.py.

Per image (batched on TPU, vs the reference's bs=1 host loop :168):
mean entropy (:71-73), fraction near threshold (:75-76), flip-TTA
variance (:78-81), component count (:93-95), hole fraction (:97-113),
perimeter/area (:86-91), composite score (:189-190):

  0.35*ent + 0.25*near + 0.20*ttaVar + 0.10*holes
  + 0.10*min(P/A / 0.2, 1) + 0.05*min(components, 3)

Perimeter uses the boundary-pixel count (device) instead of cv2
arcLength — monotonically equivalent for ranking purposes.
Outputs hard_candidates.csv ranked by descending composite.
"""

from __future__ import annotations

import dataclasses
import random
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from cartseg_tpu import geometry as G
from cartseg_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD
from cartseg_tpu.infer.engine import EnsembleMember, ensemble_probs_fn, entropy_map
from cartseg_tpu.ops.connected_components import count_components
from cartseg_tpu.ops.morphology import fill_holes_from_border
from cartseg_tpu.ops.edges import mask_boundary

IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff"}


@dataclasses.dataclass
class MiningConfig:
    images_root: str = ""
    out_dir: str = "hard_mining"
    img_size: int = 512
    side_padding_ratio: float = 0.1
    imagenet_norm: bool = True
    threshold: float = 0.5
    delta_near: float = 0.05
    batch_size: int = 16
    sample_size: Optional[int] = 5000
    seed: int = 1337
    save_previews: bool = False
    preview_top_k: int = 50
    # batch-parallel scoring over the 1-D data mesh when >1 device is
    # visible and batch_size divides them (same semantics as
    # PseudoLabelConfig.use_mesh / the train engine)
    use_mesh: bool = True


def _metrics_body(threshold: float, delta: float):
    """Batched metrics body (no per-image vmap): both CC passes run on
    the whole [B,H,W] batch so they dispatch to the Pallas VMEM CC
    fixpoint on TPU, exactly like the pseudo-label program's cleanup —
    the round-4 version vmapped count_components/fill_holes per image,
    which kept the label propagation in the XLA while_loop lane."""

    def metrics(probs, probs_flip):
        from cartseg_tpu.ops.connected_components import (
            connected_components, per_pixel_component_any)

        p_mean = (probs + probs_flip) / 2.0
        ent = jnp.mean(entropy_map(p_mean, 1e-7), axis=(1, 2))
        near = jnp.mean((jnp.abs(p_mean - 0.5) < delta)
                        .astype(jnp.float32), axis=(1, 2))
        var = jnp.mean(jnp.stack([probs, probs_flip]).var(axis=0),
                       axis=(1, 2))
        m01 = p_mean > threshold
        B, H, W = m01.shape

        # component count: roots of the min-index labeling, per image
        labels = connected_components(m01)
        idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
        comps = jnp.sum((m01 & (labels == idx)).astype(jnp.int32),
                        axis=(1, 2))

        # hole fraction: bg not flood-reachable from the border
        # (4-connectivity, as cv2.floodFill — morphology.py
        # fill_holes_from_border, batched inline)
        bg = ~m01
        border = jnp.zeros((H, W), bool).at[0, :].set(True) \
            .at[-1, :].set(True).at[:, 0].set(True).at[:, -1].set(True)
        labels_bg = connected_components(bg, connectivity=4)
        outside = per_pixel_component_any(labels_bg, border & bg)
        holes = bg & ~outside
        area = jnp.sum(m01, axis=(1, 2))
        hole_frac = jnp.where(
            area > 0,
            jnp.sum(holes, axis=(1, 2)) / jnp.maximum(area, 1), 0.0)

        per = jnp.sum(mask_boundary(m01), axis=(1, 2))
        per_area = jnp.where(
            area > 0, per / (area.astype(jnp.float32) + 1e-7), 0.0)

        score = (0.35 * ent + 0.25 * near + 0.20 * var
                 + 0.10 * hole_frac
                 + 0.10 * jnp.minimum(per_area / 0.2, 1.0)
                 + 0.05 * jnp.minimum(comps.astype(jnp.float32), 3.0))
        return {"entropy_mean": ent, "frac_near_0p5": near,
                "tta_var_mean": var,
                "components": comps.astype(jnp.int32),
                "hole_fraction": hole_frac,
                "perimeter_over_area": per_area, "composite": score}

    return metrics


def mining_program(members: Sequence[EnsembleMember], mean, std,
                   threshold: float, delta_near: float):
    """The whole per-batch mining computation as ONE jitted program:
    fn(images_u8 [B,H,W,3]) -> dict of per-image metric arrays [B].

    Fuses what round 4 ran as TWO dispatches (ensemble+TTA forward,
    then metrics) and makes both CC passes whole-batch so they hit the
    Pallas VMEM fixpoint directly. Measured honestly
    (benchmarks/mining_bench.py, docs/BENCHMARKS.md): at steady state
    fused == two-dispatch (queued dispatches pipeline under the
    100-220 ms of device time; and the vmapped legacy path reaches the
    same batched kernel through CC's batching rule) — the fused form
    is the default for structure (one executable, one readback per
    batch), not a steady-state throughput win. Math identical to
    forward + _metrics_fn
    (tests/test_infer.py::test_mining_fused_program_matches_separate).
    Reference: mine_hard_cases.py:138-254 runs this per image (bs=1)
    on the host."""
    from cartseg_tpu.infer.engine import _ensemble_forward_body, _tta_body

    forward_tta = _tta_body(_ensemble_forward_body(members, mean, std))
    body = _metrics_body(threshold, delta_near)

    @jax.jit
    def program(images_u8):
        probs, probs_flip = forward_tta(images_u8)
        return body(probs, probs_flip)

    return program


def _metrics_fn(threshold: float, delta: float):
    @jax.jit
    def metrics(probs, probs_flip):
        p_mean = (probs + probs_flip) / 2.0
        ent = jnp.mean(entropy_map(p_mean, 1e-7), axis=(1, 2))
        near = jnp.mean((jnp.abs(p_mean - 0.5) < delta)
                        .astype(jnp.float32), axis=(1, 2))
        var = jnp.mean(jnp.stack([probs, probs_flip]).var(axis=0),
                       axis=(1, 2))
        m01 = p_mean > threshold

        def per_image(m):
            comps = count_components(m)
            filled = fill_holes_from_border(m)
            holes = filled & ~m
            area = jnp.sum(m)
            hole_frac = jnp.where(area > 0,
                                  jnp.sum(holes) / jnp.maximum(area, 1), 0.0)
            per = jnp.sum(mask_boundary(m))
            per_area = jnp.where(area > 0,
                                 per / (area.astype(jnp.float32) + 1e-7), 0.0)
            return comps, hole_frac, per_area

        comps, hole_frac, per_area = jax.vmap(per_image)(m01)
        score = (0.35 * ent + 0.25 * near + 0.20 * var
                 + 0.10 * hole_frac
                 + 0.10 * jnp.minimum(per_area / 0.2, 1.0)
                 + 0.05 * jnp.minimum(comps.astype(jnp.float32), 3.0))
        return {"entropy_mean": ent, "frac_near_0p5": near,
                "tta_var_mean": var,
                "components": comps.astype(jnp.int32),
                "hole_fraction": hole_frac,
                "perimeter_over_area": per_area, "composite": score}

    return metrics


def mine_hard_cases(members: Sequence[EnsembleMember], cfg: MiningConfig,
                    log=print):
    import cv2
    import pandas as pd

    root = Path(cfg.images_root)
    out_dir = Path(cfg.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    imgs = sorted(p for p in root.rglob("*")
                  if p.suffix.lower() in IMG_EXTS)
    log(f"Found {len(imgs)} images total.")
    rng = random.Random(cfg.seed)
    if cfg.sample_size is not None and len(imgs) > cfg.sample_size:
        imgs = rng.sample(imgs, cfg.sample_size)
        sdir = out_dir / "sampling"
        sdir.mkdir(parents=True, exist_ok=True)
        with open(sdir / f"sampled_images_seed{cfg.seed}_n{len(imgs)}.txt",
                  "w") as f:
            f.writelines(str(p) + "\n" for p in imgs)

    mean = IMAGENET_MEAN if cfg.imagenet_norm else (0, 0, 0)
    std = IMAGENET_STD if cfg.imagenet_norm else (1, 1, 1)
    program = mining_program(members, mean, std, cfg.threshold,
                             cfg.delta_near)

    # data-parallel mesh with the engine's loud-fallback semantics
    batch_sh = None
    if cfg.use_mesh:
        from cartseg_tpu.parallel.mesh import shard_inference_program
        program, batch_sh = shard_inference_program(
            program, cfg.batch_size, n_sharded_args=1,
            name="mine_hard_cases", log=log)

    rows = []
    S = cfg.img_size
    batch, metas = [], []

    def flush():
        nonlocal batch, metas
        if not batch:
            return
        # tail cycle-padded to the compiled batch shape (one trace);
        # only metas rows are read back out
        pad = (-len(batch)) % cfg.batch_size
        stacked = np.stack(batch + [batch[0]] * pad)
        # device_put the host array with its sharding directly (a
        # jnp.asarray first would double the H2D through device 0)
        jimgs = (jax.device_put(stacked, batch_sh)
                 if batch_sh is not None else jnp.asarray(stacked))
        out = {k: np.asarray(v) for k, v in program(jimgs).items()}
        for i, p in enumerate(metas):
            rows.append({"path": str(p),
                         **{k: float(out[k][i]) for k in out}})
        batch, metas = [], []

    for p in imgs:
        bgr = cv2.imread(str(p), cv2.IMREAD_COLOR)
        if bgr is None:
            continue
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        lb = G.letterbox_side_pad(
            rgb, side_padding_ratio=cfg.side_padding_ratio)
        batch.append(cv2.resize(lb, (S, S),
                                interpolation=cv2.INTER_LINEAR))
        metas.append(p)
        if len(batch) == cfg.batch_size:
            flush()
    flush()

    df = pd.DataFrame(rows)
    if df.empty:
        log("No rows to save. Check image paths.")
        return None
    df = df.sort_values("composite", ascending=False).reset_index(drop=True)
    csv_path = out_dir / "hard_candidates.csv"
    df.to_csv(csv_path, index=False)
    log(f"Saved {len(df)} rows to {csv_path}")

    if cfg.save_previews:
        fwd = ensemble_probs_fn(members, mean, std, tta_flip=True)
        _save_previews(df.head(cfg.preview_top_k), fwd, cfg, out_dir, log)
    return df


def _save_previews(df, fwd, cfg: MiningConfig, out_dir: Path, log):
    """Triptych previews for the top-ranked candidates
    (mine_hard_cases.py:215-252): image | prob heatmap | mask overlay.

    Previews need the probability maps, which the fused scoring
    program does not return, so this pass compiles its own
    ensemble+TTA executable — ONCE: inference runs at cfg.batch_size
    with the tail cycle-padded, so a bs-1 tail can't trigger a second
    multi-minute compile on this runtime."""
    import cv2

    pdir = out_dir / "previews"
    pdir.mkdir(parents=True, exist_ok=True)
    S = cfg.img_size
    imgs, ranks, paths = [], [], []
    for rank, row in df.iterrows():
        bgr = cv2.imread(row["path"], cv2.IMREAD_COLOR)
        if bgr is None:
            continue
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        lb = G.letterbox_side_pad(
            rgb, side_padding_ratio=cfg.side_padding_ratio)
        imgs.append(cv2.resize(lb, (S, S),
                               interpolation=cv2.INTER_LINEAR))
        ranks.append(rank)
        paths.append(row["path"])
    if not imgs:
        return
    n_real = len(imgs)
    pad = (-n_real) % cfg.batch_size
    imgs = imgs + [imgs[0]] * pad
    probs_all = []
    for i in range(0, len(imgs), cfg.batch_size):
        probs, probs_flip = fwd(jnp.asarray(
            np.stack(imgs[i:i + cfg.batch_size])))
        probs_all.append(np.asarray((probs + probs_flip) / 2.0))
    probs_all = np.concatenate(probs_all)[:n_real]

    for k in range(n_real):
        img, p = imgs[k], probs_all[k]
        heat = cv2.applyColorMap((p * 255).astype(np.uint8),
                                 cv2.COLORMAP_JET)
        m = (p > cfg.threshold).astype(np.uint8)
        overlay = img.copy()
        cnts, _ = cv2.findContours(m, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
        cv2.drawContours(overlay, cnts, -1, (255, 0, 0), 2)
        panel = np.concatenate(
            [cv2.cvtColor(img, cv2.COLOR_RGB2BGR), heat,
             cv2.cvtColor(overlay, cv2.COLOR_RGB2BGR)], axis=1)
        cv2.imwrite(
            str(pdir / f"{ranks[k]:04d}_{Path(paths[k]).stem}.png"),
            panel)
    log(f"Saved {n_real} previews to {pdir}")
