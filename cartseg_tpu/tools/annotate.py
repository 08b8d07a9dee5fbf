"""Interactive SAM-assisted annotation — the TPU rebuild of the
reference's HITL tools (src/create_testset.py,
src/data_preprocessing/create_hard_masks.py,
create_more_specific_data.py):

  * proposal masks come from a cartseg_tpu checkpoint running batched on
    TPU (replacing the hand-rolled torch UNet / smp model on GPU)
  * SAM ViT-B point/box prompting stays a host-side OPTIONAL dependency
    (`segment_anything` is interactive-only; gated import)
  * a prefetch thread computes proposals (and SAM embeddings when SAM
    is present) one image ahead of the UI (create_testset.py:163-198)
  * `seg_friendly` contrast-boost preprocessing
    (create_hard_masks.py:117-138), brush/box editing, morphological
    smoothing (create_testset.py:150-159), hole filling, skip markers
    (create_hard_masks.py:437-451), skip-existing resume

The interactive loop needs a display (cv2.imshow); everything else —
session state machine, preprocessing, prefetch, saving — is separable
and unit-tested headless.

Keys (reference bindings): s=save, r=reset, m=toggle smoothing,
f=fill holes, x=skip (writes a .skip marker), q/ESC=quit.
Mouse: drag=FG points, Shift+drag=BG points, Ctrl+drag=box.
"""

from __future__ import annotations

import csv
import dataclasses
import queue
import threading
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

from cartseg_tpu import geometry as G

IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff"}


# ------------------------------------------------------------ preproc

def seg_friendly(img_bgr: np.ndarray) -> np.ndarray:
    """Edge-preserving smooth + contrast boost + CLAHE + sharpen
    (create_hard_masks.py:117-138)."""
    import cv2

    img = cv2.bilateralFilter(img_bgr, d=15, sigmaColor=100, sigmaSpace=15)
    img = cv2.GaussianBlur(img, (0, 0), 1.5)
    img = cv2.convertScaleAbs(img, alpha=1.3, beta=0)
    lab = cv2.cvtColor(img, cv2.COLOR_BGR2LAB)
    L, A, B = cv2.split(lab)
    clahe = cv2.createCLAHE(clipLimit=4.0, tileGridSize=(4, 4))
    L = clahe.apply(L)
    bgr = cv2.cvtColor(cv2.merge([L, A, B]), cv2.COLOR_LAB2BGR)
    sharp = cv2.GaussianBlur(bgr, (0, 0), 1.0)
    return cv2.addWeighted(bgr, 1.5, sharp, -0.5, 0)


def smooth_mask(mask: np.ndarray, k: int = 5, iters: int = 1,
                blur_sigma: Optional[float] = None) -> np.ndarray:
    """close -> open -> gaussian -> threshold (create_testset.py:150-159)."""
    import cv2

    k = max(3, int(k) | 1)
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k))
    m = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, kernel, iterations=iters)
    m = cv2.morphologyEx(m, cv2.MORPH_OPEN, kernel, iterations=iters)
    if blur_sigma is None:
        blur_sigma = k / 2.0
    m = cv2.GaussianBlur(m, (0, 0), sigmaX=blur_sigma, sigmaY=blur_sigma)
    _, m = cv2.threshold(m, 127, 255, cv2.THRESH_BINARY)
    return m.astype(np.uint8)


def fill_holes(mask: np.ndarray) -> np.ndarray:
    """Fill inner contours (create_testset.py hole filler)."""
    import cv2

    m = (mask > 127).astype(np.uint8) * 255
    cnts, _ = cv2.findContours(m, cv2.RETR_CCOMP, cv2.CHAIN_APPROX_SIMPLE)
    out = m.copy()
    for cnt in cnts:
        cv2.drawContours(out, [cnt], 0, 255, -1)
    return out


# -------------------------------------------------------- TPU proposal

class TPUProposer:
    """Batched initial-mask proposals from a framework checkpoint —
    replaces the annotation tools' torch UNet inference
    (create_testset.py:173-181)."""

    def __init__(self, ckpt_dir: Path, encoder: str = "efficientnet-b0",
                 img_size: int = 512, imagenet_norm: bool = True,
                 side_padding_ratio: float = 0.1):
        from cartseg_tpu.infer.engine import load_member, ensemble_probs_fn
        from cartseg_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD

        member = load_member(Path(ckpt_dir), encoder)
        mean = IMAGENET_MEAN if imagenet_norm else (0, 0, 0)
        std = IMAGENET_STD if imagenet_norm else (1, 1, 1)
        self._fwd = ensemble_probs_fn([member], mean, std)
        self.threshold = member.threshold
        self.img_size = img_size
        self.side_padding_ratio = side_padding_ratio

    def propose(self, rgb: np.ndarray) -> np.ndarray:
        """RGB HxWx3 -> uint8 {0,255} proposal at img_size^2 in
        letterboxed space."""
        import cv2
        import jax.numpy as jnp

        lb = G.letterbox_side_pad(
            rgb, side_padding_ratio=self.side_padding_ratio)
        x = cv2.resize(lb, (self.img_size, self.img_size),
                       interpolation=cv2.INTER_LINEAR)
        probs = np.asarray(self._fwd(jnp.asarray(x[None])))[0]
        return ((probs >= self.threshold) * 255).astype(np.uint8)


# -------------------------------------------------------- optional SAM

def load_sam(checkpoint: Optional[Path] = None, model_type: str = "vit_b",
             backend: str = "auto"):
    """Returns a predictor with the SamPredictor interface, or None.

    backend='torch' uses the host `segment_anything` package exactly as
    the reference does (create_testset.py:94-96); backend='tpu' runs
    the Flax SAM ViT-B (models/sam.py) on the accelerator from the same
    official .pth checkpoint; 'auto' prefers torch when the package is
    installed and falls back to the TPU port when a checkpoint is
    given."""
    if backend in ("auto", "torch"):
        try:
            from segment_anything import sam_model_registry, SamPredictor
            sam = sam_model_registry[model_type](
                checkpoint=str(checkpoint) if checkpoint else None)
            return SamPredictor(sam)
        except ImportError:
            if backend == "torch":
                return None
    if checkpoint is None or model_type != "vit_b":
        return None
    from cartseg_tpu.models.sam import load_tpu_sam

    return load_tpu_sam(checkpoint)


# ------------------------------------------------------------- session

@dataclasses.dataclass
class SessionState:
    mask: np.ndarray          # uint8 {0,255}, working canvas
    apply_smoothing: bool = True
    smooth_k: int = 5
    smooth_iters: int = 1


class AnnotationSession:
    """The editing state machine behind the UI — headless-testable.

    Prompt results merge with OR (create_testset.py box/point merges);
    brush strokes paint directly; post ops are smoothing + hole fill.
    """

    def __init__(self, image_rgb: np.ndarray, proposal: Optional[np.ndarray],
                 predictor=None):
        import cv2

        self.image = image_rgb
        h, w = image_rgb.shape[:2]
        if proposal is not None and proposal.shape != (h, w):
            proposal = cv2.resize(proposal, (w, h),
                                  interpolation=cv2.INTER_NEAREST)
        self.state = SessionState(
            mask=(proposal.copy() if proposal is not None
                  else np.zeros((h, w), np.uint8)))
        self.predictor = predictor  # SamPredictor-like or None

    # --- post ops
    def _post(self, m: np.ndarray) -> np.ndarray:
        if self.state.apply_smoothing:
            m = smooth_mask(m, self.state.smooth_k, self.state.smooth_iters)
        return m

    # --- prompt ops (need a predictor)
    def apply_points(self, points: Sequence[Tuple[int, int]],
                     labels: Sequence[int]):
        if self.predictor is None or not points:
            return
        masks, _, _ = self.predictor.predict(
            point_coords=np.asarray(points), point_labels=np.asarray(labels),
            multimask_output=False)
        new = (masks[0] * 255).astype(np.uint8)
        self.state.mask = self._post(np.bitwise_or(self.state.mask, new))

    def apply_box(self, box: Tuple[int, int, int, int]):
        if self.predictor is None:
            return
        masks, _, _ = self.predictor.predict(
            box=np.asarray(box), multimask_output=False)
        new = (masks[0] * 255).astype(np.uint8)
        self.state.mask = self._post(np.bitwise_or(self.state.mask, new))

    # --- direct ops (no predictor needed)
    def brush(self, points: Sequence[Tuple[int, int]], label: int,
              radius: int = 6):
        import cv2

        for (x, y) in points:
            cv2.circle(self.state.mask, (int(x), int(y)), radius,
                       255 if label else 0, -1)

    def fill_holes(self):
        self.state.mask = fill_holes(self.state.mask)

    def reset(self):
        self.state.mask[:] = 0

    def toggle_smoothing(self):
        self.state.apply_smoothing = not self.state.apply_smoothing

    def overlay(self) -> np.ndarray:
        """Render the current mask tinted over the image."""
        out = self.image.astype(np.float32).copy()
        sel = self.state.mask > 127
        out[sel] = out[sel] * 0.55 + np.array([255, 0, 0]) * 0.45
        return out.astype(np.uint8)

    def save(self, path: Path, size: Optional[int] = None,
             orig_hw: Optional[Tuple[int, int]] = None,
             side_padding_ratio: float = 0.1):
        """Save at a fixed square size (512 for create_hard_masks, 224
        for create_more_specific_data) or, with orig_hw, un-letterboxed
        at original resolution (create_testset.py:391-396)."""
        import cv2

        m = self.state.mask
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        if orig_hw is not None:
            oh, ow = orig_hw
            m = G.remove_letterbox(m, ow, oh, side_padding_ratio)
        elif size is not None and m.shape != (size, size):
            m = cv2.resize(m, (size, size), interpolation=cv2.INTER_NEAREST)
        cv2.imwrite(str(path), m)


# ------------------------------------------------------------- prefetch

@dataclasses.dataclass
class PrefetchItem:
    path: Path
    image_rgb: np.ndarray      # preprocessed (seg_friendly+letterbox+resize)
    proposal: Optional[np.ndarray]
    orig_hw: Tuple[int, int]
    sam_features: object = None


class PrefetchWorker:
    """Compute-ahead thread: preprocess + TPU proposal (+ SAM embedding)
    for the next image while the human edits the current one
    (create_testset.py:163-198; queue bounded at 2)."""

    def __init__(self, paths: Sequence[Path], proposer: Optional[TPUProposer],
                 sam_predictor=None, img_size: int = 512,
                 make_easy: bool = True,
                 side_padding_ratio: float = 0.1):
        self.paths = list(paths)
        self.proposer = proposer
        self.sam = sam_predictor
        self.img_size = img_size
        self.make_easy = make_easy
        self.side_padding_ratio = side_padding_ratio
        self.queue: "queue.Queue" = queue.Queue(maxsize=2)
        self.stop_event = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def stop(self):
        self.stop_event.set()

    def _prep(self, path: Path) -> Optional[PrefetchItem]:
        import cv2

        bgr = cv2.imread(str(path), cv2.IMREAD_COLOR)
        if bgr is None:
            return None
        orig_hw = bgr.shape[:2]
        if self.make_easy:
            bgr = seg_friendly(bgr)
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        lb = G.letterbox_side_pad(
            rgb, side_padding_ratio=self.side_padding_ratio)
        disp = cv2.resize(lb, (self.img_size, self.img_size),
                          interpolation=cv2.INTER_LINEAR)
        proposal = self.proposer.propose(rgb) if self.proposer else None
        feats = None
        if self.sam is not None:
            self.sam.set_image(disp)
            feats = self.sam.get_image_embedding()
        return PrefetchItem(path, disp, proposal, orig_hw, feats)

    def _run(self):
        for p in self.paths:
            if self.stop_event.is_set():
                break
            try:
                item = self._prep(p)
            except Exception:
                item = None  # swallow like the reference (:241-243)
            if item is not None:
                self.queue.put(item)
        self.queue.put(None)

    def __iter__(self):
        while True:
            item = self.queue.get()
            if item is None:
                break
            yield item


# ---------------------------------------------------------- selection

def load_hard_candidates(csv_path: Path, limit: Optional[int] = None
                         ) -> List[Path]:
    """Top-ranked image paths from mine_hard_cases output
    (create_hard_masks.py:54-71)."""
    out = []
    with open(csv_path) as f:
        for row in csv.DictReader(f):
            out.append(Path(row["path"]))
            if limit and len(out) >= limit:
                break
    return out


def pending_paths(paths: Sequence[Path], out_dirs: Sequence[Path],
                  skip_dir: Optional[Path] = None) -> List[Path]:
    """Drop images already masked in any out dir or marked skipped
    (create_more_specific_data.py:161-172; .skip markers
    create_hard_masks.py:445-451)."""
    done = set()
    for d in out_dirs:
        d = Path(d)
        if d.exists():
            done |= {p.stem for p in d.rglob("*.png")}
    if skip_dir and Path(skip_dir).exists():
        done |= {p.stem for p in Path(skip_dir).glob("*.skip")}
    return [p for p in paths if p.stem not in done]


def write_skip_marker(skip_dir: Path, image_path: Path):
    skip_dir = Path(skip_dir)
    skip_dir.mkdir(parents=True, exist_ok=True)
    (skip_dir / f"{Path(image_path).stem}.skip").touch()


# ------------------------------------------------------------------ UI

def run_ui(paths: Sequence[Path], out_dir: Path,
           proposer: Optional[TPUProposer] = None,
           sam_checkpoint: Optional[Path] = None,
           img_size: int = 512, save_size: Optional[int] = 512,
           save_original_res: bool = False,
           make_easy: bool = True, display_scale: float = 1.0):
    """The interactive OpenCV loop (requires a display). Thin wrapper
    over AnnotationSession + PrefetchWorker."""
    import cv2

    out_dir = Path(out_dir)
    skip_dir = out_dir / "_skipped"
    sam = load_sam(sam_checkpoint) if sam_checkpoint else None
    todo = pending_paths(paths, [out_dir], skip_dir)
    worker = PrefetchWorker(todo, proposer, sam, img_size,
                            make_easy).start()

    ui = {"drawing": False, "box_active": False, "box_start": None,
          "box_end": None, "clicks": [], "label": 1}

    for item in worker:
        session = AnnotationSession(item.image_rgb, item.proposal, sam)
        if sam is not None and item.sam_features is not None:
            sam.features = item.sam_features  # inject precomputed embed

        def on_mouse(event, x, y, flags, _p):
            x = int(x / display_scale)
            y = int(y / display_scale)
            ctrl = bool(flags & cv2.EVENT_FLAG_CTRLKEY)
            shift = bool(flags & cv2.EVENT_FLAG_SHIFTKEY)
            if event == cv2.EVENT_LBUTTONDOWN:
                if ctrl:
                    ui.update(box_active=True, box_start=(x, y),
                              box_end=(x, y))
                else:
                    ui.update(drawing=True, label=0 if shift else 1,
                              clicks=[(x, y)])
            elif event == cv2.EVENT_MOUSEMOVE:
                if ui["box_active"]:
                    ui["box_end"] = (x, y)
                elif ui["drawing"]:
                    ui["clicks"].append((x, y))
            elif event == cv2.EVENT_LBUTTONUP:
                if ui["box_active"]:
                    ui["box_active"] = False
                    x1, y1 = ui["box_start"]
                    x2, y2 = ui["box_end"]
                    session.apply_box((min(x1, x2), min(y1, y2),
                                       max(x1, x2), max(y1, y2)))
                elif ui["drawing"]:
                    ui["drawing"] = False
                    pts = ui["clicks"]
                    if sam is not None:
                        session.apply_points(pts, [ui["label"]] * len(pts))
                    else:
                        session.brush(pts, ui["label"])

        win = "cartseg annotate"
        cv2.namedWindow(win)
        cv2.setMouseCallback(win, on_mouse)
        while True:
            disp = session.overlay()
            if display_scale != 1.0:
                disp = cv2.resize(disp, None, fx=display_scale,
                                  fy=display_scale)
            cv2.imshow(win, cv2.cvtColor(disp, cv2.COLOR_RGB2BGR))
            key = cv2.waitKey(30) & 0xFF
            if key == ord("s"):
                session.save(
                    out_dir / f"{item.path.stem}.png",
                    size=save_size,
                    orig_hw=item.orig_hw if save_original_res else None)
                break
            if key == ord("r"):
                session.reset()
            if key == ord("m"):
                session.toggle_smoothing()
            if key == ord("f"):
                session.fill_holes()
            if key == ord("x"):
                write_skip_marker(skip_dir, item.path)
                break
            if key in (ord("q"), 27):
                worker.stop()
                cv2.destroyAllWindows()
                return
        cv2.destroyAllWindows()
