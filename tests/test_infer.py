"""Inference/self-training toolchain: ensemble math, QC stats vs numpy
oracles, end-to-end pseudo-label generation, mining, ranking."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cartseg_tpu.infer import (
    EnsembleMember, ensemble_probs_fn, qc_stats_fn, pseudo_label_program,
    PseudoLabelConfig, QCThresholds, generate_pseudo_labels, should_accept,
    MiningConfig, mine_hard_cases,
    RankingConfig, rank_pseudo_masks, score_sample,
)
from cartseg_tpu.models import build_model, init_model
from cartseg_tpu.data import make_synthetic_tree


def _members(n=2, seed=0, img=32):
    model = build_model("classic", dtype=jnp.float32)
    out = []
    for i in range(n):
        v = init_model(model, jax.random.key(seed + i), (1, img, img, 3))
        v.setdefault("batch_stats", {})
        out.append(EnsembleMember(_LogitWrap(model), v, 1.0 if i == 0 else 3.0))
    return out


class _LogitWrap:
    """ClassicUNet outputs probabilities; the ensemble code applies
    sigmoid to logits — wrap to provide a logit-like output."""

    def __init__(self, model):
        self.model = model

    def apply(self, variables, x, train=False):
        p = self.model.apply({"params": variables["params"]}, x, train=train)
        eps = 1e-6
        return jnp.log(p + eps) - jnp.log1p(-p + eps)


def test_ensemble_weighted_mean(rng):
    members = _members(2)
    fwd = ensemble_probs_fn(members, (0, 0, 0), (1, 1, 1))
    x = rng.integers(0, 255, (2, 32, 32, 3), np.uint8)
    probs = np.asarray(fwd(jnp.asarray(x)))
    # manual: w-normalized sigma-mean
    manual = 0.0
    ws = np.array([1.0, 3.0]) / 4.0
    for m, w in zip(members, ws):
        logits = m.model.apply(m.variables, jnp.asarray(x).astype(jnp.float32) / 255.0)
        manual = manual + w * np.asarray(jax.nn.sigmoid(logits[..., 0]))
    np.testing.assert_allclose(probs, manual, atol=1e-5)


def test_tta_flip_consistency(rng):
    members = _members(1)
    fwd = ensemble_probs_fn(members, (0, 0, 0), (1, 1, 1), tta_flip=True)
    x = rng.integers(0, 255, (1, 32, 32, 3), np.uint8)
    p, pf = fwd(jnp.asarray(x))
    # flipping the input must give the unflipped-prob mirror
    p2, _ = fwd(jnp.asarray(x[:, :, ::-1]))
    np.testing.assert_allclose(np.asarray(pf), np.asarray(p2)[:, :, ::-1],
                               atol=1e-5)


def test_qc_stats_match_numpy(rng):
    probs = rng.random((2, 32, 32)).astype(np.float32)
    probs_flip = rng.random((2, 32, 32)).astype(np.float32)
    imgs = rng.integers(0, 255, (2, 32, 32, 3), np.uint8)
    qc = qc_stats_fn()
    out = {k: np.asarray(v) for k, v in
           qc(jnp.asarray(probs), jnp.asarray(probs_flip),
              jnp.asarray(imgs), 0.5).items()}
    for b in range(2):
        p = probs[b]
        assert out["fg_area"][b] == pytest.approx((p >= 0.5).mean(), abs=1e-6)
        assert out["fg_conf"][b] == pytest.approx(
            np.median(np.abs(p - 0.5) * 2.0), abs=1e-5)
        pe = np.clip(p, 1e-6, 1 - 1e-6)
        ent = -(pe * np.log(pe) + (1 - pe) * np.log(1 - pe)).mean()
        assert out["mean_entropy"][b] == pytest.approx(ent, abs=1e-5)
        a, f = p >= 0.5, probs_flip[b] >= 0.5
        iou = (a & f).sum() / max((a | f).sum(), 1)
        assert out["tta_iou"][b] == pytest.approx(iou, abs=1e-5)


def test_fused_program_matches_separate_calls(rng):
    """pseudo_label_program (one dispatch) must be bit-equal in math to
    the ensemble_probs_fn + CC-clean + qc_stats_fn sequence it fused."""
    from cartseg_tpu.ops.connected_components import remove_small_components

    members = _members(2)
    x = jnp.asarray(rng.integers(0, 255, (3, 32, 32, 3), np.uint8))
    min_area = 4
    program = pseudo_label_program(members, (0, 0, 0), (1, 1, 1), min_area)
    pred, probs, stats = program(x, 0.5)

    fwd = ensemble_probs_fn(members, (0, 0, 0), (1, 1, 1), tta_flip=True)
    qc = qc_stats_fn()
    p_ref, pf_ref = fwd(x)
    pred_ref = jax.vmap(lambda m: remove_small_components(m, min_area))(
        p_ref >= 0.5)
    stats_ref = qc(p_ref, pf_ref, x, 0.5)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(p_ref),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(pred_ref))
    for k in ("fg_conf", "mean_entropy", "tta_iou", "edge_hit"):
        np.testing.assert_allclose(np.asarray(stats[k]),
                                   np.asarray(stats_ref[k]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(stats["fg_area"]),
        np.asarray(pred_ref).reshape(3, -1).mean(axis=1), atol=1e-6)


def test_fused_program_under_sharded_pjit(rng):
    """Batch-parallel pseudo-labeling on a device mesh: the COMPLETE
    fused program (ensemble + TTA + Pallas-CC clean + QC) jitted with
    data-sharded inputs over all 8 CPU devices must reproduce the
    single-device result exactly. This is the multi-chip serving story
    for create_pseudo_labels_gpu.py's batched path — DP over ICI with
    XLA inserting any needed collectives."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    members = _members(2)
    x = jnp.asarray(rng.integers(0, 255, (8, 32, 32, 3), np.uint8))
    program = pseudo_label_program(members, (0, 0, 0), (1, 1, 1), 4)
    pred_1, probs_1, stats_1 = program(x, 0.5)

    mesh = Mesh(np.array(jax.devices()), ("data",))
    sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    xs = jax.device_put(x, sh)
    sharded = jax.jit(program.__wrapped__,
                      in_shardings=(sh, rep),
                      out_shardings=(sh, sh, sh))
    pred_s, probs_s, stats_s = sharded(xs, jnp.float32(0.5))
    np.testing.assert_array_equal(np.asarray(pred_s), np.asarray(pred_1))
    np.testing.assert_allclose(np.asarray(probs_s), np.asarray(probs_1),
                               atol=1e-6)
    for k in stats_1:
        np.testing.assert_allclose(np.asarray(stats_s[k]),
                                   np.asarray(stats_1[k]), atol=1e-6)


def test_should_accept_gates():
    t = QCThresholds()
    good = dict(fg_area=0.1, fg_conf=0.9, mean_entropy=0.1,
                tta_iou=0.9, edge_hit=0.5)
    assert should_accept(**good, t=t)
    assert not should_accept(**{**good, "fg_area": 0.001}, t=t)
    assert not should_accept(**{**good, "fg_area": 0.7}, t=t)
    assert not should_accept(**{**good, "fg_conf": 0.5}, t=t)
    assert not should_accept(**{**good, "mean_entropy": 0.5}, t=t)
    assert not should_accept(**{**good, "tta_iou": 0.5}, t=t)
    assert not should_accept(**{**good, "edge_hit": 0.05}, t=t)


def test_generate_pseudo_labels_end_to_end(tmp_path):
    ir, _ = make_synthetic_tree(tmp_path, n_sessions=2, per_session=3,
                                hw=(48, 64))
    members = _members(1)
    cfg = PseudoLabelConfig(
        images_root=str(ir), out_dir=str(tmp_path / "pseudo"),
        overlay_dir=str(tmp_path / "overlays"), img_size=32,
        threshold=0.5, batch_size=4,
        qc=QCThresholds(min_fg_area=0, max_fg_area=1, min_fg_conf=0,
                        max_mean_entropy=10, min_tta_iou=0,
                        min_edge_hit=0),  # accept everything
        max_per_bucket=2)
    out = generate_pseudo_labels(members, cfg, log=lambda *a: None)
    assert out["accepted"] > 0
    # per-bucket cap respected
    assert all(v <= 2 for v in out["buckets"].values())
    pseudo = tmp_path / "pseudo"
    assert (pseudo / "qc_scores.csv").exists()
    masks = list(pseudo.rglob("session_*/*.png"))
    probs = list(pseudo.rglob("*_prob.npz"))
    assert masks and probs
    import csv
    with open(pseudo / "qc_scores.csv") as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["image", "fg_area", "fg_conf", "mean_entropy",
                       "tta_iou", "edge_hit", "accepted", "threshold"]
    assert len(rows) > 1


def test_generate_pseudo_labels_mesh_matches_single(tmp_path):
    """use_mesh=True (batch sharded over the 8 CPU devices) must write
    byte-identical masks and QC rows to the single-device run — the
    workload-level face of the fused-program sharding test."""
    ir, _ = make_synthetic_tree(tmp_path, n_sessions=2, per_session=4,
                                hw=(48, 64))
    members = _members(1)

    def run(out, use_mesh):
        cfg = PseudoLabelConfig(
            images_root=str(ir), out_dir=str(tmp_path / out),
            img_size=32, threshold=0.5, batch_size=8,
            save_overlays=False, save_probs=False,
            qc=QCThresholds(min_fg_area=0, max_fg_area=1, min_fg_conf=0,
                            max_mean_entropy=10, min_tta_iou=0,
                            min_edge_hit=0),
            max_per_bucket=10, use_mesh=use_mesh)
        return generate_pseudo_labels(members, cfg, log=lambda *a: None)

    out_m = run("mesh", True)
    out_s = run("single", False)
    assert out_m["accepted"] == out_s["accepted"] > 0
    masks_m = sorted((tmp_path / "mesh").rglob("session_*/*.png"))
    masks_s = sorted((tmp_path / "single").rglob("session_*/*.png"))
    assert [m.name for m in masks_m] == [m.name for m in masks_s]
    for a, b in zip(masks_m, masks_s):
        assert a.read_bytes() == b.read_bytes()
    rows_m = (tmp_path / "mesh" / "qc_scores.csv").read_text()
    rows_s = (tmp_path / "single" / "qc_scores.csv").read_text()
    assert rows_m == rows_s


def test_generate_pseudo_labels_rejection_routes_to_uncertain(tmp_path):
    ir, _ = make_synthetic_tree(tmp_path, n_sessions=1, per_session=2,
                                hw=(48, 64))
    members = _members(1)
    cfg = PseudoLabelConfig(
        images_root=str(ir), out_dir=str(tmp_path / "p2"), img_size=32,
        threshold=0.5, batch_size=2, save_overlays=False,
        qc=QCThresholds(min_fg_conf=1.1))  # impossible -> all uncertain
    out = generate_pseudo_labels(members, cfg, log=lambda *a: None)
    assert out["accepted"] == 0
    assert list((tmp_path / "p2" / "uncertain").rglob("*.png"))


def test_mine_hard_cases_mesh_matches_single(tmp_path):
    """Mesh-sharded mining scores must equal the single-device run
    row-for-row (incl. a cycle-padded tail batch)."""
    ir, _ = make_synthetic_tree(tmp_path, n_sessions=2, per_session=5,
                                hw=(48, 64))
    members = _members(1)

    def run(out, use_mesh):
        cfg = MiningConfig(images_root=str(ir),
                           out_dir=str(tmp_path / out), img_size=32,
                           batch_size=8, sample_size=None,
                           use_mesh=use_mesh)
        return mine_hard_cases(members, cfg, log=lambda *a: None)

    df_m = run("mesh", True)
    df_s = run("single", False)
    assert list(df_m["path"]) == list(df_s["path"])
    for col in ("entropy_mean", "components", "hole_fraction",
                "composite"):
        np.testing.assert_allclose(df_m[col].to_numpy(),
                                   df_s[col].to_numpy(), atol=1e-6)


def test_mine_hard_cases_end_to_end(tmp_path):
    ir, _ = make_synthetic_tree(tmp_path, n_sessions=2, per_session=3,
                                hw=(48, 64))
    members = _members(1)
    cfg = MiningConfig(images_root=str(ir),
                       out_dir=str(tmp_path / "mine"), img_size=32,
                       batch_size=4, sample_size=None)
    df = mine_hard_cases(members, cfg, log=lambda *a: None)
    assert df is not None and len(df) == 6
    assert (tmp_path / "mine" / "hard_candidates.csv").exists()
    # ranked descending by composite
    comp = df["composite"].to_numpy()
    assert (comp[:-1] >= comp[1:]).all()
    for c in ["entropy_mean", "frac_near_0p5", "tta_var_mean",
              "components", "hole_fraction", "perimeter_over_area"]:
        assert c in df.columns


def test_mining_fused_program_matches_separate():
    """mining_program (one dispatch, batched CC/hole-fill) must equal
    the separate forward + per-image _metrics_fn path exactly."""
    from cartseg_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD
    from cartseg_tpu.infer.engine import ensemble_probs_fn
    from cartseg_tpu.infer.mining import _metrics_fn, mining_program

    members = _members(2)
    rng = np.random.default_rng(0)
    base = rng.random((3, 8, 8, 3)).astype(np.float32)
    import jax.image as jimage
    up = np.asarray(jimage.resize(jnp.asarray(base), (3, 32, 32, 3),
                                  "linear"))
    imgs = jnp.asarray((up * 255).astype(np.uint8))

    program = mining_program(members, IMAGENET_MEAN, IMAGENET_STD,
                             0.5, 0.05)
    fused = {k: np.asarray(v) for k, v in program(imgs).items()}

    fwd = ensemble_probs_fn(members, IMAGENET_MEAN, IMAGENET_STD,
                            tta_flip=True)
    probs, probs_flip = fwd(imgs)
    sep = {k: np.asarray(v) for k, v in
           _metrics_fn(0.5, 0.05)(probs, probs_flip).items()}

    assert set(fused) == set(sep)
    for k in sep:
        np.testing.assert_allclose(fused[k], sep[k], rtol=0, atol=1e-6,
                                   err_msg=k)


def test_mining_composite_formula():
    # reference mine_hard_cases.py:189-190
    ent, near, var, holes, pa, comps = 0.4, 0.2, 0.05, 0.1, 0.5, 5
    score = (0.35 * ent + 0.25 * near + 0.20 * var + 0.10 * holes
             + 0.10 * min(pa / 0.2, 1.0)) + 0.05 * min(comps, 3)
    assert score == pytest.approx(0.35 * 0.4 + 0.25 * 0.2 + 0.2 * 0.05
                                  + 0.01 + 0.1 + 0.15)


def test_ranking_scores_and_copy(tmp_path, rng):
    src = tmp_path / "src" / "store_a" / "session_b"
    src.mkdir(parents=True)
    import cv2
    scores = {}
    for i, conf in enumerate([0.9, 0.3, 0.6]):
        prob = np.full((16, 16), 0.5 + conf / 2, np.float16)
        np.savez_compressed(src / f"img{i}_prob.npz", prob=prob)
        cv2.imwrite(str(src / f"img{i}.png"),
                    (prob > 0.5).astype(np.uint8) * 255)
    cfg = RankingConfig(src_root=str(tmp_path / "src"),
                        dst_root=str(tmp_path / "dst"), top_k=2)
    df = rank_pseudo_masks(cfg, log=lambda *a: None)
    assert df is not None
    # highest confidence ranks first
    assert df.iloc[0]["prob"].endswith("img0_prob.npz")
    copied = list((tmp_path / "dst").rglob("*.png"))
    assert len(copied) == 2
    # tree preserved
    assert (tmp_path / "dst" / "store_a" / "session_b").exists()


def test_score_sample_area_penalty():
    # inside band: no penalty
    assert score_sample(0.1, 0.8, 0.2) == pytest.approx(
        0.7 * 0.8 - 0.5 * 0.2)
    # tiny area penalized
    assert score_sample(0.001, 0.8, 0.2) < score_sample(0.1, 0.8, 0.2)
    # huge area penalized
    assert score_sample(0.9, 0.8, 0.2) < score_sample(0.1, 0.8, 0.2)


def test_pseudo_labels_deterministic(tmp_path):
    """Same checkpoint + same images -> bitwise-identical masks and QC
    rows across runs (the north star's determinism requirement for the
    non-stochastic paths)."""
    ir, _ = make_synthetic_tree(tmp_path, n_sessions=1, per_session=3,
                                hw=(48, 64))
    members = _members(1)
    outs = []
    for run in ("a", "b"):
        cfg = PseudoLabelConfig(
            images_root=str(ir), out_dir=str(tmp_path / run), img_size=32,
            threshold=0.5, batch_size=2, save_overlays=False,
            qc=QCThresholds(min_fg_area=0, max_fg_area=1, min_fg_conf=0,
                            max_mean_entropy=10, min_tta_iou=0,
                            min_edge_hit=0))
        generate_pseudo_labels(members, cfg, log=lambda *a: None)
        import cv2
        masks = {p.name: cv2.imread(str(p), 0).tobytes()
                 for p in sorted((tmp_path / run).rglob("session_*/*.png"))}
        outs.append(masks)
    assert outs[0].keys() == outs[1].keys() and len(outs[0]) > 0
    for k in outs[0]:
        assert outs[0][k] == outs[1][k], k
