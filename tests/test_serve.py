"""Serving subsystem: jax.export artifact round-trip (self-contained
StableHLO, params baked in), micro-batcher semantics, end-to-end
segment() geometry, and the stdlib HTTP endpoint."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cartseg_tpu.models import build_model, init_model
from cartseg_tpu.serve import (
    export_segmenter, load_segmenter, MicroBatcher, SegmentationService,
)


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    model = build_model("resnet18", dtype=jnp.float32)
    variables = init_model(model, jax.random.key(0), (1, 64, 64, 3))
    d = tmp_path_factory.mktemp("artifact")
    export_segmenter(d, variables=variables, encoder="resnet18",
                     img_hw=(64, 64), batch_size=4, threshold=0.4,
                     compute_dtype="float32")
    return d, model, variables


def test_export_roundtrip_matches_model(artifact, rng):
    d, model, variables = artifact
    served = load_segmenter(d)
    assert served.manifest["threshold"] == 0.4
    x = rng.integers(0, 255, (4, 64, 64, 3)).astype(np.uint8)
    probs = served.predict_probs(x)
    ref = np.asarray(jax.nn.sigmoid(model.apply(
        variables, jnp.asarray(x, jnp.float32) / 255.0,
        train=False))[..., 0])
    np.testing.assert_allclose(probs, ref, atol=1e-5)


def test_sidecar_params_export_matches_embedded(artifact, rng,
                                                tmp_path):
    """embed_params=False ships weights as params.msgpack and a lean
    program; outputs must match the baked-constants artifact exactly."""
    d, model, variables = artifact
    d2 = tmp_path / "lean"
    export_segmenter(d2, variables=variables, encoder="resnet18",
                     img_hw=(64, 64), batch_size=4, threshold=0.4,
                     compute_dtype="float32", embed_params=False)
    assert (d2 / "params.msgpack").exists()
    lean = (d2 / "model.stablehlo").stat().st_size
    baked = (d / "model.stablehlo").stat().st_size
    assert lean < baked / 2, (lean, baked)

    a, b = load_segmenter(d), load_segmenter(d2)
    x = rng.integers(0, 255, (4, 64, 64, 3)).astype(np.uint8)
    # constants-vs-arguments programs constant-fold differently; XLA
    # guarantees the math, not the bit pattern — observed max |Δ| 1 ULP
    np.testing.assert_allclose(a.predict_probs(x),
                               b.predict_probs(x), atol=1e-6)


def test_ragged_batch_padding(artifact, rng):
    d, model, variables = artifact
    served = load_segmenter(d)
    x = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    probs = served.predict_probs(x)
    assert probs.shape == (2, 64, 64)
    full = served.predict_probs(
        np.concatenate([x, np.zeros_like(x)])[:4])
    np.testing.assert_allclose(probs, full[:2], atol=1e-6)
    with pytest.raises(ValueError):
        served.predict_probs(rng.integers(
            0, 255, (5, 64, 64, 3)).astype(np.uint8))


def test_segment_returns_original_resolution(artifact, rng):
    d, _, _ = artifact
    served = load_segmenter(d)
    img = rng.integers(0, 255, (100, 160, 3)).astype(np.uint8)
    mask = served.segment(img)
    assert mask.shape == (100, 160)
    assert set(np.unique(mask)) <= {0, 255}


def test_micro_batcher_batches_and_preserves_order():
    seen = []

    def run(items):
        seen.append(len(items))
        return [i * 10 for i in items]

    mb = MicroBatcher(run, batch_size=4, max_latency_ms=50)
    futs = [mb.submit(i) for i in range(6)]
    assert [f.result(timeout=5) for f in futs] == [0, 10, 20, 30, 40, 50]
    mb.close()
    assert sum(seen) == 6
    assert max(seen) <= 4


def test_micro_batcher_propagates_errors():
    def run(items):
        raise RuntimeError("device fell over")

    mb = MicroBatcher(run, batch_size=2, max_latency_ms=10)
    f = mb.submit(1)
    with pytest.raises(RuntimeError, match="fell over"):
        f.result(timeout=5)
    mb.close()


def test_service_concurrent_requests(artifact, rng):
    d, _, _ = artifact
    svc = SegmentationService(d, max_latency_ms=30)
    imgs = [rng.integers(0, 255, (48 + 8 * i, 80, 3)).astype(np.uint8)
            for i in range(6)]
    futs = [svc.submit(im) for im in imgs]
    for im, f in zip(imgs, futs):
        assert f.result(timeout=30).shape == im.shape[:2]
    svc.close()


def test_micro_batcher_per_item_error_isolation():
    """One bad request must not fail its batch-mates: run_fn returns an
    Exception instance for the bad item only."""
    def run(items):
        return [ValueError(f"bad {i}") if i == 2 else i * 10
                for i in items]

    mb = MicroBatcher(run, batch_size=4, max_latency_ms=50)
    futs = [mb.submit(i) for i in range(4)]
    assert futs[0].result(timeout=5) == 0
    assert futs[1].result(timeout=5) == 10
    with pytest.raises(ValueError, match="bad 2"):
        futs[2].result(timeout=5)
    assert futs[3].result(timeout=5) == 30
    mb.close()


def test_service_isolates_bad_geometry(artifact, rng, monkeypatch):
    """A request whose inverse-letterbox blows up fails alone; the
    other requests in the same device batch still succeed."""
    d, _, _ = artifact
    svc = SegmentationService(d, max_latency_ms=100)
    import cartseg_tpu.geometry as G
    real = G.remove_letterbox

    def flaky(mask, orig_w, orig_h):
        if orig_w == 13:  # poison pill
            raise RuntimeError("geometry exploded")
        return real(mask, orig_w=orig_w, orig_h=orig_h)

    monkeypatch.setattr(svc, "_geo",
                        type("G2", (), {"remove_letterbox":
                                        staticmethod(flaky),
                                        "letterbox_and_resize":
                                        staticmethod(
                                            G.letterbox_and_resize)}))
    good = rng.integers(0, 255, (40, 60, 3)).astype(np.uint8)
    bad = rng.integers(0, 255, (40, 13, 3)).astype(np.uint8)
    futs = [svc.submit(good), svc.submit(bad), svc.submit(good)]
    assert futs[0].result(timeout=30).shape == (40, 60)
    with pytest.raises(RuntimeError, match="geometry exploded"):
        futs[1].result(timeout=30)
    assert futs[2].result(timeout=30).shape == (40, 60)
    svc.close()


def test_manifest_validation(artifact, tmp_path):
    """Loading refuses: missing manifest, corrupt JSON, wrong format,
    future artifact_version, missing keys, missing params sidecar."""
    import shutil

    from cartseg_tpu.serve import validate_manifest

    d, _, _ = artifact
    # happy path passes and carries the version stamp
    m = validate_manifest(d)
    assert m["artifact_version"] == 1

    def copy_with(mutate):
        dst = tmp_path / f"art_{mutate.__name__}"
        shutil.copytree(d, dst)
        mf = json.loads((dst / "manifest.json").read_text())
        mutate(dst, mf)
        return dst

    def no_manifest(dst, mf):
        (dst / "manifest.json").unlink()
    with pytest.raises(ValueError, match="manifest.json missing"):
        validate_manifest(copy_with(no_manifest))

    def corrupt(dst, mf):
        (dst / "manifest.json").write_text("{nope")
    with pytest.raises(ValueError, match="corrupt manifest"):
        validate_manifest(copy_with(corrupt))

    def wrong_format(dst, mf):
        mf["format"] = "other.thing"
        (dst / "manifest.json").write_text(json.dumps(mf))
    with pytest.raises(ValueError, match="unknown artifact format"):
        validate_manifest(copy_with(wrong_format))

    def future_version(dst, mf):
        mf["artifact_version"] = 99
        (dst / "manifest.json").write_text(json.dumps(mf))
    with pytest.raises(ValueError, match="newer than this loader"):
        validate_manifest(copy_with(future_version))

    def drop_key(dst, mf):
        del mf["threshold"]
        (dst / "manifest.json").write_text(json.dumps(mf))
    with pytest.raises(ValueError, match="missing keys"):
        validate_manifest(copy_with(drop_key))

    def sidecar_gone(dst, mf):
        mf["embed_params"] = False
        (dst / "manifest.json").write_text(json.dumps(mf))
    with pytest.raises(ValueError, match="params.msgpack is missing"):
        validate_manifest(copy_with(sidecar_gone))


def test_http_concurrent_posts_one_device_call(artifact, rng):
    """Simultaneous POSTs to the HTTP server must coalesce into device
    batches: 4 concurrent requests with batch_size 4 -> exactly one
    predict_probs call (after warmup)."""
    import cv2

    from cartseg_tpu.serve.server import make_http_server

    d, _, _ = artifact
    svc = SegmentationService(d, max_latency_ms=500)
    calls = []
    real_predict = svc.model.predict_probs
    svc.model.predict_probs = lambda xs: (calls.append(xs.shape[0]),
                                          real_predict(xs))[1]
    srv = make_http_server(svc, 0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        img = rng.integers(0, 255, (80, 100, 3)).astype(np.uint8)
        ok, png = cv2.imencode(".png", img[:, :, ::-1])
        body = png.tobytes()
        results, errs = [], []

        def post():
            try:
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/segment", data=body,
                    method="POST")
                with urllib.request.urlopen(req, timeout=120) as r:
                    results.append(r.read())
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        threads = [threading.Thread(target=post) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errs and len(results) == 4
        for b in results:
            mask = cv2.imdecode(np.frombuffer(b, np.uint8),
                                cv2.IMREAD_GRAYSCALE)
            assert mask.shape == (80, 100)
        # all four coalesced into one full device batch
        assert calls == [4], calls
    finally:
        srv.shutdown()
        svc.close()


def test_http_endpoint(artifact, rng):
    import cv2

    from cartseg_tpu.serve.server import make_http_server

    d, _, _ = artifact
    svc = SegmentationService(d, max_latency_ms=10)
    srv = make_http_server(svc, 0)  # ephemeral port
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
            manifest = json.loads(r.read())
        assert manifest["batch_size"] == 4
        img = rng.integers(0, 255, (90, 120, 3)).astype(np.uint8)
        ok, png = cv2.imencode(".png", img[:, :, ::-1])
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/segment", data=png.tobytes(),
            method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            body = r.read()
        mask = cv2.imdecode(np.frombuffer(body, np.uint8),
                            cv2.IMREAD_GRAYSCALE)
        assert mask.shape == (90, 120)
    finally:
        srv.shutdown()
        svc.close()
