"""Micro-batching segmentation server over an exported artifact.

Design for TPU serving: the device program has ONE static batch shape
(recompiles are 20-450s on this class of runtime — never let request
count leak into shapes). Requests land in a queue; a collector thread
flushes when a full batch accumulates OR `max_latency_ms` elapses, pads
the tail, runs the device call, and resolves per-request futures.
Throughput comes from batching, tail latency is bounded by the timer —
the standard production trade.

Three frontends over the same service:
  * Python API: `SegmentationService.submit(image) -> Future`
  * batch mode: `python -m cartseg_tpu.serve.server --artifact D
      --input_dir IN --out_dir OUT` (masks written as PNGs)
  * HTTP (stdlib only): `--port 8000`; POST /segment with a PNG/JPEG
    body returns the PNG mask at the original resolution;
    GET /healthz returns the manifest.
"""

from __future__ import annotations

import argparse
import json
import queue
import threading
import time
from concurrent.futures import Future
from pathlib import Path
from typing import Optional

import numpy as np

from cartseg_tpu.serve.export import load_segmenter


class MicroBatcher:
    """Generic fixed-batch collector: submit(item) -> Future; `run_fn`
    receives a list of <= batch_size items and must return one result
    per item. A returned item that IS an Exception instance resolves
    only that request's future exceptionally (per-request error
    isolation); a raised exception fails the whole batch (e.g. the
    device call itself died)."""

    def __init__(self, run_fn, batch_size: int, max_latency_ms: float = 20.0):
        self._run = run_fn
        self.batch_size = batch_size
        self.max_latency = max_latency_ms / 1e3
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, item) -> Future:
        fut: Future = Future()
        self._q.put((item, fut))
        return fut

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5)

    def _loop(self):
        while not self._stop.is_set():
            batch = []
            try:
                batch.append(self._q.get(timeout=0.05))
            except queue.Empty:
                continue
            deadline = time.monotonic() + self.max_latency
            while len(batch) < self.batch_size:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=left))
                except queue.Empty:
                    break
            items = [b[0] for b in batch]
            futs = [b[1] for b in batch]
            try:
                results = self._run(items)
                for f, r in zip(futs, results):
                    if isinstance(r, Exception):
                        f.set_exception(r)
                    else:
                        f.set_result(r)
            except Exception as e:  # noqa: BLE001 — propagate per-request
                for f in futs:
                    f.set_exception(e)


class SegmentationService:
    """Letterbox + batched device inference + inverse letterbox, over
    the micro-batcher. Thread-safe; one device program."""

    def __init__(self, artifact_dir, max_latency_ms: float = 20.0,
                 warmup_iters: int = 10):
        from cartseg_tpu import geometry

        self._geo = geometry
        self.model = load_segmenter(artifact_dir)
        self._batcher = MicroBatcher(self._run_batch,
                                     self.model.batch_size, max_latency_ms)
        if warmup_iters:
            self.warmup(warmup_iters)

    def warmup(self, iters: int = 10):
        """Run the device program to steady state before serving: the
        relayed TPU runtime charges 150-450 ms of host overhead on each
        of the first ~8 executes of a fresh executable (CLAUDE.md), so
        without this the first real requests see 10-25x latency."""
        h, w = self.model.img_hw
        zeros = np.zeros((self.model.batch_size, h, w, 3), np.uint8)
        for _ in range(iters):
            self.model.predict_probs(zeros)

    def _run_batch(self, prepped):
        xs = np.stack([p[0] for p in prepped])
        probs = self.model.predict_probs(xs)
        out = []
        for p, (x, (w, h)) in zip(probs, prepped):
            # per-request isolation: one request with bad geometry must
            # not fail its batch-mates (they share a device call only)
            try:
                mask = (p >= self.model.threshold).astype(np.uint8) * 255
                out.append(self._geo.remove_letterbox(mask,
                                                      orig_w=w, orig_h=h))
            except Exception as e:  # noqa: BLE001
                out.append(e)
        return out

    def submit(self, image: np.ndarray) -> Future:
        """HxWx3 uint8 RGB, any resolution -> Future of HxW uint8 mask
        at that resolution."""
        h, w = image.shape[:2]
        x = self._geo.letterbox_and_resize(image, self.model.img_hw)
        return self._batcher.submit((x, (w, h)))

    def segment(self, image: np.ndarray) -> np.ndarray:
        return self.submit(image).result()

    def close(self):
        self._batcher.close()


# ---------------------------------------------------------------- HTTP

def make_http_server(service: SegmentationService, port: int):
    """stdlib http.server endpoint. POST /segment: image body (PNG/JPEG)
    -> PNG mask; GET /healthz -> manifest JSON."""
    import http.server

    import cv2

    manifest = dict(service.model.manifest)

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path != "/healthz":
                self.send_error(404)
                return
            body = json.dumps(manifest).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != "/segment":
                self.send_error(404)
                return
            n = int(self.headers.get("Content-Length", "0"))
            raw = self.rfile.read(n)
            img = cv2.imdecode(np.frombuffer(raw, np.uint8),
                               cv2.IMREAD_COLOR)
            if img is None:
                self.send_error(400, "undecodable image")
                return
            mask = service.segment(img[:, :, ::-1])  # BGR -> RGB
            ok, png = cv2.imencode(".png", mask)
            if not ok:
                self.send_error(500)
                return
            body = png.tobytes()
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return http.server.ThreadingHTTPServer(("127.0.0.1", port), Handler)


# ----------------------------------------------------------------- CLI

def main(argv: Optional[list] = None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--artifact", required=True)
    ap.add_argument("--input_dir", help="batch mode: segment every image")
    ap.add_argument("--out_dir", help="batch mode: where masks go")
    ap.add_argument("--port", type=int, help="HTTP mode")
    ap.add_argument("--max_latency_ms", type=float, default=20.0)
    args = ap.parse_args(argv)

    service = SegmentationService(args.artifact, args.max_latency_ms)
    if args.input_dir:
        import cv2

        out = Path(args.out_dir or (args.input_dir + "_masks"))
        out.mkdir(parents=True, exist_ok=True)
        paths = sorted(p for p in Path(args.input_dir).rglob("*")
                       if p.suffix.lower() in (".png", ".jpg", ".jpeg"))
        futs = []
        for p in paths:
            img = cv2.imread(str(p), cv2.IMREAD_COLOR)
            if img is None:
                continue
            futs.append((p, service.submit(img[:, :, ::-1])))
        n = 0
        for p, f in futs:
            cv2.imwrite(str(out / (p.stem + "_mask.png")), f.result())
            n += 1
        print(f"segmented {n} images -> {out}")
        service.close()
        return
    if args.port:
        srv = make_http_server(service, args.port)
        print(f"serving on 127.0.0.1:{args.port} "
              f"(batch {service.model.batch_size})")
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            service.close()
        return
    ap.error("need --input_dir or --port")


if __name__ == "__main__":
    main()
