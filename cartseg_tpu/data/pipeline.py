"""Device input pipeline: a thread-prefetched, double-buffered loader.

The reference uses torch DataLoader worker processes with per-step
H2D copies and `.item()` syncs (train_bce_dice.py:284-287, 329, 337).
Here the host side (decode + letterbox + resize, uint8) runs in a small
thread pool one batch ahead, batches are `jax.device_put` while the
previous step computes, and augmentation/normalization runs on device —
the TPU never waits on the host for steady-state epochs.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence

import numpy as np

import jax


class Loader:
    """Iterates (images_u8 [B,H,W,3] device, masks [B,H,W,1] device).

    order: an index array (epoch plan) over the dataset; the loader
    drops the trailing partial batch when drop_last (static shapes keep
    XLA from recompiling).
    """

    def __init__(self, dataset, batch_size: int, *, drop_last: bool = True,
                 num_threads: int = 4, prefetch: int = 2,
                 device: Optional[jax.Device] = None,
                 sharding=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.device = device
        self.sharding = sharding

    def _batches(self, order: Sequence[int]):
        bs = self.batch_size
        n = len(order)
        end = (n // bs) * bs if self.drop_last else n
        for i in range(0, end, bs):
            yield list(order[i:i + bs])

    def __call__(self, order: Sequence[int]) -> Iterator:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def _put(item) -> bool:
            """Bounded put that aborts when the consumer has left."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        multiproc = self.sharding is not None and jax.process_count() > 1

        def produce():
            try:
                with ThreadPoolExecutor(self.num_threads) as pool:
                    for idxs in self._batches(order):
                        if stop.is_set():
                            return
                        n_global = len(idxs)
                        if multiproc:
                            # per-host loading: decode only this host's
                            # rows of the global batch, then reassemble
                            # the global array from local shards
                            # (parallel/mesh.py host_batch_slice)
                            from cartseg_tpu.parallel import \
                                host_batch_slice
                            idxs = idxs[host_batch_slice(n_global)]
                        items = list(pool.map(self.dataset.__getitem__,
                                              idxs))
                        imgs = np.stack([it[0] for it in items])
                        masks = np.stack([it[1] for it in items])[..., None]
                        if multiproc:
                            mk = jax.make_array_from_process_local_data
                            sh = self.sharding
                            put = (
                                mk(sh, imgs,
                                   (n_global,) + imgs.shape[1:]),
                                mk(sh, masks,
                                   (n_global,) + masks.shape[1:]))
                        elif self.sharding is not None and \
                                imgs.shape[0] % self.sharding.num_devices \
                                == 0:
                            put = (jax.device_put(imgs, self.sharding),
                                   jax.device_put(masks, self.sharding))
                        elif self.device is not None:
                            put = (jax.device_put(imgs, self.device),
                                   jax.device_put(masks, self.device))
                        else:
                            put = (jax.device_put(imgs),
                                   jax.device_put(masks))
                        if not _put(put):
                            return
            except BaseException as e:  # surfaced to the consumer
                _put(e)
            finally:
                _put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # unblock a producer stuck on a full queue
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass

    def steps_per_epoch(self, n: int) -> int:
        return n // self.batch_size if self.drop_last \
            else -(-n // self.batch_size)
