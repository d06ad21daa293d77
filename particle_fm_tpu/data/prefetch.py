"""Host->device prefetch for the streaming (non-device-cached) data path.

TPU-native analogue of the reference's `DataLoader(num_workers=...,
pin_memory=True)` (e.g. configs/data/hl_classifier.yaml:6, and the
datamodules' train_dataloader methods): a background thread prepares the
next host batch AND issues its device_put while the accelerator is still
computing the previous step, so host-side batch prep + H2D transfer overlap
device compute instead of serializing with it. Same pattern as
flax.jax_utils.prefetch_to_device, generalized to any placement function
(sharded device_put over the trainer's mesh here).

Only the streaming path needs this: when the train split fits in HBM the
trainer uploads it once and shuffles on device (trainer.cache_data_on_device),
which is strictly better. Prefetch is for datasets larger than the device
cache limit.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator


def prefetch_to_device(
    iterator: Iterable, place: Callable, depth: int = 2
) -> Iterator:
    """Yield `place(item)` for each item, with up to `depth` placed items
    prepared ahead by a background thread.

    `place` runs ON the worker thread (JAX device_put is thread-safe); the
    consumer receives already-placed device arrays. Worker exceptions are
    re-raised at the consumer's next pull. If the consumer abandons the
    generator early, the worker is signalled to stop and exits at its next
    queue handoff.
    """
    if depth <= 0:
        for item in iterator:
            yield place(item)
        return

    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()
    sentinel = object()
    err: list[BaseException] = []

    def worker():
        try:
            for item in iterator:
                placed = place(item)
                while not stop.is_set():
                    try:
                        q.put(placed, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # re-raised on the consumer side
            err.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(sentinel, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=worker, daemon=True, name="prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
