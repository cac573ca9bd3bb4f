"""Host→device prefetch: background producer + ahead-of-time staging.

The reference's Fuel pipeline is synchronous in-process Python — a known
bottleneck (SURVEY.md §3.1). Here a daemon thread stages the next
`depth` batches onto the device (with an explicit sharding for the DP
mesh) while the current step runs, so the TPU never waits on the host.

Staging goes through `parallel.staging.stage_local`: plain device_put on
one process; `jax.make_array_from_process_local_data` on a multi-host
slice, where each process's stream yields only its local rows.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax

from parrot_tpu.parallel.staging import stage_local


_SENTINEL = object()


def device_prefetch(it: Iterator, depth: int = 2,
                    sharding: Optional[jax.sharding.Sharding] = None) -> Iterator:
    """Wrap a host-batch iterator with a depth-`depth` device prefetcher.

    Each item (any pytree of numpy arrays) is staged ahead of time —
    with `sharding` (a matching pytree of shardings) when given, so
    batches land already sharded across the DP mesh axis (no gather on
    first use). On multi-host, items must be this process's local rows.
    """
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    err: list = []
    stop = threading.Event()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def produce():
        try:
            for item in it:
                if sharding is not None:
                    item = stage_local(item, sharding)
                else:
                    item = jax.device_put(item)
                if not _put(item):
                    return  # consumer went away; drop staged work
        except Exception as e:  # surface producer errors in the consumer
            err.append(e)
        finally:
            _put(_SENTINEL)

    t = threading.Thread(target=produce, daemon=True)
    t.start()

    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        # consumer stopped early (break / GC): unblock and end the
        # producer so the thread and its staged device batches are freed
        stop.set()
        while True:
            try:
                q.get_nowait()
            except queue.Empty:
                break
