"""Background input pipeline: overlap host batch gather + device upload with
the running train step.

The reference feeds its GPU from a torch DataLoader with worker processes
(/root/reference/training/coarse.py:176-201, fine.py:163-177 — batches are
collated on CPU workers while the GPU runs). Our trainers' loop bodies are
single jitted XLA programs, so the equivalent TPU-native overlap is an input
PREFETCHER: one worker thread runs the host-side gather pipeline (numpy
gathers, PMC/negative sampling draws) and stages each batch onto the device
(`jax.device_put` / mesh `shard_batch`) while the main thread's previously
dispatched step still executes. Measured on the remote-TPU tunnel the upload
alone costs more than the step itself on bad days (BENCHMARKS.md log #18:
coarse 123.6 ms host-fed vs 82.7 device-staged), so staging off the critical
path is worth ~1.5x end-to-end; on locally-attached TPUs it still hides the
host gather + PCIe copy.

Correctness constraints honored here:

* ONE worker thread executes the generator — host RNG streams
  (sample_close_cell / PMC / negative draws are `np.random.Generator` state
  threaded through the gathers) advance in exactly the serial loop order, so
  a prefetched run is BITWISE identical to the serial loop
  (tests/test_prefetch.py pins trainer-level loss-trajectory equality).
* the queue is bounded (`depth`) — at most `depth` staged batches exist, so
  device memory for inputs is O(depth * batch), not O(epoch).
* generator exceptions re-raise in the consumer at the point of consumption;
  early consumer exit (exception mid-epoch) unblocks and joins the worker.

`TEXT2LOC_PREFETCH=0` disables prefetching in the trainers (serial loop,
same semantics) — the A/B knob used by tests and scripts/probe_prefetch.py.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Callable, Iterable, Iterator, Optional, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def prefetch_enabled() -> bool:
    return os.environ.get("TEXT2LOC_PREFETCH", "1") != "0"


def prefetch(
    batches: Iterable[T],
    put: Optional[Callable[[T], object]] = None,
    depth: int = 2,
) -> Iterator[object]:
    """Yield `put(batch)` for each batch, staged ahead by a worker thread.

    `batches`: the host-side batch generator (gathers + RNG draws). It runs
    entirely on one worker thread, in order.
    `put`: device staging applied on the worker (default: identity). Use
    `jax.device_put` or `parallel.mesh.shard_batch` here so uploads overlap
    the running step.
    `depth`: max staged batches in flight (>= 1).
    """
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()
    failure: list[BaseException] = []

    def worker():
        try:
            for item in batches:
                staged = put(item) if put is not None else item
                # Bounded put that notices consumer abandonment: poll the
                # stop flag so an abandoned epoch doesn't leak a blocked
                # thread holding device buffers.
                while not stop.is_set():
                    try:
                        q.put(staged, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # re-raised at the consumer
            failure.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(_SENTINEL, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=worker, name="text2loc-prefetch", daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if failure:
                    raise failure[0]
                return
            yield item
    finally:
        stop.set()
        t.join(timeout=10.0)


def maybe_prefetch(
    batches: Iterable[T],
    put: Optional[Callable[[T], object]] = None,
    depth: int = 2,
) -> Iterator[object]:
    """`prefetch` unless TEXT2LOC_PREFETCH=0 — then the serial equivalent
    (identical semantics, no worker thread)."""
    if prefetch_enabled():
        return prefetch(batches, put=put, depth=depth)
    return (put(b) if put is not None else b for b in batches)
