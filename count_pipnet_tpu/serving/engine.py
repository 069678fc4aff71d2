"""Production serving loop: request batching + pipelined dispatch.

The reference deploys nothing — its eval loops feed fixed dataloader
batches (reference test.py). A production Count-PIPNet service instead
receives SINGLE images at unpredictable times and must trade latency
against the TPU's strong batch preference (bench.py: batch 256 runs
>30x the per-image rate of batch 1). This engine provides that layer,
TPU-first:

* **Static-shape ladder**: XLA compiles one executable per batch size,
  so arbitrary request-group sizes would retrace constantly. Requests
  are padded up to the nearest size in ``batch_sizes`` (each size
  compiles once, then is cached).
* **Deadline batching**: a collector thread groups requests until the
  largest ladder size is full OR ``max_wait_ms`` passed since the
  oldest pending request, bounding tail latency under light load.
* **Pipelined dispatch**: JAX dispatch is asynchronous — the collector
  enqueues device work for batch i+1 while batch i computes, and a
  separate drain thread blocks on results (``jax.device_get``; on the
  remote-tunnel backend ``block_until_ready`` alone does not prove
  completion — BENCH_NOTES.md). Up to ``max_inflight`` batches overlap
  host transfer with device compute.

Works with any ``infer_fn(x) -> pytree`` (typically the jitted serving
forward from models/serving.make_serving_fn or the int8 whole-block
path bench.py uses).
"""

import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, Optional, Sequence, Tuple

import numpy as np

__all__ = ["ServingEngine", "autotune_batch_size"]


class _Pending:
    __slots__ = ("img", "future", "t_submit")

    def __init__(self, img, future, t_submit):
        self.img = img
        self.future = future
        self.t_submit = t_submit


class ServingEngine:
    """Batched, pipelined inference server for a jitted forward.

    Args:
      infer_fn: callable(batch_f32 [B, H, W, C] on host) -> result
        pytree whose leaves have leading dim B (e.g. (counts, logits)).
        Called with each ladder batch size at most once per size
        (jit-compiled executables are cached by shape).
      input_shape: per-image shape (H, W, C).
      batch_sizes: ascending ladder of compiled batch sizes; requests
        are padded to the smallest size >= the group.
      max_wait_ms: deadline from the OLDEST pending request before a
        partial batch is dispatched.
      max_inflight: device batches allowed in flight before the
        collector blocks (2 = classic double buffering).
      mesh: optional ``jax.sharding.Mesh`` — multi-chip data-parallel
        serving. Dispatched batches are placed batch-sharded over the
        mesh's first axis before ``infer_fn`` runs, so a jitted forward
        (params replicated by the caller — see
        models/serving.shard_serving_fn) fans each ladder batch across
        all chips and XLA keeps the computation fully sharded; every
        ladder size must divide evenly by the mesh device count.
    """

    def __init__(self, infer_fn: Callable,
                 input_shape: Tuple[int, int, int],
                 batch_sizes: Sequence[int] = (1, 8, 32, 128, 256),
                 max_wait_ms: float = 2.0,
                 max_inflight: int = 2,
                 mesh=None):
        if not batch_sizes or list(batch_sizes) != sorted(batch_sizes):
            raise ValueError("batch_sizes must be ascending and non-empty")
        self.infer_fn = infer_fn
        self.input_shape = tuple(input_shape)
        self.batch_sizes = tuple(int(b) for b in batch_sizes)
        self.max_wait_ms = float(max_wait_ms)
        self.max_inflight = int(max_inflight)
        self.mesh = mesh
        self._batch_sharding = None
        if mesh is not None:
            n = mesh.devices.size
            bad = [b for b in self.batch_sizes if b % n]
            if bad:
                raise ValueError(
                    f"batch_sizes {bad} not divisible by the {n}-device "
                    f"mesh — every compiled ladder size must shard evenly")
            from jax.sharding import NamedSharding, PartitionSpec
            axis = mesh.axis_names[0]
            self._batch_sharding = NamedSharding(
                mesh, PartitionSpec(axis, *([None] * len(self.input_shape))))

        self._queue: "queue.Queue[Optional[_Pending]]" = queue.Queue()
        self._inflight: "queue.Queue" = queue.Queue()
        self._running = False
        self._collector = None
        self._drainer = None
        self._lock = threading.Lock()
        # bounded latency window: a long-running server must not grow a
        # per-request history (stats() sorts this on every call)
        from collections import deque
        self._stats = {"requests": 0, "batches": 0, "padded_slots": 0,
                       "latencies_ms": deque(maxlen=10000)}

    # -- public API ---------------------------------------------------------

    def start(self):
        if self._running:
            return self
        self._running = True
        self._collector = threading.Thread(target=self._collect_loop,
                                           daemon=True)
        self._drainer = threading.Thread(target=self._drain_loop,
                                         daemon=True)
        self._collector.start()
        self._drainer.start()
        return self

    def stop(self):
        if not self._running:
            return
        self._running = False
        self._queue.put(None)          # wake the collector
        self._collector.join(timeout=30)
        self._inflight.put(None)       # wake the drainer
        self._drainer.join(timeout=30)

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    def submit(self, img: np.ndarray) -> Future:
        """Enqueue one image; returns a Future resolving to the result
        pytree sliced to this request (leading dim removed)."""
        if not self._running:
            raise RuntimeError("engine is not running (start() it first, "
                               "or it was stopped)")
        img = np.asarray(img, np.float32)
        if img.shape != self.input_shape:
            raise ValueError(
                f"image shape {img.shape} != engine {self.input_shape}")
        fut: Future = Future()
        self._queue.put(_Pending(img, fut, time.perf_counter()))
        return fut

    def submit_many(self, imgs) -> list:
        return [self.submit(im) for im in imgs]

    def stats(self) -> dict:
        """Counters + latency percentiles over the last <=10k requests."""
        with self._lock:
            lat = sorted(self._stats["latencies_ms"])
            out = {
                "requests": self._stats["requests"],
                "batches": self._stats["batches"],
                "padded_slots": self._stats["padded_slots"],
            }
            if lat:
                out["latency_ms_p50"] = lat[len(lat) // 2]
                out["latency_ms_p99"] = lat[min(len(lat) - 1,
                                                int(len(lat) * 0.99))]
            return out

    # -- internals ----------------------------------------------------------

    def _ladder(self, n: int) -> int:
        for b in self.batch_sizes:
            if b >= n:
                return b
        return self.batch_sizes[-1]

    def _collect_loop(self):
        max_b = self.batch_sizes[-1]
        pending: list = []
        while True:
            timeout = None
            if pending:
                age = (time.perf_counter() - pending[0].t_submit) * 1e3
                timeout = max(0.0, (self.max_wait_ms - age)) * 1e-3
            try:
                item = self._queue.get(timeout=timeout)
            except queue.Empty:
                item = False                 # deadline hit: flush
            if item is None:
                # a submit() racing stop() may have enqueued requests
                # behind the sentinel — drain them so no future strands
                while True:
                    try:
                        extra = self._queue.get_nowait()
                    except queue.Empty:
                        break
                    if extra is not None:
                        pending.append(extra)
                break
            if item is not False:
                pending.append(item)
            full = len(pending) >= max_b
            aged = pending and (time.perf_counter() - pending[0].t_submit) \
                * 1e3 >= self.max_wait_ms
            if pending and (full or aged or not self._running):
                group, pending = pending[:max_b], pending[max_b:]
                self._dispatch(group)
        while pending:                       # final flush on stop
            group, pending = pending[:max_b], pending[max_b:]
            self._dispatch(group)

    def _dispatch(self, group):
        n = len(group)
        b = self._ladder(n)
        batch = np.zeros((b,) + self.input_shape, np.float32)
        for i, p in enumerate(group):
            batch[i] = p.img
        # backpressure: at most max_inflight device batches outstanding
        while self._inflight.qsize() >= self.max_inflight:
            time.sleep(1e-4)
        try:
            if self._batch_sharding is not None:
                # place batch-sharded across the mesh so the jitted
                # forward runs data-parallel (host->device transfer per
                # shard; XLA inserts no resharding)
                import jax
                batch = jax.device_put(batch, self._batch_sharding)
            result = self.infer_fn(batch)    # async dispatch under jit
        except Exception as e:               # compile/runtime failure
            for p in group:
                p.future.set_exception(e)
            return
        with self._lock:
            self._stats["batches"] += 1
            self._stats["padded_slots"] += b - n
        self._inflight.put((group, result))

    def _drain_loop(self):
        import jax
        while True:
            item = self._inflight.get()
            if item is None:
                break
            group, result = item
            host = jax.device_get(result)    # forces remote completion
            t_done = time.perf_counter()
            for i, p in enumerate(group):
                sliced = jax.tree_util.tree_map(lambda t: t[i], host)
                p.future.set_result(sliced)
            with self._lock:
                self._stats["requests"] += len(group)
                self._stats["latencies_ms"].extend(
                    (t_done - p.t_submit) * 1e3 for p in group)


def autotune_batch_size(infer_fn: Callable,
                        input_shape: Tuple[int, int, int],
                        candidates: Sequence[int] = (32, 64, 128, 256,
                                                     512),
                        iters: int = 5) -> dict:
    """Measure steady-state throughput per candidate batch size and
    return {'best': B, 'throughput': {B: img_per_sec}} — the offline
    companion to ServingEngine's ladder choice (run on the idle TPU)."""
    import jax
    rng = np.random.default_rng(0)
    results = {}
    for b in candidates:
        x = rng.normal(size=(b,) + tuple(input_shape)).astype(np.float32)
        jax.device_get(infer_fn(x))          # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            r = infer_fn(x)
        jax.device_get(r)
        dt = time.perf_counter() - t0
        results[b] = b * iters / dt
    best = max(results, key=results.get)
    return {"best": best, "throughput": results}
