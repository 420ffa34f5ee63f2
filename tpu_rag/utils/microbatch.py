"""Cross-request micro-batching (leader/follower, zero added idle latency).

The TPU search path is a single device program whose cost is almost flat in
the query-batch dimension (the DB scan dominates), so concurrent single-query
requests waste 10-100x throughput if dispatched one by one.  This batcher
aggregates them: requests enqueue; a worker takes whatever has accumulated
(never waiting on a timer — the previous device call IS the batching window)
and runs one fused embed+search for the whole set.

An idle server pays nothing: the first request is picked up immediately and
runs alone.  Under concurrency, arrivals during an in-flight device call form
the next batch.  (The reference stack had no equivalent; each request paid a
full encoder forward + ANN query — api/app.py:539-566.)
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable

from tpu_rag.utils.metrics import GLOBAL_METRICS


class MicroBatcher:
    """run_batch: list[item] -> list[result] (len-matched).  submit() blocks
    until the batch containing its item completes; exceptions propagate to
    every caller in the failed batch."""

    def __init__(self, run_batch: Callable[[list], list], *,
                 max_batch: int = 64, name: str = "microbatch") -> None:
        self._run = run_batch
        self.max_batch = max(1, int(max_batch))
        self.name = name
        self._q: queue.Queue = queue.Queue()
        self._thread: threading.Thread | None = None
        self._start_lock = threading.Lock()

    def _ensure_worker(self) -> None:
        if self._thread is not None and self._thread.is_alive():
            return
        with self._start_lock:
            if self._thread is None or not self._thread.is_alive():
                self._thread = threading.Thread(
                    target=self._loop, daemon=True, name=self.name)
                self._thread.start()

    def submit(self, item: Any, timeout: float | None = 120.0) -> Any:
        cell: dict[str, Any] = {"ev": threading.Event()}
        self._ensure_worker()
        self._q.put((item, cell))
        if not cell["ev"].wait(timeout):
            raise TimeoutError(f"{self.name}: batch did not complete in {timeout}s")
        if "error" in cell:
            raise cell["error"]
        return cell["result"]

    def _loop(self) -> None:
        while True:
            batch = [self._q.get()]
            while len(batch) < self.max_batch:
                try:
                    batch.append(self._q.get_nowait())
                except queue.Empty:
                    break
            GLOBAL_METRICS.inc(f"{self.name}_batches_total")
            GLOBAL_METRICS.inc(f"{self.name}_items_total", len(batch))
            try:
                results = self._run([item for item, _ in batch])
                if len(results) != len(batch):
                    raise RuntimeError(
                        f"{self.name}: run_batch returned {len(results)} results "
                        f"for {len(batch)} items")
                for (_, cell), result in zip(batch, results):
                    cell["result"] = result
                    cell["ev"].set()
            except Exception as e:  # propagate to every waiter in the batch
                for _, cell in batch:
                    cell["error"] = e
                    cell["ev"].set()
