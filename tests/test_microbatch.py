"""Cross-request micro-batching (utils/microbatch.py + engine wiring):
concurrent /search-style queries fuse into fewer device passes with
identical results (VERDICT round-1 weak #4)."""

import threading
import time

import numpy as np
import pytest

from tpu_rag.config import Config
from tpu_rag.engine import RagEngine
from tpu_rag.utils.microbatch import MicroBatcher
from tests.test_api import FakeEncoder


class CountingEncoder(FakeEncoder):
    def __init__(self):
        self.calls = 0
        self.texts_seen = 0
        self._lock = threading.Lock()

    def embed(self, texts):
        with self._lock:
            self.calls += 1
            self.texts_seen += len(texts)
        time.sleep(0.01)  # emulate a device round-trip so arrivals pile up
        return super().embed(texts)


def _engine(tmp_path, *, microbatch, encoder):
    cfg = Config(
        persist_dir=str(tmp_path / f"vs{microbatch}"),
        kb_db_path=str(tmp_path / f"db{microbatch}/kb.sqlite3"),
        db_path=str(tmp_path / f"db{microbatch}/app.sqlite3"),
        docs_dir=str(tmp_path / f"docs{microbatch}"),
        index_dtype="float32", use_pallas=False, summarize_mode="off",
        microbatch=microbatch,
    )
    eng = RagEngine(cfg, encoder=encoder)
    docs = [f"alpha beta doc{i} topic{i % 4}" for i in range(32)]
    eng.index.add([f"d{i}" for i in range(32)], encoder.embed(docs), docs,
                  [{"namespace": "ns" + str(i % 2)} for i in range(32)])
    return eng


def test_microbatcher_batches_and_preserves_order():
    seen_batches = []

    def run(items):
        seen_batches.append(list(items))
        return [x * 10 for x in items]

    mb = MicroBatcher(run, max_batch=8)
    results = {}

    def worker(x):
        results[x] = mb.submit(x)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(20)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == {i: i * 10 for i in range(20)}
    assert all(len(b) <= 8 for b in seen_batches)
    assert len(seen_batches) < 20  # some aggregation happened


def test_microbatcher_propagates_errors_to_all_waiters():
    def run(items):
        raise RuntimeError("device on fire")

    mb = MicroBatcher(run, max_batch=4)
    errs = []

    def worker():
        try:
            mb.submit(1, timeout=10)
        except RuntimeError as e:
            errs.append(str(e))

    threads = [threading.Thread(target=worker) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == ["device on fire"] * 3


def test_engine_concurrent_queries_fuse_embeds(tmp_path):
    enc = CountingEncoder()
    eng = _engine(tmp_path, microbatch=True, encoder=enc)
    eng.query_vector("warm up", 3, None, None)
    enc.calls = 0

    results = {}

    def worker(i):
        results[i] = eng.query_vector(f"alpha doc{i % 8} topic{i % 4}", 3, None, None)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(24)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(len(r) == 3 for r in results.values())
    # 24 concurrent queries must NOT cost 24 encoder forwards
    assert enc.calls < 24, f"no batching: {enc.calls} embed calls"


def test_engine_microbatched_results_match_unbatched(tmp_path):
    enc = CountingEncoder()
    on = _engine(tmp_path / "a", microbatch=True, encoder=enc)
    off = _engine(tmp_path / "b", microbatch=False, encoder=CountingEncoder())

    queries = [(f"alpha doc{i} topic{i % 4}", 4, f"ns{i % 2}" if i % 3 == 0 else None)
               for i in range(12)]
    results_on = {}

    def worker(i, q, k, ns):
        results_on[i] = on.query_vector(q, k, ns, None)

    threads = [threading.Thread(target=worker, args=(i, q, k, ns))
               for i, (q, k, ns) in enumerate(queries)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    for i, (q, k, ns) in enumerate(queries):
        expect = off.query_vector(q, k, ns, None)
        got = results_on[i]
        assert [h["id"] for h in got] == [h["id"] for h in expect], f"query {i}"
        np.testing.assert_allclose([h["score"] for h in got],
                                   [h["score"] for h in expect], rtol=1e-5)


def test_engine_microbatch_failure_degrades_to_empty(tmp_path):
    enc = CountingEncoder()
    eng = _engine(tmp_path, microbatch=True, encoder=enc)

    def boom(texts):
        raise RuntimeError("encoder crashed")

    enc_embed = enc.embed
    enc.embed = boom
    assert eng.query_vector("never seen query", 3, None, None) == []
    enc.embed = enc_embed
    assert len(eng.query_vector("alpha beta", 3, None, None)) == 3


def test_microbatcher_multiple_workers_all_items_served():
    """workers=2 keeps two windows in flight; every submit still gets its
    own result exactly once, and window sizes are recorded as a histogram."""
    import threading
    import time as _t

    from tpu_rag.utils.metrics import GLOBAL_METRICS
    from tpu_rag.utils.microbatch import MicroBatcher

    in_flight = [0]
    peak = [0]
    lock = threading.Lock()

    def run_batch(items):
        with lock:
            in_flight[0] += 1
            peak[0] = max(peak[0], in_flight[0])
        _t.sleep(0.02)  # simulate a device call
        with lock:
            in_flight[0] -= 1
        return [x * 10 for x in items]

    mb = MicroBatcher(run_batch, max_batch=8, name="mb2test", workers=2)
    results = {}

    def submit(i):
        results[i] = mb.submit(i)

    ths = [threading.Thread(target=submit, args=(i,)) for i in range(64)]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    assert results == {i: i * 10 for i in range(64)}
    assert peak[0] == 2  # both workers ran windows concurrently
    hist = {k: v for k, v in GLOBAL_METRICS._counters.items()
            if k.startswith("mb2test_window_le_")}
    assert sum(hist.values()) >= 8  # 64 items / max_batch 8


def test_microbatcher_stop_releases_worker_threads():
    """stop() must terminate the daemon workers AND release the bound
    run_batch reference: each live worker pins the callback's owner (the
    engine) — and through it the index device arrays — for the process
    lifetime."""
    import gc
    import weakref

    class Owner:
        def run(self, items):
            return [i * 2 for i in items]

    owner = Owner()
    mb = MicroBatcher(owner.run, max_batch=4, workers=2)
    assert mb.submit(3) == 6
    threads = list(mb._threads)
    assert any(t.is_alive() for t in threads)
    mb.stop()
    assert all(not t.is_alive() for t in threads)
    ref = weakref.ref(owner)
    del owner, mb
    gc.collect()
    assert ref() is None  # nothing holds the engine once workers are gone


def test_engine_shutdown_stops_microbatcher(tmp_path):
    cfg = Config(persist_dir=str(tmp_path / "vs"),
                 kb_db_path=str(tmp_path / "kb.sqlite3"),
                 db_path=str(tmp_path / "app.sqlite3"),
                 docs_dir=str(tmp_path / "docs"),
                 index_dtype="float32", use_pallas=False,
                 summarize_mode="off", microbatch=True)
    eng = RagEngine(cfg, encoder=FakeEncoder())
    assert eng.query_vector("hello", 3, None, None) == []
    mb = eng._microbatcher
    assert mb is not None
    eng.shutdown()
    assert eng._microbatcher is None
    assert all(not t.is_alive() for t in mb._threads)
    # post-shutdown queries fall back to the non-batched path, not crash
    assert eng.query_vector("hello again", 3, None, None) == []


def test_large_windows_beyond_64(tmp_path):
    """The high-throughput serving config (MICROBATCH_MAX=256) must fuse
    windows past the old 64 cap and serve every request correctly."""
    enc = CountingEncoder()
    cfg = Config(
        persist_dir=str(tmp_path / "vs_big"),
        kb_db_path=str(tmp_path / "db_big/kb.sqlite3"),
        db_path=str(tmp_path / "db_big/app.sqlite3"),
        docs_dir=str(tmp_path / "docs_big"),
        index_dtype="float32", use_pallas=False, summarize_mode="off",
        microbatch=True, microbatch_max=256, microbatch_workers=1,
    )
    eng = RagEngine(cfg, encoder=enc)
    docs = [f"alpha beta doc{i} topic{i % 4}" for i in range(32)]
    eng.index.add([f"d{i}" for i in range(32)], enc.embed(docs), docs,
                  [{} for _ in range(32)])
    enc.calls = 0
    results = {}

    def worker(i):
        results[i] = eng.query_vector(f"alpha doc{i % 32}", 3, None, None)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(150)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 150
    assert all(len(v) > 0 for v in results.values())
    # single worker + 0.01s emulated device RTT: 150 concurrent arrivals
    # must fuse into far fewer passes than requests, and at least one
    # window must exceed the old 64 cap
    assert enc.calls < 150
    from tpu_rag.utils.metrics import GLOBAL_METRICS

    hist = [line.split(" ")[0] for line in GLOBAL_METRICS.render().splitlines()
            if line.startswith("vector_microbatch_window_le_")]
    big = [k for k in hist
           if int(k.split("_le_")[1].split("_")[0]) > 64]
    assert big, f"no window exceeded 64: {hist}"
    eng.shutdown()


def test_hold_coalesces_stragglers_while_window_in_flight():
    """Adaptive hold (VERDICT r3 #6): while another worker has a window in
    flight, a worker holding a sub-full batch waits up to hold_ms for
    stragglers instead of dispatching size-1 windows (BENCH_r03 measured 88
    of ~360 windows at size 1 under concurrency 256)."""
    import threading
    import time as _t

    from tpu_rag.utils.microbatch import MicroBatcher

    release = threading.Event()
    windows = []
    lock = threading.Lock()

    def run_batch(items):
        if items and items[0] == "blocker":
            release.wait(5.0)  # keep this window in flight
        else:
            with lock:
                windows.append(len(items))
        return list(items)

    mb = MicroBatcher(run_batch, max_batch=64, workers=2, hold_ms=150.0)
    blocker = threading.Thread(target=mb.submit, args=("blocker",))
    blocker.start()
    _t.sleep(0.05)  # worker A is now inside run_batch (in flight)

    # stragglers arrive 5 ms apart — without the hold, worker B would run
    # most of them as size-1 windows; with a 150 ms hold keyed on A's
    # in-flight window they coalesce
    ths = [threading.Thread(target=mb.submit, args=(i,)) for i in range(8)]
    for t in ths:
        t.start()
        _t.sleep(0.005)
    for t in ths:
        t.join()
    release.set()
    blocker.join()
    mb.stop()
    assert sum(windows) == 8
    assert len(windows) <= 3, f"stragglers did not coalesce: {windows}"


def test_no_hold_when_idle():
    """An idle server (no window in flight) must dispatch immediately —
    the hold only ever hides behind an in-flight window."""
    import time as _t

    from tpu_rag.utils.microbatch import MicroBatcher

    mb = MicroBatcher(lambda items: list(items), max_batch=64,
                      workers=2, hold_ms=2000.0)
    t0 = _t.monotonic()
    assert mb.submit(7) == 7
    took = _t.monotonic() - t0
    mb.stop()
    assert took < 1.0, f"idle dispatch paid the hold: {took:.3f}s"
