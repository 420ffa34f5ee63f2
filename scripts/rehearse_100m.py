#!/usr/bin/env python
"""100M-scale machinery rehearsal on the virtual CPU mesh (VERDICT r3 #8).

BASELINE config #5 (100M rows) needs three pieces of plumbing that no
single-chip bench exercises together: the disk-backed master arena
(index/arena.py memmap), the SQLite row store (index/rowmeta.py,
docmeta_backing="disk" — 100M python strings would be tens of GB of host
RAM), and the STREAMED sharded device build (parallel/sharded.py _compact —
host temporaries O(n_pad / devices), never the whole padded corpus).

This script proves them end-to-end at >= 5M rows on an 8-virtual-device CPU
mesh, with a sampled host-RSS bound asserted:

  python scripts/rehearse_100m.py --rows 5000000 --dim 64

On a CPU mesh the "device" shards themselves live in host RAM, so the bound
is  rss_peak - rss_base <= device_resident_bytes + slack  — the master
vectors and the 5M-row id/doc/meta store must NOT show up in RSS (they are
on disk), and build temporaries must stay O(shard).  Prints one JSON line
and exits non-zero if the bound (or serving correctness) fails.
Recorded artifact: docs/SCALE_REHEARSAL.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"


def _rss_mb(field: str = "RssAnon") -> float:
    """Anonymous RSS by default: the O(shard)-temporaries claim is about
    ANONYMOUS host allocations.  File-backed memmap pages (the disk master
    arena) also show in VmRSS while dirty, but they are kernel-reclaimable
    under pressure — at 100M x 384 the 153 GB master MUST page, and it can;
    an anonymous O(n) buffer cannot.  VmRSS is reported alongside."""
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith(field + ":"):
                return int(line.split()[1]) / 1024.0
    return 0.0


class RssMonitor:
    def __init__(self, period_s: float = 0.2) -> None:
        self.peak = _rss_mb()
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._loop, args=(period_s,),
                                   daemon=True)
        self._t.start()

    def _loop(self, period_s: float) -> None:
        while not self._stop.wait(period_s):
            self.peak = max(self.peak, _rss_mb())

    def stop(self) -> float:
        self._stop.set()
        self._t.join(timeout=2.0)
        self.peak = max(self.peak, _rss_mb())
        return self.peak


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=5_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=250_000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--workdir", default="/tmp/rehearse_100m")
    ap.add_argument("--slack-mb", type=float, default=1536.0,
                    help="allowed RSS beyond the device-resident bytes: "
                    "per-shard f32 build temporaries (n_pad/8 x dim x 4), "
                    "XLA/compile arenas, python overhead")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from tpu_rag.parallel.mesh import mesh_from_spec
    from tpu_rag.parallel.sharded import ShardedFlatIndex

    os.makedirs(args.workdir, exist_ok=True)
    mesh = mesh_from_spec("")  # all 8 virtual devices on one axis
    d_ax = int(np.prod(list(mesh.shape.values())))

    rss_base = _rss_mb()
    mon = RssMonitor()
    t0 = time.time()

    idx = ShardedFlatIndex(
        args.dim, mesh=mesh, dtype="bfloat16", use_pallas=False,
        master_backing="disk", docmeta_backing="disk",
        master_dir=args.workdir)

    # --- streamed ingest: per-chunk host temporaries only -----------------
    rng = np.random.default_rng(0)
    planted = {}  # query row -> global position (for the serving check)
    ingest_rows = 0
    while ingest_rows < args.rows:
        rows = min(args.chunk, args.rows - ingest_rows)
        x = rng.standard_normal((rows, args.dim)).astype(np.float32)
        ids = [f"r{ingest_rows + i}" for i in range(rows)]
        docs = [f"doc {ingest_rows + i}" for i in range(rows)]
        idx.add(ids, x, docs, [{} for _ in range(rows)])
        if not planted:  # remember a handful of first-chunk rows as queries
            for qi in range(8):
                planted[qi] = (ids[qi], x[qi].copy())
        del x, ids, docs
        ingest_rows += rows
    ingest_s = time.time() - t0

    # --- streamed sharded device build (first search triggers _compact) ---
    t1 = time.time()
    q = np.stack([v for _, v in planted.values()])
    res = idx.search(q, args.k)
    build_s = time.time() - t1

    # serving correctness: each planted row must be its own top-1 (the
    # corpus is random gaussian — nothing is closer than the row itself)
    self_hits = sum(res.ids[qi][0] == planted[qi][0]
                    for qi in range(len(planted)))

    # incremental mutation at scale: O(doc) append + tag-kill, then search
    t2 = time.time()
    xq = rng.standard_normal((1, args.dim)).astype(np.float32)
    idx.add(["late-row"], xq, ["late doc"], [{}])
    idx.delete(["r5"])
    res2 = idx.search(xq, args.k)
    incr_s = time.time() - t2
    incr_ok = res2.ids[0][0] == "late-row"

    rss_peak = mon.stop()
    vmrss_end = _rss_mb("VmRSS")
    snap = idx.device_snapshot()
    n_pad = snap["n_pad"]
    # device-resident bytes on the CPU mesh (these legitimately live in
    # RSS): bf16 base + int8 residuals + f32 scales x2 + int32 tags x2
    dev_bytes = n_pad * (args.dim * 2 + args.dim * 1 + 4 + 4 + 4 + 4)
    budget_mb = dev_bytes / 1e6 + args.slack_mb
    rss_delta = rss_peak - rss_base

    report = {
        "rows": args.rows, "dim": args.dim, "devices": d_ax,
        "backings": {"master": "disk", "docmeta": "disk"},
        "ingest_s": round(ingest_s, 1),
        "build_and_first_search_s": round(build_s, 1),
        "incremental_mutation_s": round(incr_s, 1),
        "self_hits": f"{self_hits}/{len(planted)}",
        "incremental_ok": bool(incr_ok),
        "rss_anon_base_mb": round(rss_base, 1),
        "rss_anon_peak_mb": round(rss_peak, 1),
        "rss_anon_delta_mb": round(rss_delta, 1),
        "vmrss_end_mb": round(vmrss_end, 1),  # incl. reclaimable file pages
        "device_resident_mb": round(dev_bytes / 1e6, 1),
        "rss_budget_mb": round(budget_mb, 1),
        "rss_ok": bool(rss_delta <= budget_mb),
        "passed": bool(rss_delta <= budget_mb
                       and self_hits == len(planted) and incr_ok),
    }
    print(json.dumps(report))
    return 0 if report["passed"] else 1


if __name__ == "__main__":
    sys.exit(main())
