"""Multi-host initialization scaffolding.

Single-host meshes need nothing; on a multi-host TPU slice jax.distributed
must initialize before any backend use so jax.devices() sees every chip.
Driven by env (set by the TPU runtime or the operator):

  JAX_COORDINATOR_ADDRESS  host:port of process 0
  JAX_NUM_PROCESSES        total processes (optional with TPU autodetect)
  JAX_PROCESS_ID           this process's id (optional with TPU autodetect)

scripts/serve.py calls maybe_init_distributed() at startup; it is a no-op
when no coordinator is configured.  DCN-aware meshes: put the host axis
first in MESH_SHAPE (e.g. "host:2,data:8") so XLA maps the outer axis onto
DCN and the inner onto ICI.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed from env. Returns True when initialized."""
    coordinator = os.getenv("JAX_COORDINATOR_ADDRESS")
    if not coordinator:
        return False
    import jax

    kwargs: dict = {"coordinator_address": coordinator}
    if os.getenv("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.getenv("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    logger.info("jax.distributed initialized: process %s of %s",
                jax.process_index(), jax.process_count())
    return True


def device_row_bounds(n_pad: int) -> tuple[int, int]:
    """Row range [lo, hi) of a length-n_pad row-sharded array owned by THIS
    process, assuming the mesh enumerates jax.devices() in default order
    (process-major) and n_pad divides evenly by the global device count."""
    import jax

    rows_per_device = n_pad // jax.device_count()
    local = jax.local_device_count()
    lo = jax.process_index() * local * rows_per_device
    return lo, lo + local * rows_per_device


def load_sharded_flat_distributed(path, *, mesh=None, axis: str = "data",
                                  dtype: str = "bfloat16", use_pallas: bool = True,
                                  block_n: int = 8192):
    """Multi-host load of a persisted flat index (SURVEY.md §2.5 DCN row).

    Each process reads ONLY its row range of vectors.f32 (np.memmap — the
    other hosts' rows never leave disk) and contributes it to the global
    row-sharded device array via jax.make_array_from_process_local_data;
    XLA routes the search's all_gather over ICI within a host and DCN
    across hosts.  ids/metadata/documents replicate on every host (they are
    needed to assemble results and are small next to the vectors).

    The returned index is READ-ONLY: multi-host mutation requires a
    coordinated re-shard — rebuild the store (save_index on one host, or
    from DOCS_DIR) and reload.  Single-process callers get the same layout
    on one host, so this path is testable without a pod.
    """
    import json as _json
    from pathlib import Path

    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpu_rag.index.store import MANIFEST
    from tpu_rag.ops.topk import PAD_TAG
    from tpu_rag.parallel.mesh import mesh_from_spec
    from tpu_rag.parallel.sharded import ShardedFlatIndex

    p = Path(path)
    manifest = _json.loads((p / MANIFEST).read_text(encoding="utf-8"))
    n, dim = manifest["count"], manifest["dim"]
    if dtype == "auto":
        # resolve here (the snapshot below is assembled outside
        # FlatIndex._compact): same rule as FlatIndex.dtype
        dtype = "int8" if n >= 2_000_000 else "bfloat16"
    mesh = mesh or mesh_from_spec("")
    d_ax = mesh.shape[axis]

    class _DistributedFlatIndex(ShardedFlatIndex):
        kind = "dist_flat"
        _READONLY_MSG = ("distributed index is read-only on multi-host: "
                         "mutations need a coordinated re-shard — rebuild the "
                         "store and reload (see parallel/distributed.py)")

        def add(self, *a, **k):
            raise RuntimeError(self._READONLY_MSG)

        upsert = add

        def delete(self, *a, **k):
            raise RuntimeError(self._READONLY_MSG)

    idx = _DistributedFlatIndex(dim, mesh=mesh, axis=axis, dtype=dtype,
                                use_pallas=use_pallas, block_n=block_n)
    # replicated result-assembly state (every host can answer any hit):
    # ids/docs/metas stream into the row store (RAM lists by default,
    # SQLite with TPU_RAG_DOCMETA_BACKING=disk), the exact-refine master
    # copy is a read-only memmap adopted zero-copy — only the few rows a
    # refine touches ever page in
    from tpu_rag.index.store import iter_store_ids

    ids = iter_store_ids(p / manifest["files"]["ids"])

    def _doc_meta_iter():
        with open(p / manifest["files"]["meta"], encoding="utf-8") as fm, \
                open(p / manifest["files"]["docs"], encoding="utf-8") as fd:
            for mline, dline in zip(fm, fd):
                if mline.strip():
                    yield _json.loads(dline), _json.loads(mline)

    idx._bulk_adopt_rows(
        np.memmap(p / manifest["files"]["vectors"], dtype=np.float32,
                  mode="r", shape=(n, dim)),
        ids, _doc_meta_iter(), count=n)

    # padded global layout (same as ShardedFlatIndex._compact)
    unit = jax.device_count() * 256
    n_pad = max(unit, -(-n // unit) * unit)
    lo, hi = device_row_bounds(n_pad)
    local_rows = np.arange(lo, min(hi, n))
    local = np.zeros((hi - lo, dim), np.float32)
    if len(local_rows):
        local[: len(local_rows)] = idx._vectors[lo:lo + len(local_rows)]
    ns_local = np.full((hi - lo,), PAD_TAG, np.int32)
    canon_local = np.full((hi - lo,), PAD_TAG, np.int32)
    if len(local_rows):
        ns_local[: len(local_rows)] = idx._ns[local_rows]
        canon_local[: len(local_rows)] = idx._canon[local_rows]

    def put(arr, spec):
        sharding = NamedSharding(mesh, spec)
        global_shape = (n_pad,) + arr.shape[1:]
        return jax.make_array_from_process_local_data(sharding, arr, global_shape)

    snap = {"rows": np.arange(n), "n": n, "n_pad": n_pad}
    if dtype == "int8":
        from tpu_rag.index.flat import _quantize_int8_np
        vals, scales = _quantize_int8_np(local)
        scales[len(local_rows):] = 0.0
        snap["vectors"] = put(vals, P(axis, None))
        snap["scales"] = put(scales.astype(np.float32), P(axis))
    else:
        jdt = jnp.bfloat16 if dtype == "bfloat16" else np.float32
        snap["vectors"] = put(local.astype(jdt), P(axis, None))
        snap["scales"] = put(np.ones((hi - lo,), np.float32), P(axis))
    snap["ns"] = put(ns_local, P(axis))
    snap["canon"] = put(canon_local, P(axis))
    idx._device = snap
    idx._dirty = False
    logger.info("distributed load: process %s owns rows [%d, %d) of %d",
                jax.process_index(), lo, hi, n_pad)
    return idx
