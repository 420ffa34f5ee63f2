"""Index persistence: manifest + raw binary shards.

The TPU equivalent of Chroma's persist dir (reference vector_store/ —
chroma.sqlite3 + hnswlib data_level0.bin/link_lists.bin segments): a
directory per collection holding

    manifest.json   — dims, dtype, metric, kind, counts, shard list
    vectors.f32     — row-major float32 master vectors
    ids.json        — string ids (row order)
    meta.jsonl      — one metadata JSON object per row
    docs.jsonl      — one JSON-encoded document string per row

The index is always rebuildable from DOCS_DIR (same durability contract as
the reference, SURVEY.md §5 "Checkpoint / resume"), so the store favors
simplicity + mmap-ability over compression.  Quantized/bf16 device forms are
derived at load time; centroids are recomputed (cheap, on device).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from tpu_rag.index.flat import FlatIndex
from tpu_rag.index.ivf import IVFIndex

MANIFEST = "manifest.json"


def save_index(index: FlatIndex, path: str | Path) -> None:
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    # Hold the index lock across the metadata snapshot AND the streamed
    # vector write so both see the same live set; the vector rows stream
    # from the arena (RAM bounded by one chunk, even for disk-backed
    # masters that exceed host RAM).
    with index._lock:
        state = index.state(include_vectors=False)
        live = np.flatnonzero(index._alive)
        count = index._arena.write_rows(p / "vectors.f32", rows=live)
    manifest = {
        "format_version": 1,
        "kind": state["kind"],
        "dim": state["dim"],
        "dtype": state["dtype"],
        "metric": state["metric"],
        "count": count,
        "files": {"vectors": "vectors.f32", "ids": "ids.json",
                  "meta": "meta.jsonl", "docs": "docs.jsonl"},
    }
    if isinstance(index, IVFIndex):
        manifest["ivf"] = {"nlist": index.nlist, "nprobe": index.nprobe}
        if index._cached_centroids is not None:
            index._cached_centroids.astype(np.float32).tofile(p / "centroids.f32")
            manifest["ivf"]["centroids"] = "centroids.f32"
            manifest["ivf"]["centroids_shape"] = list(index._cached_centroids.shape)
            manifest["ivf"]["trained_n"] = int(index._centroids_trained_n)
    (p / "ids.json").write_text(json.dumps(state["ids"], ensure_ascii=False), encoding="utf-8")
    with open(p / "meta.jsonl", "w", encoding="utf-8") as f:
        for m in state["metadatas"]:
            f.write(json.dumps(m, ensure_ascii=False) + "\n")
    with open(p / "docs.jsonl", "w", encoding="utf-8") as f:
        for d in state["documents"]:
            f.write(json.dumps(d, ensure_ascii=False) + "\n")
    # Write manifest last: its presence marks a complete snapshot.
    (p / MANIFEST).write_text(json.dumps(manifest, indent=2), encoding="utf-8")


def load_index(path: str | Path, **overrides) -> FlatIndex:
    p = Path(path)
    manifest = json.loads((p / MANIFEST).read_text(encoding="utf-8"))
    count = manifest["count"]
    dim = manifest["dim"]
    # read-only memmap: the index adopts it zero-copy (FlatIndex._bulk_adopt)
    # so opening a 100M-row store costs no read of the vector file; the
    # first mutation migrates rows to a writable (RAM or disk) backing
    vectors = np.memmap(p / manifest["files"]["vectors"], dtype=np.float32,
                        mode="r", shape=(count, dim)) if count else \
        np.zeros((0, dim), np.float32)
    ids = json.loads((p / manifest["files"]["ids"]).read_text(encoding="utf-8"))
    metadatas = [json.loads(line) for line in
                 (p / manifest["files"]["meta"]).read_text(encoding="utf-8").splitlines() if line]
    documents = [json.loads(line) for line in
                 (p / manifest["files"]["docs"]).read_text(encoding="utf-8").splitlines() if line]
    state = {
        "kind": manifest["kind"],
        "dim": dim,
        "dtype": overrides.pop("dtype", manifest["dtype"]),
        "metric": manifest["metric"],
        "vectors": vectors,
        "ids": ids,
        "metadatas": metadatas,
        "documents": documents,
    }
    if manifest["kind"] == "ivf":
        ivf_cfg = manifest.get("ivf", {})
        overrides.setdefault("nlist", ivf_cfg.get("nlist", 0))
        overrides.setdefault("nprobe", ivf_cfg.get("nprobe", 8))
        loaded = IVFIndex.from_state(state, **overrides)
        if "centroids" in ivf_cfg:
            shape = tuple(ivf_cfg["centroids_shape"])
            loaded._cached_centroids = np.fromfile(
                p / ivf_cfg["centroids"], dtype=np.float32).reshape(shape)
            loaded._centroids_trained_n = int(ivf_cfg.get("trained_n", count))
        return loaded
    return FlatIndex.from_state(state, **overrides)
