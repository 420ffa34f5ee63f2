"""CPU baselines the TPU engine is measured against (BASELINE.md config #1)."""

from tpu_rag.baseline.hnsw_cpu import CpuHnswIndex

__all__ = ["CpuHnswIndex"]
