from tpu_rag.ops.topk import fused_matmul_topk, topk_xla_reference, PAD_TAG
from tpu_rag.ops.quant import quantize_int8_rows, dequantize_int8_rows
from tpu_rag.ops.kmeans import assign_clusters, kmeans

__all__ = [
    "fused_matmul_topk",
    "topk_xla_reference",
    "PAD_TAG",
    "quantize_int8_rows",
    "dequantize_int8_rows",
    "assign_clusters",
    "kmeans",
]
