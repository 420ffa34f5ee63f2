from tpu_rag.index.filter import TagVocab
from tpu_rag.index.flat import FlatIndex, SearchResult
from tpu_rag.index.ivf import IVFIndex
from tpu_rag.index.store import load_index, save_index

__all__ = [
    "TagVocab",
    "FlatIndex",
    "IVFIndex",
    "SearchResult",
    "load_index",
    "save_index",
]
