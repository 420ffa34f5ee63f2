from tpu_rag.models.tokenizer import HashTokenizer, WordPieceTokenizer, load_tokenizer
from tpu_rag.models.biencoder import BiEncoder, MODEL_SPECS, spec_for_model
from tpu_rag.models.crossencoder import CrossEncoder

__all__ = [
    "HashTokenizer",
    "WordPieceTokenizer",
    "load_tokenizer",
    "BiEncoder",
    "CrossEncoder",
    "MODEL_SPECS",
    "spec_for_model",
]
