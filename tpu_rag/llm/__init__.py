from tpu_rag.llm.dispatch import LLMDispatcher

__all__ = ["LLMDispatcher"]
