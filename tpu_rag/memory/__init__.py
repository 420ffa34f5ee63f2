from tpu_rag.memory.db import ConversationDB

__all__ = ["ConversationDB"]
