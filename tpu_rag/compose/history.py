"""Conversation-memory block assembly.

Parity with reference api/app.py:509-523 + api/routes/chat.py:160-164:
rolling thread summary (re-summarized to <=400 chars) + recent messages
(re-summarized to <=200 chars each) as <<<HISTORY_SUMMARY>>> /
<<<HISTORY_RECENT>>> blocks; after each reply the summary is regenerated
from "Previous summary + New exchange".
"""

from __future__ import annotations

from tpu_rag.compose.summarize import Summarizer
from tpu_rag.memory.db import ConversationDB


def format_history_block(db: ConversationDB, summarizer: Summarizer,
                         thread_id: str, language: str | None,
                         max_turns: int = 6, max_chars: int = 1200) -> str:
    recent = db.load_recent_messages(thread_id, max_turns=max_turns, max_chars=max_chars)
    summ = db.get_summary(thread_id)
    parts: list[str] = []
    if summ:
        s = summarizer.summarize_chunk(summ, language, max_chars_per_chunk=400)
        parts.append(f"<<<HISTORY_SUMMARY>>>\n{s}\n<<<END_HISTORY_SUMMARY>>>")
    if recent:
        lines = []
        for role, content in recent:
            one = summarizer.summarize_chunk(content, language, max_chars_per_chunk=200)
            tag = "U" if role == "user" else "A"
            lines.append(f"{tag}: {one}")
        parts.append("<<<HISTORY_RECENT>>>\n" + "\n".join(lines) + "\n<<<END_HISTORY_RECENT>>>")
    return "\n\n".join(parts) if parts else ""


def update_thread_summary(db: ConversationDB, summarizer: Summarizer,
                          thread_id: str, query: str, draft: str,
                          lang: str | None) -> None:
    prev = db.get_summary(thread_id)
    update_src = f"Previous summary:\n{prev}\n\nNew exchange:\nU: {query}\nA: {draft}\n"
    new_summary = summarizer.summarize_chunk(update_src, lang, max_chars_per_chunk=800)
    if new_summary:
        db.set_summary(thread_id, new_summary, lang)
