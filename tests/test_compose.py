"""Unit tests for the compose subsystem: ThinkFolder, language policy,
style controller, recency mix, highlight, summarizer cache, history blocks.
None of this was tested in the reference (SURVEY.md §4 "Not tested at all")."""

import time

import numpy as np

from tpu_rag.compose.language import build_user_content, language_policy, norm_lang, wrap_context
from tpu_rag.compose.prompts import CREATIVE_SYS, STRICT_SYS, prepare_messages
from tpu_rag.compose.style import style_temperature, style_to_controller
from tpu_rag.compose.summarize import Summarizer
from tpu_rag.compose.think import ThinkFolder
from tpu_rag.retrieval.hybrid import base_similarity, highlight, mix_with_recency


# ------------------------------------------------------------- ThinkFolder

def fold(tokens):
    f = ThinkFolder()
    events = []
    for t in tokens:
        events.extend(f.feed(t))
    events.extend(f.flush())
    text = "".join(e["data"] for e in events if e["type"] == "text")
    reasoning = "".join(e["data"] for e in events if e["type"] == "reasoning")
    return text, reasoning


def test_thinkfolder_simple():
    text, reasoning = fold(["<think>secret</think>visible"])
    assert reasoning == "secret" and text == "visible"


def test_thinkfolder_fragmented_tags():
    text, reasoning = fold(["<th", "ink>ab", "c</thi", "nk>xy", "z"])
    assert reasoning == "abc" and text == "xyz"


def test_thinkfolder_no_tags():
    text, reasoning = fold(["hello ", "world"])
    assert text == "hello world" and reasoning == ""


def test_thinkfolder_unclosed_think_flushes_reasoning():
    text, reasoning = fold(["<think>never closed"])
    assert reasoning == "never closed" and text == ""


def test_thinkfolder_multiple_spans():
    text, reasoning = fold(["a<think>1</think>b<think>2</think>c"])
    assert text == "abc" and reasoning == "12"


def test_thinkfolder_false_partial():
    # '<th' that never completes into '<think>' must be emitted as text
    text, reasoning = fold(["<th", "is is text"])
    assert text == "<this is text" and reasoning == ""


# ------------------------------------------------------------- language

def test_norm_lang_aliases():
    assert norm_lang("zh-Hant") == "zh-tw"
    assert norm_lang("zh_HK") == "zh-tw"
    assert norm_lang("zh-hans") == "zh-cn"
    assert norm_lang("EN-US") == "en"
    assert norm_lang("") == "zh-tw"
    assert norm_lang("", default="en") == "en"
    assert norm_lang("pt") == "pt"  # unknown passes through


def test_language_policy_coverage():
    for lang in ("zh-tw", "zh-cn", "ja", "ko", "en", "fr", "de", "es"):
        user, system = language_policy(lang)
        assert user and system
    user, system = language_policy("sw")  # fallback names the language
    assert "'sw'" in user and "'sw'" in system


def test_build_user_content_markers():
    content = build_user_content("my query", "ctx here", "en", "200", "GUARD")
    assert content.startswith("GUARD\n")
    assert "<<<HISTORY+RAG CONTEXT>>>\nctx here\n<<<END>>>" in content
    assert "my query" in content and "200" in content


def test_wrap_context():
    assert wrap_context("x") == "<<<HISTORY+RAG CONTEXT>>>\nx\n<<<END>>>"


# ------------------------------------------------------------- style / prompts

def test_style_temperature_tones():
    assert style_temperature(None) == 0.4
    assert style_temperature({"tone": "playful", "hedging": 0.3}) == 0.8
    assert style_temperature({"tone": "expert", "hedging": 0.3}) == 0.35
    # hedging nudges temperature
    assert style_temperature({"tone": "neutral", "hedging": 1.0}) > 0.4
    assert style_temperature({"tone": "neutral", "hedging": 0.0}) < 0.4


def test_style_controller_fields():
    ctrl = style_to_controller({"tone": "teacher", "directness": 0.9})
    assert "teacher" in ctrl and "0.90" in ctrl
    assert style_to_controller(None) == ""


def test_prepare_messages_structure():
    msgs, temp = prepare_messages("q", "ctx", "strict", "en")
    assert msgs[0]["content"] == STRICT_SYS
    assert msgs[0]["role"] == "system" and msgs[1]["role"] == "system"
    assert msgs[-1]["role"] == "user"
    assert len(msgs) == 3  # no style -> no tone controller
    assert temp == 0.4
    msgs, _ = prepare_messages("q", "ctx", "creative", "en", style={"tone": "playful"})
    assert msgs[0]["content"] == CREATIVE_SYS
    assert len(msgs) == 4


# ------------------------------------------------------------- recency

def test_base_similarity_prefers_rerank_score():
    assert base_similarity({"rerank_score": 2.5, "score": 0.1}) == 2.5
    assert base_similarity({"score": 1.0}) == 0.5  # 1/(1+1)
    assert base_similarity({}) == 0.0


def test_mix_with_recency_orders_by_blend():
    now = int(time.time())
    hits = [
        {"id": "old-strong", "score": 0.0, "metadata": {"updated_ts": now - 400 * 86400}},
        {"id": "new-weak", "score": 1.0, "metadata": {"updated_ts": now}},
    ]
    mixed = mix_with_recency(hits, alpha=0.2, half_life_days=45)
    assert mixed[0]["id"] == "new-weak"  # low alpha -> recency dominates
    assert mixed[0]["rank"] == 1 and mixed[1]["rank"] == 2
    assert all("mixed_score" in h and "recency_score" in h for h in mixed)
    mixed = mix_with_recency(hits, alpha=1.0, half_life_days=45)
    assert mixed[0]["id"] == "old-strong"  # alpha 1 -> similarity only


# ------------------------------------------------------------- highlight

def test_highlight_sentences():
    # CJK enders (。！？) and newlines split sentences; latin '.' does not
    # (reference _SENT_SPLIT, api/app.py:525)
    spans = highlight("dragon", "The dragon sleeps！Knights ride。龍在山上\nCats purr")
    assert spans == ["The dragon sleeps"]
    spans = highlight("龍", "The dragon sleeps。龍在山上！Cats purr")
    assert spans == ["龍在山上"]
    assert highlight("", "whatever") == []


# ------------------------------------------------------------- summarizer

def test_summarizer_cache_and_fallback():
    calls = []

    def gen(messages, **kw):
        calls.append(messages)
        return "SUMMARY", "fake"

    s = Summarizer(gen, default_language="en")
    out1 = s.summarize_chunk("long text", "en", 100)
    out2 = s.summarize_chunk("long text", "en", 100)
    assert out1 == out2 == "SUMMARY"
    assert len(calls) == 1  # cached

    def failing(messages, **kw):
        raise RuntimeError("backend down")

    s2 = Summarizer(failing, default_language="en")
    assert s2.summarize_chunk("raw text stays", "en", 100) == "raw text stays"


def test_summarizer_off_mode_truncates():
    s = Summarizer(lambda *a, **k: (_ for _ in ()).throw(RuntimeError), mode="off")
    assert s.summarize_chunk("x" * 1000, "en", 100) == "x" * 100


def test_build_context_budget():
    s = Summarizer(lambda m, **k: ("S", "f"), mode="off")
    hits = [{"id": f"h{i}", "text": "t" * 500} for i in range(20)]
    ctx, used = s.build_context(hits, "en", max_chars=2000, max_chars_per_chunk=400)
    assert used < 20 and len(ctx) <= 2000
    assert ctx.count("<<<CHUNK id=") == used


def test_recency_mix_with_bm25_hits():
    """mix_with_recency must rank FTS hits by bm25 family semantics (more
    negative = better): 1/(1+d) inverted their order and divided by zero at
    exactly -1.0."""
    import time as _time

    from tpu_rag.retrieval.hybrid import mix_with_recency

    now = int(_time.time())
    hits = [
        {"id": "strong-fts", "score": -5.0, "score_kind": "bm25",
         "metadata": {"updated_ts": now}},
        {"id": "edge-fts", "score": -1.0, "score_kind": "bm25",
         "metadata": {"updated_ts": now}},
        {"id": "weak-fts", "score": -0.2, "score_kind": "bm25",
         "metadata": {"updated_ts": now}},
    ]
    mixed = mix_with_recency(hits)
    assert [h["id"] for h in mixed] == ["strong-fts", "edge-fts", "weak-fts"]


def test_summarizer_does_not_cache_llm_failures():
    from tpu_rag.compose.summarize import Summarizer

    calls = []

    def flaky(messages, **kw):
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("backend down")
        return "short summary", "x"

    s = Summarizer(flaky, default_language="en", mode="llm")
    assert s.summarize_chunk("long text " * 50, "en") .startswith("long text")
    # backend recovered: the failure must NOT have been cached
    assert s.summarize_chunk("long text " * 50, "en") == "short summary"
    assert len(calls) == 2


def test_thread_summary_mode_off_rolls_tail(tmp_path):
    """SUMMARIZE_MODE=off keeps a rolling tail of plain exchanges — the old
    head-truncated scaffold froze once it hit the cap and nested
    'Previous summary:' labels."""
    from tpu_rag.compose.history import update_thread_summary
    from tpu_rag.compose.summarize import Summarizer
    from tpu_rag.memory.db import ConversationDB

    db = ConversationDB(str(tmp_path / "t.sqlite3"))
    s = Summarizer(lambda m, **k: ("", "x"), default_language="en", mode="off")
    for i in range(30):
        update_thread_summary(db, s, "t1", f"question {i}", "answer " * 30, "en")
    summ = db.get_summary("t1")
    assert "Previous summary:" not in summ
    assert "question 29" in summ       # latest exchange present
    assert len(summ) <= 800
