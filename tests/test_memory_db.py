"""ConversationDB schema/behavior tests (reference api/db.py parity)."""

from tpu_rag.memory.db import ConversationDB


def test_messages_roundtrip(tmp_path):
    db = ConversationDB(str(tmp_path / "app.sqlite3"))
    db.save_message("t1", "user", "hello", "en")
    db.save_message("t1", "assistant", "hi there", "en")
    db.save_message("t2", "user", "other thread", None)
    msgs = db.thread_messages("t1")
    assert [(m["role"], m["content"]) for m in msgs] == [("user", "hello"), ("assistant", "hi there")]
    threads = db.list_threads()
    assert {t["thread_id"] for t in threads} == {"t1", "t2"}
    assert all(t["count"] >= 1 for t in threads)


def test_recent_messages_char_budget(tmp_path):
    db = ConversationDB(str(tmp_path / "a.sqlite3"))
    for i in range(10):
        db.save_message("t", "user", f"msg{i:02d}" + "x" * 96, "en")  # ~101 chars each
    recent = db.load_recent_messages("t", max_turns=6, max_chars=250)
    # newest-backwards budget: only 2 fit in 250 chars; returned oldest-first
    assert len(recent) == 2
    assert recent[0][1].startswith("msg08")
    assert recent[1][1].startswith("msg09")


def test_summary_upsert(tmp_path):
    db = ConversationDB(str(tmp_path / "a.sqlite3"))
    assert db.get_summary("t") == ""
    db.set_summary("t", "first", "en")
    db.set_summary("t", "second", "en")
    assert db.get_summary("t") == "second"


def test_kb_items_fts_triggers(tmp_path):
    db = ConversationDB(str(tmp_path / "a.sqlite3"))
    db.upsert_kb_item("wiki", "r1", "Dragons", "dragons breathe fire")
    db.upsert_kb_item("wiki", "r2", "Knights", "knights wear armor")
    hits = db.search_kb_fts("dragons")
    assert len(hits) == 1
    assert hits[0]["id"] == "db:wiki:r1"
    assert hits[0]["title"] == "Dragons"
    assert hits[0]["score"] < 0  # fts5 bm25 is negative for matches
    # update replaces content in the FTS index (kb_au trigger)
    db.upsert_kb_item("wiki", "r1", "Dragons", "wyverns soar high")
    assert db.search_kb_fts("fire") == []  # old content gone
    assert db.search_kb_fts("wyverns")[0]["id"] == "db:wiki:r1"


def test_kb_upsert_concurrent_no_duplicates(tmp_path):
    """Concurrent upserts of the same (source, ref_id) must end as ONE row
    (the old SELECT-then-INSERT raced and left permanent duplicates)."""
    import threading

    from tpu_rag.memory.db import ConversationDB

    db = ConversationDB(str(tmp_path / "kb.sqlite3"))
    start = threading.Barrier(8)

    def up(i):
        start.wait()
        for j in range(10):
            db.upsert_kb_item("lore", "ref-1", f"title {i}-{j}", "same item")

    threads = [threading.Thread(target=up, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    hits = db.search_kb_fts("item", limit=10)
    assert len([h for h in hits if h["id"] == "db:lore:ref-1"]) == 1
