"""End-to-end script tests (tiny encoder spec, CPU): build_index ->
query_local, md_to_json, import_chat_history conversion."""

import json
import sys

import pytest


@pytest.fixture()
def env(tmp_path, monkeypatch):
    monkeypatch.setenv("PERSIST_DIR", str(tmp_path / "vs"))
    monkeypatch.setenv("KB_DB_PATH", str(tmp_path / "db/kb.sqlite3"))
    monkeypatch.setenv("DB_PATH", str(tmp_path / "db/app.sqlite3"))
    monkeypatch.setenv("DOCS_DIR", str(tmp_path / "docs"))
    monkeypatch.setenv("EMBEDDING_MODEL", "tiny")  # 2-layer 64-d test spec
    monkeypatch.setenv("INDEX_DTYPE", "float32")
    monkeypatch.setenv("USE_PALLAS", "false")
    monkeypatch.setenv("EMBED_SEQ_LEN", "64")
    monkeypatch.setenv("TPU_RAG_ENV_FILE", str(tmp_path / "nonexistent.env"))
    docs = tmp_path / "docs" / "lore"
    docs.mkdir(parents=True)
    (docs / "temple.json").write_text(json.dumps({
        "id": "temple", "title": "Moon Temple", "summary": "a temple on a cliff",
        "body": {"location": "stands on the silver cliff above the bay",
                 "rituals": ["dusk chant", "tide offering"]},
    }), encoding="utf-8")
    (docs / "dragon.json").write_text(json.dumps([{
        "id": "dragon", "title": "Dragon", "summary": "fire dragon",
        "body": "dragons breathe fire in the mountains",
    }]), encoding="utf-8")
    return tmp_path


def test_build_index_and_query_local(env, monkeypatch, capsys):
    import scripts.build_index as bi

    monkeypatch.setattr(sys, "argv", ["build_index.py"])
    bi.main()
    out = capsys.readouterr().out
    assert "Indexed logical documents: 2" in out
    # temple doc -> summary + 2 sections; dragon -> summary + body = 5 chunks
    assert "5/5 chunks" in out

    import scripts.query_local as ql

    monkeypatch.setattr(sys, "argv", ["query_local.py", "silver cliff bay", "--k", "3", "--json"])
    ql.main()
    data = json.loads(capsys.readouterr().out)
    assert len(data["hits"]) == 3
    ids = [h["id"] for h in data["hits"]]
    assert any(i.startswith("temple::") for i in ids)
    # namespace defaulted from folder
    assert data["hits"][0]["metadata"]["namespace"] == "lore"


def test_md_to_json(tmp_path, monkeypatch, capsys):
    from scripts.md_to_json import md_to_doc

    doc = md_to_doc("# Title Here\npreamble text\n\n## Section A\ncontent a\n\n## Section B\ncontent b",
                    doc_id="t1", namespace="notes")
    assert doc["title"] == "Title Here"
    assert doc["summary"] == "preamble text"
    assert set(doc["body"]) == {"Section A", "Section B"}
    assert doc["namespace"] == "notes"


def test_import_chat_history_mapping(tmp_path):
    from scripts.import_chat_history import conversation_to_pairs, pairs_to_docs

    conv = {
        "title": "test conv", "id": "c1",
        "mapping": {
            "root": {"parent": None, "children": ["m1"], "message": None},
            "m1": {"parent": "root", "children": ["m2"],
                   "message": {"author": {"role": "user"},
                               "content": {"parts": ["hello there"]}}},
            "m2": {"parent": "m1", "children": [],
                   "message": {"author": {"role": "assistant"},
                               "content": {"parts": ["hi, how can I help?"]}}},
        },
    }
    pairs = conversation_to_pairs(conv)
    assert pairs == [("hello there", "hi, how can I help?")]
    docs = pairs_to_docs(conv, pairs)
    assert docs[0]["namespace"] == "history"
    assert docs[0]["canonicality"] == "non"
    assert docs[0]["body"]["prompt"] == "hello there"
    assert docs[0]["body"]["thread_id"] == "c1"


def test_import_chat_history_jsonl(tmp_path):
    from scripts.import_chat_history import conversation_to_pairs, load_conversations

    p = tmp_path / "hist.jsonl"
    p.write_text('{"role": "user", "content": "q1"}\n{"role": "assistant", "content": "a1"}\n')
    convs = load_conversations(str(p))
    assert conversation_to_pairs(convs[0]) == [("q1", "a1")]


def test_ingest_docs_whole_doc(env, monkeypatch, capsys):
    import scripts.ingest_docs as ig

    monkeypatch.setattr(sys, "argv", ["ingest_docs.py"])
    ig.main()
    out = capsys.readouterr().out
    assert "Done: 2 docs." in out
    assert "[ADD] temple" in out

    import scripts.query_local as ql

    monkeypatch.setattr(sys, "argv", ["query_local.py", "silver cliff", "--k", "1", "--json"])
    ql.main()
    import json as _json

    data = _json.loads(capsys.readouterr().out)
    # whole-doc ids (no ::section suffix)
    assert data["hits"][0]["id"] in ("temple", "dragon")


def test_prove_checkpoint_turnkey(tmp_path, monkeypatch, capsys):
    """Turnkey checkpoint proof (VERDICT r3 #7): given HF-format weight
    dirs, scripts/prove_checkpoint.py must run the torch-parity embed check
    and the bundled-corpus recall eval in one command.  Exercised with tiny
    randomly-initialized torch checkpoints (no downloads)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64)
    torch.manual_seed(0)
    emb_dir = tmp_path / "minilm-tiny"
    transformers.BertModel(cfg).eval().save_pretrained(
        str(emb_dir), safe_serialization=False)
    ce_dir = tmp_path / "ce-tiny"
    ce_cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, num_labels=1)
    transformers.BertForSequenceClassification(ce_cfg).eval().save_pretrained(
        str(ce_dir), safe_serialization=False)

    import scripts.prove_checkpoint as pc

    monkeypatch.setattr(sys, "argv", [
        "prove_checkpoint.py", "--embedding-weights", str(emb_dir),
        "--rerank-weights", str(ce_dir), "--max-docs", "48", "--k", "5"])
    rc = pc.main()
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # the parity gate must have RUN (torch is present) and passed: the Flax
    # mapping reproduces the torch forward on the same ids
    assert report["torch_parity"]["ok"], report["torch_parity"]
    assert report["torch_parity"]["max_abs_diff"] < 2e-3
    # recall eval ran over the bundled corpus with the serving-default index
    br = report["bundled_recall_at_k"]
    assert br["docs"] > 0 and br["recall_vs_f32"] >= 0.98, br
    assert "rerank" in report and "pos_score" in report["rerank"]
    # rerank ORDER is not gated for a random tiny checkpoint — only that the
    # cross-encoder loaded and scored (real ms-marco weights gate in prod)
    assert rc in (0, 1)
    if report["passed"]:
        assert rc == 0
