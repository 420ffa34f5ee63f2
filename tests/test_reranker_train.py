"""Reranker training pipeline (scripts/train_reranker.py) + CrossEncoder
orbax checkpoint loading."""

import json
import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_crossencoder_loads_orbax_ckpt(tmp_path):
    """An orbax param tree saved by the reranker trainer round-trips through
    CrossEncoder(weights_path=...), deriving the spec from the ckpt shapes."""
    import orbax.checkpoint as ocp

    from tpu_rag.models.bert import BertSpec
    from tpu_rag.models.crossencoder import CrossEncoder, CrossEncoderModule

    spec = BertSpec(vocab_size=512, hidden=64, layers=2, heads=4, ffn=128,
                    max_len=64)
    module = CrossEncoderModule(spec)
    z = jnp.zeros((1, 8), jnp.int32)
    params = module.init(jax.random.PRNGKey(0), z, jnp.ones((1, 8), jnp.int32),
                         z)["params"]
    path = str(tmp_path / "ckpt")
    ck = ocp.StandardCheckpointer()
    ck.save(path, jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32),
                                         params), force=True)
    ck.wait_until_finished()

    ce = CrossEncoder("anything", weights_path=path)
    # spec derived from the checkpoint's bert subtree, not the name default
    assert ce.spec.hidden == 64 and ce.spec.layers == 2
    scores = ce.predict([("a query", "a document"), ("other", "text")])
    assert scores.shape == (2,) and np.all(np.isfinite(scores))
    # restored weights actually drive the output
    ref = np.asarray(module.apply({"params": params},
                                  *_encode(ce, [("a query", "a document")])))
    assert np.allclose(scores[0], ref[0], atol=1e-4)


def _encode(ce, pairs):
    from tpu_rag.models.tokenizer import encode_pair_batch

    ids, mask, types = encode_pair_batch(ce.tokenizer, pairs, ce.seq_len,
                                         batch=len(pairs))
    return jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(types)


def test_train_reranker_end_to_end(tmp_path):
    """Tiny end-to-end run of scripts/train_reranker.py: synthetic corpus,
    manufactured bi-encoder dir (tiny ckpt + trained vocab), a few BCE steps;
    asserts artifacts and a sane report."""
    import orbax.checkpoint as ocp

    from tpu_rag.models.bert import BertSpec
    from tpu_rag.models.biencoder import BiEncoder
    from tpu_rag.models.vocab_train import save_vocab, train_wordpiece_vocab

    corpus = tmp_path / "corpus.jsonl"
    docs = []
    for i in range(60):
        topic = ["alpha", "beta", "gamma", "delta"][i % 4]
        docs.append({"id": f"doc-{i:03d}", "title": f"t{i}",
                     "query": f"how to use {topic} widget {i}",
                     "body": f"the {topic} widget number {i} is configured by "
                             f"calling setup_{topic} with option {i} " * 4})
    with open(corpus, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")

    bi_dir = tmp_path / "bi"
    bi_dir.mkdir()
    vocab = train_wordpiece_vocab((d["query"] + "\n" + d["body"] for d in docs),
                                  vocab_size=800)
    save_vocab(vocab, str(bi_dir / "vocab.txt"))
    # tiny bi-encoder ckpt: spec is derived from shapes at load time
    spec = BertSpec(vocab_size=800, hidden=64, layers=2, heads=4, ffn=128,
                    max_len=64)
    enc = BiEncoder("tiny", tokenizer_path=str(bi_dir / "vocab.txt"),
                    seq_len=48, batch=8, spec=spec)
    ck = ocp.StandardCheckpointer()
    ck.save(str(bi_dir / "ckpt"),
            jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32),
                                   enc.params), force=True)
    ck.wait_until_finished()

    out = tmp_path / "rr"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train_reranker.py"),
         "--corpus", str(corpus), "--biencoder", str(bi_dir),
         "--out", str(out), "--steps", "4", "--batch", "8", "--seq-len", "96",
         "--warmup", "1", "--hard-k", "2", "--cand-k", "5"],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    # seq-len 96 > the bi ckpt's max_len 64 -> the CE extends the position
    # table instead of silently clamping its crops (a round-2 regression:
    # "--seq-len 160" trained at 128)
    assert "position table extended 64 -> 96" in proc.stdout
    report = json.load(open(out / "rerank.json"))
    labels = [r["label"] for r in report["results"]]
    assert labels[:2] == ["biencoder_top20_no_rerank", "trained_reranker"]
    assert any(l.startswith("ensemble_bi+trained_ce(alpha=") for l in labels)
    assert "ensemble_bi+trained_ce" in labels
    assert labels[-1] == "random_weights_round1"
    assert 0.0 <= report["ensemble_alpha"] <= 1.0
    assert os.path.isdir(out / "ckpt")
    assert (out / "RERANK.md").read_text().startswith("# Reranker quality")
