#!/usr/bin/env python
"""Train the cross-encoder reranker on labeled pairs with hard negatives,
then measure the rerank LIFT on held-out retrieval.

Completes the semantic-quality story (scripts/train_semantic.py trains the
bi-encoder): the reference serves a pretrained ms-marco cross-encoder
(reference api/app.py:95-104); this image has no pretrained weights, so the
reranker trains from scratch on the same docstring corpus —

- trunk initialized FROM the trained bi-encoder checkpoint (the way real
  ms-marco cross-encoders start from pretrained BERT — a from-scratch trunk
  flatlines at chance, measured in the --no-biencoder-init ablation);
- pairs: (summary query, body) positives; negatives are HARD: the trained
  bi-encoder's top-ranked non-target bodies for each query (the candidates a
  reranker must actually discriminate at serving time), plus random bodies —
  all negatives drawn from the TRAIN split only, so the held-out distractor
  pool is never seen in training;
- loss: grouped softmax ranking over [positive, negatives...] logits
  (CrossEncoderModule — same head layout as ms-marco checkpoints);
- eval: rerank the trained bi-encoder's top-20 candidates for held-out
  queries; report recall@k / MRR@10 before vs after, plus the round-1
  seeded-random reranker as the baseline it replaces.

  python scripts/make_corpus.py --out /tmp/corpus40k.jsonl --n 40000
  python scripts/train_semantic.py --corpus /tmp/corpus40k.jsonl --out /tmp/semantic
  python scripts/train_reranker.py --corpus /tmp/corpus40k.jsonl \
      --biencoder /tmp/semantic --out /tmp/reranker

Artifacts in --out: ckpt/ (orbax, served via RERANK_WEIGHTS=... — the
tokenizer is shared with the bi-encoder's TOKENIZER_PATH), rerank.json,
RERANK.md.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_corpus(path: str) -> list[dict]:
    docs = [json.loads(line) for line in open(path, encoding="utf-8")]
    if not docs:
        raise SystemExit(f"empty corpus: {path}")
    return docs


def split_holdout(docs: list[dict], frac: float) -> tuple[list[dict], list[dict]]:
    """Same deterministic id-hash split as scripts/train_semantic.py, so the
    reranker never trains on the bi-encoder's held-out queries."""
    mod = max(2, int(round(1.0 / max(frac, 1e-6))))
    train, hold = [], []
    for d in docs:
        h = int.from_bytes(hashlib.blake2b(d["id"].encode(), digest_size=4).digest(), "little")
        (hold if h % mod == 0 else train).append(d)
    return train, hold


def rank_metrics(label: str, ranks: np.ndarray) -> dict:
    out = {"label": label,
           "recall@1": round(float(np.mean(ranks < 1)), 4),
           "recall@5": round(float(np.mean(ranks < 5)), 4),
           "recall@10": round(float(np.mean(ranks < 10)), 4),
           "mrr@10": round(float(np.mean(np.where(ranks < 10, 1.0 / (ranks + 1), 0.0))), 4)}
    print(f"[eval] {label}: {out}", flush=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--biencoder", required=True,
                    help="train_semantic.py --out dir (vocab.txt + ckpt/)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=256, help="pairs per step")
    ap.add_argument("--seq-len", type=int, default=160)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--warmup", type=int, default=150)
    ap.add_argument("--hard-k", type=int, default=8,
                    help="bi-encoder top-k (non-target) mined as hard negatives")
    ap.add_argument("--mine-rounds", type=int, default=1,
                    help=">1 = iterative mining: after each round the CURRENT "
                         "cross-encoder re-scores each train query's bi-mined "
                         "candidate pool and its top-scoring non-targets "
                         "become the active hard negatives (the CE trains "
                         "against its own current mistakes)")
    ap.add_argument("--mine-pool", type=int, default=32,
                    help="bi-encoder candidate pool size the CE re-mines from")
    ap.add_argument("--mine-queries", type=int, default=8000,
                    help="train queries re-mined per round (rotating subset)")
    ap.add_argument("--neg-per-pos", type=int, default=3,
                    help="negatives per positive in each batch")
    ap.add_argument("--cand-k", type=int, default=20,
                    help="candidates reranked per held-out query at eval")
    ap.add_argument("--eval-every", type=int, default=0,
                    help="steps between val rerank evals; the served ckpt "
                         "is the best val ensemble recall@10, not the last "
                         "step (0 = off)")
    ap.add_argument("--holdout-frac", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--no-biencoder-init", action="store_true",
                    help="ablation: train the trunk from scratch instead of "
                         "initializing it from the bi-encoder checkpoint")
    args = ap.parse_args()
    # clamp the schedule BEFORE any expensive work: steps <= warmup makes
    # warmup_cosine_decay_schedule's decay_steps non-positive, which raised
    # only after the (potentially hour-long) mining phase had already run
    if args.steps <= args.warmup:
        args.warmup = max(1, args.steps // 10)
        print(f"[train_reranker] warmup clamped to {args.warmup} "
              f"(steps={args.steps})", flush=True)

    from tpu_rag.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax

    # honor JAX_PLATFORMS even when a site hook (e.g. the axon TPU plugin)
    # overrides platform selection after env parsing — tests set
    # JAX_PLATFORMS=cpu and must NOT touch the tunneled TPU
    if os.getenv("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.getenv("JAX_PLATFORMS"))
        except Exception:
            pass
    import jax.numpy as jnp
    import optax

    from tpu_rag.models.bert import BertSpec
    from tpu_rag.models.biencoder import BiEncoder
    from tpu_rag.models.crossencoder import CrossEncoder, CrossEncoderModule
    from tpu_rag.models.tokenizer import PAD_ID, load_tokenizer

    os.makedirs(args.out, exist_ok=True)
    vocab_path = os.path.join(args.biencoder, "vocab.txt")
    bi_ckpt = os.path.abspath(os.path.join(args.biencoder, "ckpt"))
    ckpt_path = os.path.abspath(os.path.join(args.out, "ckpt"))

    docs = load_corpus(args.corpus)
    train_docs, holdout = split_holdout(docs, args.holdout_frac)
    print(f"corpus: {len(docs)} docs -> {len(train_docs)} train / {len(holdout)} holdout")

    tok = load_tokenizer(vocab_path, vocab_size=30522)
    vocab_size = getattr(tok, "vocab_size", 30522)
    spec = BertSpec(hidden=384, layers=6, heads=12, ffn=1536,
                    vocab_size=vocab_size, max_len=max(args.seq_len, 128))

    print("[1/4] embedding corpus with the trained bi-encoder (hard-negative "
          "mining + eval candidates) ...", flush=True)
    bi = BiEncoder("minilm-l6-corpus", weights_path=bi_ckpt,
                   tokenizer_path=vocab_path, seq_len=128, batch=128)
    bodies = [d["body"] for d in docs]
    demb = bi.embed(bodies)                                  # (N, H)
    id_pos = {d["id"]: i for i, d in enumerate(docs)}

    cls_id = getattr(tok, "cls_id", 1)
    sep_id = getattr(tok, "sep_id", 2)
    pad_id = getattr(tok, "pad_id", PAD_ID)
    rng = np.random.default_rng(args.seed)

    body_toks = [tok.tokenize_ids(b)[:400] for b in bodies]
    q_toks_all = [tok.tokenize_ids(d["query"])[:46] for d in docs]

    def pair_rows(qi: int, di: int, seq: int):
        """[CLS] query [SEP] body-crop [SEP] with segment ids.  The query is
        clamped so at least a few body tokens always fit (tiny --seq-len
        values would otherwise produce rows longer than seq).

        Long bodies crop to the LEADING window 75% of the time — the policy
        CrossEncoder.predict serves with — so train and serving score the
        same view of a document (round-2's always-random crops created a
        train/serve mismatch and noisy positives); the remaining 25% are
        random crops for augmentation."""
        q = q_toks_all[qi][: max(1, seq - 8)]
        room = seq - len(q) - 3
        b = body_toks[di]
        if len(b) > room:
            if rng.random() < 0.75:
                b = b[:room]
            else:
                start = int(rng.integers(0, len(b) - room + 1))
                b = b[start : start + room]
        ids = [cls_id] + q + [sep_id] + b + [sep_id]
        types = [0] * (len(q) + 2) + [1] * (len(b) + 1)
        return ids, types

    def assemble_pairs(rows, seq):
        ids = np.full((len(rows), seq), pad_id, np.int32)
        mask = np.zeros((len(rows), seq), np.int32)
        types = np.zeros((len(rows), seq), np.int32)
        for i, (r, t) in enumerate(rows):
            ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
            types[i, : len(t)] = t
        return ids, mask, types

    if not args.eval_only:
        print("[2/4] mining hard negatives (bi-encoder top non-target bodies, "
              "train split only) ...", flush=True)
        # negatives come exclusively from the TRAIN split: mining (or random
        # sampling) over the full corpus would train the model against the
        # very held-out bodies it is evaluated on, inflating the rerank lift
        tpos = np.array([id_pos[d["id"]] for d in train_docs])
        demb_train = demb[tpos]
        tq = bi.embed([d["query"] for d in train_docs])
        pool_k = max(args.hard_k, args.mine_pool if args.mine_rounds > 1
                     else args.hard_k)
        hard_pool: list[np.ndarray] = []
        for i in range(0, len(train_docs), 512):
            scores = tq[i:i + 512] @ demb_train.T
            top = np.argpartition(-scores, pool_k + 1, axis=1)[:, : pool_k + 1]
            srt = np.argsort(-np.take_along_axis(scores, top, axis=1), axis=1)
            top = np.take_along_axis(top, srt, axis=1)
            for r, target in zip(top, tpos[i:i + 512]):
                cand = tpos[r]
                hard_pool.append(cand[cand != target][:pool_k])
        # active negatives start as the bi-encoder's top hard_k; iterative
        # rounds replace them with the CE's own hardest (see remine below)
        hard: list[np.ndarray] = [hp[: args.hard_k] for hp in hard_pool]

        # validation slice for best-checkpoint selection (--eval-every):
        # round-5 measured 18K steps -> CE-alone 0.6314 but 30K -> 0.5924 —
        # the ranking loss overfits well before the schedule ends, so the
        # served checkpoint must be picked by held-out rerank quality, not
        # by the last step.  Val queries are EXCLUDED from training batches
        # and from re-mining; their candidates are the bi-encoder's top
        # cand_k train bodies — the exact distribution the CE reranks at
        # serving time.
        val_n = min(1000, len(train_docs) // 10)
        stride = max(1, len(train_docs) // max(val_n, 1))
        val_loc = np.arange(0, len(train_docs), stride)[:val_n]
        val_set = set(int(i) for i in val_loc)
        train_pool = np.array(
            [i for i in range(len(train_docs)) if i not in val_set])
        val_tgt = tpos[val_loc]                       # corpus rows
        val_cand = np.empty((len(val_loc), args.cand_k), np.int64)
        val_bi_sc = np.empty((len(val_loc), args.cand_k), np.float32)
        for off in range(0, len(val_loc), 512):
            vq = tq[val_loc[off:off + 512]]
            scores = vq @ demb_train.T
            part = np.argpartition(-scores, args.cand_k,
                                   axis=1)[:, : args.cand_k]
            srt = np.argsort(-np.take_along_axis(scores, part, axis=1),
                             axis=1)
            part = np.take_along_axis(part, srt, axis=1)
            val_cand[off:off + 512] = tpos[part]
            val_bi_sc[off:off + 512] = np.take_along_axis(scores, part,
                                                          axis=1)

        print(f"[3/4] ranking training: {args.steps} steps x {args.batch} pairs "
              f"(groups of 1 pos + {args.neg_per_pos} negs) ...", flush=True)
        # Initialize the trunk FROM the trained bi-encoder (the way real
        # ms-marco cross-encoders start from a pretrained BERT): a
        # from-scratch trunk barely learns pair classification (BCE loss
        # flatlined at ~ln 2 in the ablation), while the bi-encoder trunk
        # already carries the corpus semantics.  Pooler/classifier stay
        # randomly initialized.  The ckpt fixes the architecture (incl.
        # max_len -> clamp seq_len).
        bert_init = None
        if not args.no_biencoder_init:
            from tpu_rag.models.bert import spec_from_params
            from tpu_rag.models.biencoder import _load_orbax_params

            bert_init = _load_orbax_params(bi_ckpt)
            if bert_init is not None:
                bert_init = jax.tree_util.tree_map(
                    lambda a: jnp.asarray(a, jnp.float32), bert_init)
                spec = spec_from_params(bert_init, spec)
                if args.seq_len > spec.max_len:
                    # The bi-encoder trains at max_len 128, which silently
                    # clamped earlier CE runs to ~80 body tokens per pair
                    # (bodies run to 400).  Extend the position table by
                    # cyclic repeat + small jitter — repeated rows start
                    # near a plausible scale and the ranking loss re-trains
                    # them — so the CE can attend over real document crops.
                    import dataclasses

                    pe = np.asarray(
                        bert_init["position_embeddings"]["embedding"],
                        np.float32)
                    reps = -(-args.seq_len // pe.shape[0])
                    ext = np.concatenate([pe] * reps, axis=0)[: args.seq_len]
                    jit_rng = np.random.default_rng(args.seed + 17)
                    ext[pe.shape[0]:] += jit_rng.normal(
                        0, 0.02, ext[pe.shape[0]:].shape).astype(np.float32)
                    bert_init = dict(bert_init)
                    bert_init["position_embeddings"] = {
                        "embedding": jnp.asarray(ext)}
                    spec = dataclasses.replace(spec, max_len=args.seq_len)
                    print(f"  position table extended "
                          f"{pe.shape[0]} -> {args.seq_len}")
                args.seq_len = min(args.seq_len, spec.max_len)
                print(f"  trunk initialized from the trained bi-encoder ckpt "
                      f"(seq_len -> {args.seq_len})")
        module = CrossEncoderModule(
            spec, dtype=jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32)
        rng_j = jax.random.PRNGKey(args.seed)
        z = jnp.zeros((1, 8), jnp.int32)
        params = module.init(rng_j, z, jnp.ones((1, 8), jnp.int32), z)["params"]
        if bert_init is not None:
            params = dict(params)
            params["bert"] = bert_init
        import functools

        group = 1 + args.neg_per_pos
        n_pos = args.batch // group

        # Divergence armor.  Two 30K-step runs collapsed to exactly
        # ln(group) (uniform logits — a dead trunk) from step ~4.1-4.6K
        # onward, and clip_by_global_norm(1.0) alone did NOT prevent the
        # second one.  Three layers of defense:
        #   1. apply_if_finite: a non-finite update is skipped outright
        #      instead of poisoning the params;
        #   2. an on-device snapshot of the params, refreshed only while
        #      the sampled loss is healthy (clearly below chance);
        #   3. collapse detection on the 100-step sampled loss — pinned
        #      at chance for >=400 consecutive steps past warmup —
        #      triggers a rollback to the snapshot with the peak LR
        #      halved (optimizer state reset, step_fn re-jitted).
        chance = float(np.log(group))

        def make_step_fn(lr_mult: float):
            schedule = optax.warmup_cosine_decay_schedule(
                0.0, args.lr * lr_mult, args.warmup, args.steps,
                args.lr * lr_mult * 0.02)
            optimizer = optax.apply_if_finite(
                optax.chain(optax.clip_by_global_norm(1.0),
                            optax.adamw(schedule)),
                max_consecutive_errors=100)

            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def step_fn(params, opt_state, ids, mask, types):
                def loss_fn(p):
                    logits = module.apply({"params": p}, ids, mask, types)
                    # grouped softmax ranking loss: each group is
                    # [pos, negs...]; the model must rank its positive above
                    # ITS OWN negatives — the objective the reranker is used
                    # for at serving time
                    g = logits.reshape(n_pos, group)
                    return optax.softmax_cross_entropy_with_integer_labels(
                        g, jnp.zeros((n_pos,), jnp.int32)).mean()
                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss

            return optimizer, step_fn

        lr_mult = 1.0
        optimizer, step_fn = make_step_fn(lr_mult)
        opt_state = optimizer.init(params)

        def sample_batch():
            qi = rng.choice(train_pool, size=n_pos, replace=False)
            rows = []
            for i in qi:
                gq = id_pos[train_docs[i]["id"]]
                rows.append(pair_rows(gq, gq, args.seq_len))
                for _ in range(args.neg_per_pos):
                    # hard negative 75% of the time, random otherwise
                    if len(hard[i]) and rng.random() < 0.75:
                        ni = int(rng.choice(hard[i]))
                    else:
                        ni = int(tpos[rng.integers(0, len(tpos))])
                        if ni == gq:  # train-split-only random negatives
                            ni = int(tpos[(rng.integers(0, len(tpos)))])
                    rows.append(pair_rows(gq, ni, args.seq_len))
            ids, mask, types = assemble_pairs(rows, args.seq_len)
            return (jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(types))

        score_fn = jax.jit(
            lambda p, ids, mask, types: module.apply(
                {"params": p}, ids, mask, types))

        def score_pairs(params, meta: list[tuple[int, int]]) -> np.ndarray:
            """CE scores for (query_row, doc_row) corpus pairs, fixed-shape
            batched (B=512) so the jit compiles once."""
            out = np.empty(len(meta), np.float32)
            B = 512
            for off in range(0, len(meta), B):
                chunk = meta[off:off + B]
                rows = [pair_rows(gq, c, args.seq_len) for (gq, c) in chunk]
                while len(rows) < B:
                    rows.append(rows[-1])
                ids, mask, types = assemble_pairs(rows, args.seq_len)
                sc = np.asarray(score_fn(params, jnp.asarray(ids),
                                         jnp.asarray(mask),
                                         jnp.asarray(types)))
                out[off:off + len(chunk)] = sc.reshape(-1)[: len(chunk)]
            return out

        def _zn(x: np.ndarray) -> np.ndarray:
            return ((x - x.mean(axis=1, keepdims=True))
                    / np.maximum(x.std(axis=1, keepdims=True), 1e-6))

        def val_eval(params) -> dict:
            """Rerank-quality on the val slice: CE-alone recall@10 and the
            best ensemble recall@10 over the serving alpha grid."""
            meta = [(int(tpos[v]), int(c))
                    for j, v in enumerate(val_loc) for c in val_cand[j]]
            ce = score_pairs(params, meta).reshape(len(val_loc), args.cand_k)

            def r10(order_sc: np.ndarray) -> float:
                hit = 0
                for j in range(len(val_loc)):
                    rr = val_cand[j][np.argsort(-order_sc[j], kind="stable")]
                    w = np.flatnonzero(rr == val_tgt[j])
                    hit += int(len(w) > 0 and w[0] < 10)
                return hit / max(len(val_loc), 1)

            zb, zc = _zn(val_bi_sc), _zn(ce)
            ens = {a: r10((1 - a) * zb + a * zc)
                   for a in (0.2, 0.3, 0.4, 0.5)}
            best_a = max(ens, key=ens.get)
            return {"ce_alone": r10(ce), "ensemble": ens[best_a],
                    "alpha": best_a, "bi": r10(val_bi_sc)}

        def remine(params, rnd: int) -> None:
            """Iterative mining: CE-score each selected train query's
            bi-mined candidate pool with the CURRENT checkpoint; its
            top-scoring non-targets become the active negatives — the pairs
            the CE itself currently confuses with the positive."""
            n_sel = min(args.mine_queries, len(train_pool))
            start = (rnd * n_sel) % len(train_pool)
            sel = [int(train_pool[(start + j) % len(train_pool)])
                   for j in range(n_sel)]
            meta: list[tuple[int, int, int]] = []
            for i in sel:
                gq = id_pos[train_docs[i]["id"]]
                for c in hard_pool[i]:
                    meta.append((i, gq, int(c)))
            scores = np.empty(len(meta), np.float32)
            B = 512
            for off in range(0, len(meta), B):
                chunk = meta[off:off + B]
                rows = [pair_rows(gq, c, args.seq_len) for (_, gq, c) in chunk]
                while len(rows) < B:  # fixed jit shape
                    rows.append(rows[-1])
                ids, mask, types = assemble_pairs(rows, args.seq_len)
                out = np.asarray(score_fn(params, jnp.asarray(ids),
                                          jnp.asarray(mask),
                                          jnp.asarray(types)))
                scores[off:off + len(chunk)] = out.reshape(-1)[: len(chunk)]
            ptr = 0
            for i in sel:
                m = len(hard_pool[i])
                sc = scores[ptr:ptr + m]
                ptr += m
                hard[i] = hard_pool[i][
                    np.argsort(-sc, kind="stable")[: args.hard_k]]

        t0 = time.time()
        rounds = max(1, args.mine_rounds)
        bounds = [args.steps * (r + 1) // rounds for r in range(rounds)]
        snapshot = jax.tree_util.tree_map(jnp.copy, params)
        snapshot_step = 0
        at_chance = 0  # consecutive 100-step checks pinned at chance
        best = {"ensemble": -1.0, "ce_alone": -1.0, "step": -1,
                "params": None}
        step = 0
        for rnd in range(rounds):
            while step < bounds[rnd]:
                ids, mask, types = sample_batch()
                params, opt_state, loss = step_fn(params, opt_state, ids, mask, types)
                if (args.eval_every and step > 0
                        and step % args.eval_every == 0):
                    ev = val_eval(params)
                    tag = ""
                    if (ev["ensemble"], ev["ce_alone"]) > (
                            best["ensemble"], best["ce_alone"]):
                        best = {**ev, "step": step,
                                "params": jax.tree_util.tree_map(
                                    jnp.copy, params)}
                        tag = "  <- best"
                    print(f"  [val @{step}] ce_alone {ev['ce_alone']:.4f}  "
                          f"ensemble {ev['ensemble']:.4f} "
                          f"(alpha {ev['alpha']})  bi {ev['bi']:.4f}{tag}",
                          flush=True)
                if step % 100 == 0 or step == args.steps - 1:
                    lv = float(loss)
                    print(f"  step {step:5d}  loss {lv:.4f}  "
                          f"({time.time() - t0:.0f}s)", flush=True)
                    if step > max(args.warmup + 600, 1000):
                        if lv >= chance - 0.03 or not np.isfinite(lv):
                            at_chance += 1
                        else:
                            at_chance = 0
                            if step % 500 == 0:
                                snapshot = jax.tree_util.tree_map(
                                    jnp.copy, params)
                                snapshot_step = step
                        if at_chance >= 4:
                            lr_mult *= 0.5
                            print(f"  [rollback] loss pinned at chance "
                                  f"(~{chance:.4f}) for {at_chance * 100} "
                                  f"steps — restoring step-{snapshot_step} "
                                  f"snapshot, peak lr -> "
                                  f"{args.lr * lr_mult:.2e}", flush=True)
                            params = jax.tree_util.tree_map(
                                jnp.copy, snapshot)
                            optimizer, step_fn = make_step_fn(lr_mult)
                            opt_state = optimizer.init(params)
                            at_chance = 0
                step += 1
            if rnd < rounds - 1:
                tm = time.time()
                remine(params, rnd)
                print(f"  [mine round {rnd + 1}] re-mined "
                      f"{min(args.mine_queries, len(train_docs))} queries "
                      f"with the current CE ({time.time() - tm:.0f}s)",
                      flush=True)

        import orbax.checkpoint as ocp

        if best["params"] is not None:
            fin = val_eval(params)
            if (fin["ensemble"], fin["ce_alone"]) <= (
                    best["ensemble"], best["ce_alone"]):
                print(f"  restoring best checkpoint (step {best['step']}: "
                      f"val ensemble {best['ensemble']:.4f} / ce_alone "
                      f"{best['ce_alone']:.4f}; final was "
                      f"{fin['ensemble']:.4f} / {fin['ce_alone']:.4f})",
                      flush=True)
                params = best["params"]
        params_f32 = jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float32), params)
        ck = ocp.StandardCheckpointer()
        ck.save(ckpt_path, params_f32, force=True)
        ck.wait_until_finished()
        print(f"checkpoint -> {ckpt_path}")

    print("[4/4] rerank lift on held-out retrieval ...", flush=True)
    qemb = bi.embed([d["query"] for d in holdout])
    targets = np.array([id_pos[d["id"]] for d in holdout])
    cand = np.empty((len(holdout), args.cand_k), np.int64)
    cand_sc = np.empty((len(holdout), args.cand_k), np.float32)
    base_ranks = np.empty(len(holdout), np.int64)
    for i in range(0, len(holdout), 256):
        scores = qemb[i:i + 256] @ demb.T
        part = np.argpartition(-scores, args.cand_k, axis=1)[:, : args.cand_k]
        order = np.argsort(-np.take_along_axis(scores, part, axis=1), axis=1)
        cand[i:i + 256] = np.take_along_axis(part, order, axis=1)
        cand_sc[i:i + 256] = np.take_along_axis(
            np.take_along_axis(scores, part, axis=1), order, axis=1)
        own = scores[np.arange(len(scores)), targets[i:i + 256]]
        base_ranks[i:i + 256] = (scores > own[:, None]).sum(axis=1)

    def _ranks_from(order_scores: np.ndarray) -> np.ndarray:
        ranks = np.full(len(holdout), 10**6, np.int64)
        for i in range(len(holdout)):
            reranked = cand[i][np.argsort(-order_scores[i], kind="stable")]
            hit = np.flatnonzero(reranked == targets[i])
            if len(hit):
                ranks[i] = hit[0]
        return ranks

    def _znorm(x: np.ndarray) -> np.ndarray:
        mu = x.mean(axis=1, keepdims=True)
        sd = x.std(axis=1, keepdims=True)
        return (x - mu) / np.maximum(sd, 1e-6)

    def rerank_ranks(ce: CrossEncoder, label: str) -> tuple[dict, np.ndarray]:
        # flatten every (query, candidate) pair into large predict calls —
        # per-query predicts would cost one device round-trip each
        all_pairs = [(d["query"], bodies[int(c)])
                     for i, d in enumerate(holdout) for c in cand[i]]
        t0 = time.time()
        flat = ce.predict(all_pairs).reshape(len(holdout), args.cand_k)
        print(f"  scored {len(all_pairs)} pairs in {time.time() - t0:.0f}s",
              flush=True)
        return rank_metrics(label, _ranks_from(flat)), flat

    results = [rank_metrics("biencoder_top20_no_rerank",
                            np.where(base_ranks < args.cand_k, base_ranks, 10**6))]
    trained_ce = CrossEncoder("minilm-l6-rerank", weights_path=ckpt_path,
                              tokenizer_path=vocab_path, seq_len=args.seq_len,
                              batch=256, spec=spec)
    row, ce_scores = rerank_ranks(trained_ce, "trained_reranker")
    results.append(row)
    # production-style interpolation: z-normalize both score lists per query
    # and blend alpha*CE + (1-alpha)*bi.  alpha is tuned on a VALIDATION
    # slice carved from the TRAIN split (never the holdout), then applied
    # once to the holdout — the tuned value ships as RERANK_ENSEMBLE_ALPHA.
    val_docs = train_docs[-2000:]
    vq = bi.embed([d["query"] for d in val_docs])
    vtargets = np.array([id_pos[d["id"]] for d in val_docs])
    vcand = np.empty((len(val_docs), args.cand_k), np.int64)
    vcand_sc = np.empty((len(val_docs), args.cand_k), np.float32)
    for i in range(0, len(val_docs), 256):
        scores = vq[i:i + 256] @ demb.T
        part = np.argpartition(-scores, args.cand_k, axis=1)[:, : args.cand_k]
        order = np.argsort(-np.take_along_axis(scores, part, axis=1), axis=1)
        vcand[i:i + 256] = np.take_along_axis(part, order, axis=1)
        vcand_sc[i:i + 256] = np.take_along_axis(
            np.take_along_axis(scores, part, axis=1), order, axis=1)
    vpairs = [(d["query"], bodies[int(c)])
              for i, d in enumerate(val_docs) for c in vcand[i]]
    vce = trained_ce.predict(vpairs).reshape(len(val_docs), args.cand_k)

    def _val_recall10(alpha: float) -> float:
        blend = alpha * _znorm(vce) + (1 - alpha) * _znorm(vcand_sc)
        hits = 0
        for i in range(len(val_docs)):
            rr = vcand[i][np.argsort(-blend[i], kind="stable")][:10]
            hits += int(vtargets[i] in rr)
        return hits / len(val_docs)

    alphas = [0.2, 0.3, 0.4, 0.5, 0.6, 0.7]
    val_curve = {a: round(_val_recall10(a), 4) for a in alphas}
    best_alpha = max(alphas, key=lambda a: val_curve[a])
    print(f"  ensemble alpha tuning (val recall@10): {val_curve} "
          f"-> alpha={best_alpha}", flush=True)
    results.append(rank_metrics(
        f"ensemble_bi+trained_ce(alpha={best_alpha})",
        _ranks_from(best_alpha * _znorm(ce_scores)
                    + (1 - best_alpha) * _znorm(cand_sc))))
    results.append(rank_metrics("ensemble_bi+trained_ce",
                                _ranks_from(_znorm(cand_sc) + _znorm(ce_scores))))
    random_ce = CrossEncoder("minilm-l6-rerank", tokenizer_path=vocab_path,
                             seq_len=args.seq_len, batch=256, spec=spec)
    results.append(rerank_ranks(random_ce, "random_weights_round1")[0])

    report = {
        "task": "rerank the trained bi-encoder's top-20 on held-out "
                "docstring summary -> body retrieval",
        "corpus_docs": len(docs), "holdout_queries": len(holdout),
        "train_steps": args.steps, "batch_pairs": args.batch,
        "hard_negatives": args.hard_k, "mine_rounds": args.mine_rounds,
        "ensemble_alpha": best_alpha, "ensemble_alpha_val_curve": val_curve,
        "results": results,
        "serving": {"RERANK_WEIGHTS": ckpt_path, "TOKENIZER_PATH": vocab_path,
                    "RERANK_ENSEMBLE_ALPHA": best_alpha},
    }
    with open(os.path.join(args.out, "rerank.json"), "w") as f:
        json.dump(report, f, indent=2)
    lines = ["| ranking | recall@1 | recall@5 | recall@10 | MRR@10 |",
             "|---|---|---|---|---|"]
    for r in results:
        lines.append(f"| {r['label']} | {r['recall@1']} | {r['recall@5']} "
                     f"| {r['recall@10']} | {r['mrr@10']} |")
    table = "\n".join(lines)
    with open(os.path.join(args.out, "RERANK.md"), "w") as f:
        f.write(f"# Reranker quality\n\n{json.dumps(report['task'])}, "
                f"{len(holdout)} held-out queries\n\n{table}\n")
    print(table)


if __name__ == "__main__":
    main()
