"""Contrastive (InfoNCE) fine-tuning of the bi-encoder over a device mesh.

Not present in the reference (it is inference-only, SURVEY.md §5
"Checkpoint/resume: no model checkpoints"), but a retrieval framework needs
an embedder fine-tuning path, and it is the multi-chip training story:

- mesh axes ("data", "model"): batch sharded over "data" (DP), encoder
  matmuls sharded over "model" (TP: FFN hidden dim + attention heads).
- in-batch negatives: logits = q @ d^T / tau with labels on the diagonal,
  symmetric cross-entropy.  Under jit with sharded inputs XLA inserts the
  all-gathers for the cross-shard logits automatically (ICI collectives).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_rag.models.bert import (  # noqa: F401  (re-exported: TP rules are
    BertEncoder,                   # shared with TP serving in BiEncoder)
    BertSpec,
    l2_normalize,
    make_param_shardings,
    mean_pool,
    param_partition_spec,
)


def info_nce_loss(q_emb, d_emb, tau: float = 0.05):
    logits = jnp.dot(q_emb, d_emb.T) / tau
    labels = jnp.arange(logits.shape[0])
    loss_q = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    loss_d = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
    return 0.5 * (loss_q + loss_d)


class ContrastiveTrainer:
    def __init__(self, spec: BertSpec, mesh: Mesh, *, lr: float = 2e-5,
                 tau: float = 0.05, dtype=jnp.float32, seed: int = 0) -> None:
        self.spec = spec
        self.mesh = mesh
        self.tau = tau
        # remat: recompute layer activations in backward (HBM for FLOPs)
        self.module = BertEncoder(spec, dtype=dtype, remat=True)
        self.optimizer = optax.adamw(lr)

        rng = jax.random.PRNGKey(seed)
        ids = jnp.zeros((1, 8), jnp.int32)
        params = self.module.init(rng, ids, jnp.ones((1, 8), jnp.int32))["params"]
        self.param_shardings = make_param_shardings(mesh, params)
        self.params = jax.device_put(params, self.param_shardings)
        # optimizer moments inherit their params' shardings via init-under-sharding
        self.opt_state = self.optimizer.init(self.params)
        self.batch_sharding = NamedSharding(mesh, P("data", None))
        self._step = self._build_step()

    def _build_step(self):
        module = self.module
        optimizer = self.optimizer
        tau = self.tau

        def loss_fn(params, q_ids, q_mask, d_ids, d_mask):
            qh = module.apply({"params": params}, q_ids, q_mask)
            dh = module.apply({"params": params}, d_ids, d_mask)
            q_emb = l2_normalize(mean_pool(qh, q_mask).astype(jnp.float32))
            d_emb = l2_normalize(mean_pool(dh, d_mask).astype(jnp.float32))
            return info_nce_loss(q_emb, d_emb, tau)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, q_ids, q_mask, d_ids, d_mask):
            loss, grads = jax.value_and_grad(loss_fn)(params, q_ids, q_mask, d_ids, d_mask)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    def shard_batch(self, batch: dict) -> dict:
        return {k: jax.device_put(jnp.asarray(v), self.batch_sharding)
                for k, v in batch.items()}

    def train_step(self, batch: dict[str, Any]) -> float:
        """batch: {q_ids, q_mask, d_ids, d_mask} int32 (B, L), B % data-axis == 0."""
        b = self.shard_batch(batch)
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state,
            b["q_ids"], b["q_mask"], b["d_ids"], b["d_mask"])
        return float(loss)

    def save(self, path: str) -> None:
        import os

        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        # orbax requires absolute paths; don't rely on callers to abspath
        ckpt.save(os.path.abspath(path), jax.device_get(self.params), force=True)
        ckpt.wait_until_finished()  # StandardCheckpointer saves asynchronously

    def load(self, path: str) -> None:
        """Restore PARAMS only: optimizer moments are re-initialized, so a
        resumed run warms Adam up from zero moments (checkpoints store the
        param tree alone — see save())."""
        import os

        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        restored = ckpt.restore(os.path.abspath(path))
        self.params = jax.device_put(restored, self.param_shardings)
        self.opt_state = self.optimizer.init(self.params)
