"""Multi-host initialization scaffolding.

Single-host meshes need nothing; on a multi-host TPU slice jax.distributed
must initialize before any backend use so jax.devices() sees every chip.
Driven by env (set by the TPU runtime or the operator):

  JAX_COORDINATOR_ADDRESS  host:port of process 0
  JAX_NUM_PROCESSES        total processes (optional with TPU autodetect)
  JAX_PROCESS_ID           this process's id (optional with TPU autodetect)

scripts/serve.py calls maybe_init_distributed() at startup; it is a no-op
when no coordinator is configured.  DCN-aware meshes: put the host axis
first in MESH_SHAPE (e.g. "host:2,data:8") so XLA maps the outer axis onto
DCN and the inner onto ICI.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed from env. Returns True when initialized."""
    coordinator = os.getenv("JAX_COORDINATOR_ADDRESS")
    if not coordinator:
        return False
    import jax

    kwargs: dict = {"coordinator_address": coordinator}
    if os.getenv("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.getenv("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    logger.info("jax.distributed initialized: process %s of %s",
                jax.process_index(), jax.process_count())
    return True
