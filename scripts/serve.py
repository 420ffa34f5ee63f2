#!/usr/bin/env python
"""Start the RAG HTTP server (replaces `uvicorn api.app:app` —
reference Dockerfile:34 / run.txt:4)."""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="Serve the TPU RAG API")
    ap.add_argument("--host", default=None)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--log-level", default="info")
    args = ap.parse_args()

    logging.basicConfig(level=getattr(logging, args.log_level.upper(), logging.INFO),
                        format="%(asctime)s %(name)s %(levelname)s %(message)s")

    from tpu_rag.api.app import create_app
    from tpu_rag.api.server import run_app
    from tpu_rag.config import config_from_env
    from tpu_rag.parallel.distributed import maybe_init_distributed
    from tpu_rag.utils.compile_cache import enable_persistent_cache

    maybe_init_distributed()  # no-op unless JAX_COORDINATOR_ADDRESS is set
    enable_persistent_cache()

    cfg = config_from_env()
    if args.host:
        cfg.host = args.host
    if args.port:
        cfg.port = args.port
    app = create_app(cfg)
    if cfg.warmup:
        print("warming up encoder + search kernels ...")
        app.state["engine"].warmup()
    print(f"tpu_rag serving on http://{cfg.host}:{cfg.port} "
          f"(collection={cfg.collection_name}, index={cfg.index_kind}/{cfg.index_dtype})")
    run_app(app, cfg.host, cfg.port,
            executor_workers=cfg.http_executor_workers)


if __name__ == "__main__":
    main()
