"""jax.profiler integration (the tracing the reference lacked — SURVEY.md §5).

Set PROFILE_DIR=/path to capture TensorBoard-compatible device traces around
hot operations; scripts/serve.py --profile and bench.py --profile use this.
"""

from __future__ import annotations

import os
from contextlib import contextmanager, nullcontext


def profile_dir() -> str | None:
    return os.getenv("PROFILE_DIR") or None


@contextmanager
def maybe_trace(name: str, directory: str | None = None):
    """Trace the wrapped block to PROFILE_DIR (or `directory`) when set."""
    target = directory or profile_dir()
    if not target:
        with nullcontext():
            yield
        return
    import jax

    with jax.profiler.trace(os.path.join(target, name)):
        yield


def annotate(name: str):
    """Named device-trace annotation for nested spans."""
    try:
        import jax

        return jax.profiler.TraceAnnotation(name)
    except Exception:
        return nullcontext()
