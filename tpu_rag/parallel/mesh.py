"""Device mesh construction.

The reference has no distributed layer at all (SURVEY.md §2.5: single-process
hnswlib); communication here is XLA collectives over ICI, driven by
jax.sharding.Mesh — there is no NCCL/MPI analogue to port.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_from_spec(spec: str = "", devices=None) -> Mesh:
    """Build a mesh from "axis:size,axis:size" (e.g. "data:4,model:2").

    Empty spec -> 1-D mesh over all devices on axis "data".
    A trailing size of -1 (or a missing axis) absorbs remaining devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if not spec:
        return Mesh(np.array(devices), axis_names=("data",))
    names: list[str] = []
    sizes: list[int] = []
    for part in spec.split(","):
        name, _, size = part.strip().partition(":")
        names.append(name.strip())
        sizes.append(int(size) if size.strip() else -1)
    known = int(np.prod([s for s in sizes if s > 0])) if any(s > 0 for s in sizes) else 1
    sizes = [n // known if s == -1 else s for s in sizes]
    total = int(np.prod(sizes))
    if total != n:
        raise ValueError(f"mesh spec {spec!r} needs {total} devices, have {n}")
    arr = np.array(devices).reshape(sizes)
    return Mesh(arr, axis_names=tuple(names))


def get_mesh(spec: str = "", devices=None) -> Mesh:
    return mesh_from_spec(spec, devices)
