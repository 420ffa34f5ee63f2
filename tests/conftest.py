"""Test configuration: force an 8-device virtual CPU mesh.

SURVEY.md §4: multi-device code is tested without a pod via
xla_force_host_platform_device_count.  The image's axon site config pins
JAX_PLATFORMS=axon (one real TPU through a tunnel), so tests explicitly
switch the platform back to cpu before any backend initialization.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
