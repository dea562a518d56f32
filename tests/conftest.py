"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-device sharding paths are testable without TPU hardware (and so unit
tests don't pay per-op TPU-tunnel latency), and make the repo root
importable.

The sandbox's sitecustomize pins JAX_PLATFORMS=axon, so we must overwrite
(not setdefault) and also set the config knob after import.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
