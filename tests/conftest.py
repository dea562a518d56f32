"""Test configuration.

Default lane: force the CPU backend with 8 virtual devices so the
multi-device sharding paths are testable without TPU hardware (and so unit
tests don't pay per-op TPU-tunnel latency).

TPU lane: `pytest -m tpu tests/` keeps the environment's real backend
(axon/TPU) so the Pallas kernels and fused steps run on chip
(tests/tpu/).  tpu-marked tests are auto-skipped on non-TPU backends.

The sandbox's sitecustomize pins JAX_PLATFORMS=axon, so the CPU lane must
overwrite (not setdefault) and also set the config knob after import.
Backend selection must happen BEFORE jax initializes, hence in
pytest_configure rather than at module import.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_TPU_LANE = False


def pytest_configure(config):
    global _TPU_LANE
    config.addinivalue_line(
        "markers", "tpu: requires the real TPU backend (run: pytest -m tpu)"
    )
    mexpr = config.getoption("-m") or ""
    _TPU_LANE = "tpu" in mexpr and "not tpu" not in mexpr
    if not _TPU_LANE:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()

    import jax

    if not _TPU_LANE:
        jax.config.update("jax_platforms", "cpu")


def pytest_collection_modifyitems(config, items):
    import jax

    on_tpu = jax.default_backend() == "tpu"
    skip = pytest.mark.skip(reason="requires TPU backend (run: pytest -m tpu)")
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip)
