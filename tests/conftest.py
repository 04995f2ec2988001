"""Test configuration: force an 8-device virtual CPU mesh.

Sharding logic is pure data parallelism over independent blocks
(SURVEY.md §2.8), so a single-process N-device CPU mesh covers the
multi-chip/multi-host code paths without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin ignores the env var, so also pin via jax.config before
# any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

BOOK1 = "/root/reference/book1"


@pytest.fixture(scope="session")
def book1() -> np.ndarray:
    with open(BOOK1, "rb") as f:
        return np.frombuffer(f.read(), dtype=np.uint8)


@pytest.fixture(scope="session")
def book1_head(book1) -> np.ndarray:
    """First 64 KiB of book1 -- small enough for the per-symbol oracle."""
    return book1[:65536]


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(713)
