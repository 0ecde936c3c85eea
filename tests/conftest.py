"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors the reference's in-process multi-node tests (SURVEY.md §4): instead of
a mock gRPC master, we give JAX 8 virtual CPU devices so sharding/collective
paths compile and execute without TPU hardware.

The axon PJRT plugin registers itself at interpreter start (sitecustomize)
and pins jax_platforms to the TPU tunnel; overriding via jax.config here —
before any backend is initialized — routes all tests to the virtual CPU
backend and keeps the single real TPU chip free for benchmarks.
"""

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
