"""Test harness config: run everything on a virtual 8-device CPU mesh so
multi-chip sharding is exercised without TPU hardware (the driver separately
dry-runs the multichip path; bench.py uses the real chip).

The environment boots with an `axon` TPU platform pinned via sitecustomize;
jax.config.update after import (but before first backend use) overrides it.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
