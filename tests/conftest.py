"""Test configuration: force an 8-device virtual CPU platform.

Multi-device sharding tests run against a virtual mesh
(``xla_force_host_platform_device_count=8``) so the suite exercises the same
pjit/shard_map programs the TPU path uses without needing a real slice
(SURVEY.md §4 test-strategy recommendation (e)).
"""

import os

# The machine env pins JAX_PLATFORMS=axon (the TPU tunnel) and a
# sitecustomize hard-sets jax.config jax_platforms at interpreter start, so an
# env var alone is not enough — update the config after import too.
if not os.environ.get("CMDIAD_TEST_ON_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not os.environ.get("CMDIAD_TEST_ON_TPU"):
    jax.config.update("jax_platforms", "cpu")
else:
    # The suite's oracle tolerances are calibrated for f32 math; TPU's
    # default matmul precision is bf16-ish passes, which moves einsum
    # results (and through them FPS/KNN *selections*) past those bounds.
    # Tests verify math, so pin f32 matmuls; production keeps the default
    # (speed) and its numeric envelope is covered by the bf16 end-metric
    # test and the recorded approx-vs-exact deltas in BASELINE.md.
    jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
