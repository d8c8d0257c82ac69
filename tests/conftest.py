"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the standard JAX way to test multi-chip sharding without hardware
(SURVEY.md section 4). Must set the env vars before jax initializes.
"""

import os

# Force CPU: the session environment pre-sets JAX_PLATFORMS to the TPU platform,
# but the test suite must run on a virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "collective_call_terminate_timeout" not in flags:
    # On 1-2 core hosts the 8 virtual devices reach a collective staggered by
    # serialized compute; XLA:CPU's default 40 s rendezvous termination then
    # aborts the whole pytest process (Fatal Python error inside the mesh
    # tests). Same mitigation as __graft_entry__.dryrun_multichip.
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=900")
os.environ["XLA_FLAGS"] = flags.strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var - force via config too.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: this box has a single CPU core and XLA compiles
# dominate test wall-time; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
