"""Test configuration: force an 8-device virtual CPU mesh.

The production environment exposes a single real TPU chip; multi-chip
sharding logic is validated on a virtual CPU mesh, exactly as the driver's
dryrun does. Setting the platform before any JAX computation runs is
sufficient even though the TPU plugin self-registers at interpreter start.

Set CORENET_TEST_TPU=1 to run the suite against the real TPU instead
(single device; mesh tests will skip).
"""

import os

os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
  os.environ["XLA_FLAGS"] = (
      os.environ["XLA_FLAGS"] + " --xla_force_host_platform_device_count=8")

# Pin the platform BEFORE jax imports: the TPU plugin self-registers (and
# may open its tunnel connection) at import time, so a config.update after
# import still leaves the test process holding the single-client tunnel —
# starving a concurrent on-chip run (bench/selfcheck) of the backend.
if not os.environ.get("CORENET_TEST_TPU"):
  os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not os.environ.get("CORENET_TEST_TPU"):
  jax.config.update("jax_platforms", "cpu")

# XLA:CPU compiles of the full model dominate test time; cache them.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_kernel_sharding_registry():
  """The kernel-sharding mesh registry is process-global (one training
  mesh per process in production); tests that register a mesh must not
  leak it into later tests — a stale mesh makes standalone kernel calls
  shard_map over a mesh their inputs were never sharded on."""
  from corenet_tpu.parallel import kernel_sharding
  kernel_sharding.register_mesh(None)
  yield
  kernel_sharding.register_mesh(None)
