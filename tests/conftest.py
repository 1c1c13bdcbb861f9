"""Test configuration: force an 8-device virtual CPU platform.

Must run before jax initializes — pytest imports conftest first, so setting
the env vars here is sufficient as long as no test module imports jax at
collection time before this executes.
"""

import os
import sys

# The session environment pins JAX_PLATFORMS=axon (the real TPU tunnel);
# tests always run on the virtual 8-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# sitecustomize may have imported jax already (axon PJRT registration), so
# the env var alone is not enough — override the config directly.  Backends
# initialize lazily, so this takes effect as long as no array op ran yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
