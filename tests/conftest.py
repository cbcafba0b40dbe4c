"""Test harness config: run JAX on CPU with 8 virtual devices so that
multi-chip sharding paths (mesh + collectives) are exercised without TPU
hardware. Must run before the first `import jax`."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Something in this environment pins jax_platforms to "axon,cpu" regardless of
# the env var; force pure-CPU for the test suite (8 virtual devices).
import jax

jax.config.update("jax_platforms", "cpu")
