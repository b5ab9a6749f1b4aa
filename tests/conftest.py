"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so that every sharding /
collective path is exercised without TPU hardware, mirroring how the
driver dry-runs the multi-chip path.  Environment must be set before the
first `import jax` anywhere in the test process.
"""

import os
import sys

# Force CPU even if the ambient environment points JAX at a TPU platform
# (set STRAINER2_TEST_TPU=1 to run the suite against real hardware).
# A sitecustomize may have imported jax already (latching JAX_PLATFORMS at
# import time), so set the config explicitly as well — this works as long
# as no backend has been initialized yet.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
if not os.environ.get("STRAINER2_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
