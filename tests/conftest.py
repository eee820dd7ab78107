"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-device sharding tests run on a virtual CPU mesh
(xla_force_host_platform_device_count) — set before jax import.
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep matmuls in strict f32 on CPU for parity tests.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

# The container's sitecustomize registers the TPU ("axon") PJRT plugin and
# imports jax before conftest runs; re-point the already-imported jax at CPU.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")

if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import pytest  # noqa: E402


def has_reference() -> bool:
    return REFERENCE.exists()


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted"
)


def _shim_missing_reference_deps():
    """Stub the reference's unused-at-test-time imports (lhotse) so its
    numerics modules import in this minimal environment."""
    import types

    if "lhotse" not in sys.modules:
        try:
            import lhotse  # noqa: F401
        except ImportError:
            lhotse = types.ModuleType("lhotse")
            utils = types.ModuleType("lhotse.utils")
            utils.fix_random_seed = lambda seed: None
            lhotse.utils = utils
            sys.modules["lhotse"] = lhotse
            sys.modules["lhotse.utils"] = utils


@pytest.fixture(scope="session")
def reference_path():
    if not has_reference():
        pytest.skip("reference repo not mounted")
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    _shim_missing_reference_deps()
    return REFERENCE
