"""Test config: force the CPU backend with 8 virtual devices BEFORE jax
imports, so multi-chip sharding logic is testable without TPU hardware
(the standard JAX fake-backend trick), and point the asset resolver at the
bundled read-only scene corpus."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

_REF = "/root/reference"
if os.path.isdir(_REF):
    os.environ.setdefault("RUSTRAY_ASSET_ROOT", _REF)

# Some TPU plugins (axon) ignore JAX_PLATFORMS; force the CPU client
# explicitly before any backend is initialized.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def reference_scenes():
    if not os.path.isdir(_REF):
        pytest.skip("bundled scene corpus not available")
    return os.path.join(_REF, "scene")


def assert_images_close(a: np.ndarray, b: np.ndarray, atol: float = 1e-2,
                        frac: float = 0.995, name: str = "image"):
    """Allclose for rendered images: at least ``frac`` of pixels within
    ``atol`` (float32 device vs float64 oracle can disagree structurally on
    a handful of edge pixels where the closest-hit winner flips)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    err = np.abs(a - b)
    if err.ndim == 3:
        err = err.max(axis=-1)
    ok = (err <= atol).mean()
    assert ok >= frac, (
        f"{name}: only {ok * 100:.2f}% of pixels within {atol} "
        f"(max err {err.max():.4f}, mean {err.mean():.5f})")
