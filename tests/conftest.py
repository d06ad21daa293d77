"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-native analogue of the reference's `ddp_sim` CPU-process
simulation (configs/trainer/ddp_sim.yaml, tests/test_train.py:52-61): the
same SPMD programs that run on a TPU slice execute on 8 virtual CPU devices,
so sharding/collective layouts are exercised in CI without TPU hardware.
"""

import os
import sys
from pathlib import Path

# must be set before jax initializes its backends (XLA_FLAGS is read lazily at
# backend init, so setting it here is early enough)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# the ambient environment may have imported jax already (TPU plugin
# sitecustomize), in which case the env var was captured before us — override
# through the config API, which wins as long as no backend is initialized yet.
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite is dominated by XLA compiles of the
# same tiny programs — cache them across runs (dir is .gitignore'd)
jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent.parent / ".jax_cache_tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(scope="session")
def mesh():
    from particle_fm_tpu.parallel.mesh import make_mesh

    assert jax.device_count() == 8, "expected 8 virtual CPU devices"
    return make_mesh()


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)


def synthetic_cloud(batch=16, n=30, feats=3, cond_dim=0, seed=0):
    """Padded particle-cloud batch with variable multiplicities (numpy)."""
    rs = np.random.RandomState(seed)
    x = rs.randn(batch, n, feats).astype(np.float32)
    n_valid = rs.randint(max(1, n // 3), n + 1, size=batch)
    mask = (np.arange(n)[None, :] < n_valid[:, None]).astype(np.float32)[..., None]
    x = x * mask
    cond = rs.randn(batch, cond_dim).astype(np.float32) if cond_dim else None
    return x, mask, cond


@pytest.fixture()
def cloud():
    return synthetic_cloud()
