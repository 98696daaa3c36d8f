"""Test harness: run everything on CPU with 8 virtual devices so distributed
code paths (mesh/shard_map/psum) are exercised without TPU hardware — the
TPU-native analog of fake-backend testing (SURVEY.md §4).

jax may already be imported at interpreter startup (site hook), so env vars
are too late — use jax.config.update, which takes effect because no backend
has been initialized yet.
"""

import os

_ON_TPU = bool(os.environ.get("KDT_TEST_TPU"))  # run on real TPU instead
                                                # (for the @requires_tpu
                                                # kernel-equivalence tests)

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass
jax.config.update("jax_threefry_partitionable", True)

if not _ON_TPU:
    assert jax.default_backend() == "cpu", "tests must run on CPU"
    assert len(jax.devices()) >= 8, "tests need 8 virtual CPU devices"
