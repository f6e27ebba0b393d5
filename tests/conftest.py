import os

# Tests run on a virtual 8-device CPU mesh; the real TPU is reserved for
# bench.py.  The environment presets JAX_PLATFORMS=axon (a tunneled TPU) in
# a way that survives env-var overrides, so force the backend through the
# config API before any backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

REFERENCE = "/root/reference"
TPCH10 = os.path.join(REFERENCE, "tests", "tpch10noorder")

import pytest


@pytest.fixture(scope="session")
def tpch10_config():
    from mplan2vdl_tpu.catalog import load_config

    return load_config(
        os.path.join(TPCH10, "bounds.csv"),
        os.path.join(TPCH10, "storage.csv"),
        os.path.join(TPCH10, "schema.msqldump"),
        os.path.join(TPCH10, "dictionary.csv"),
    )
