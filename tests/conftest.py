import os

# Tests run on a virtual 8-device CPU mesh; the real TPU is reserved for
# bench.py.  Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

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
