"""Multi-host initialization and mesh construction.

One real chip is available in this environment, so multi-host execution is
exercised on virtual device meshes (tests/ run on 8 CPU devices and the
distributed paths use only portable constructs: shard_map, psum/pmax/pmin,
all_to_all).  On a real pod slice the same code runs after
``initialize()``: jax.distributed wires the hosts, the named mesh spans
all devices, and XLA routes the collectives over ICI within a slice and
DCN across slices.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join a multi-host run (no-op when single-process).

    Arguments default from the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), which
    cluster launchers set; on Cloud TPU `jax.distributed.initialize()`
    autodetects everything.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0")))


def data_mesh(axis: str = "d") -> "jax.sharding.Mesh":
    """A 1-D mesh over every device of every host — the row-sharding axis
    used by parallel/auto.py and parallel/shuffle_agg.py.  Fact-table rows
    are sharded host-locally (each host device_puts only its shard), dims
    replicate."""
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))
