"""Device mesh construction.

The reference binds exactly one GPU (``cudaGLSetGLDevice(maxGflops)``,
``src/main.cpp:296-298``) and has no multi-device story.  Here the scale
unit is a 1-D ``jax.sharding.Mesh`` over every addressable device —
spanning ICI within a slice and DCN across hosts — with pixels/wavefronts
sharded over it (SURVEY.md §2 parallelism table).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "shard"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.array(devices), (AXIS,))


def initialize_distributed():
    """Multi-host entry: call once per host before building the mesh
    (jax.distributed handles the DCN rendezvous).  No-op when the process
    already owns every device (single-host).

    On TPU pods the coordinator/process topology is auto-detected from the
    cluster environment; elsewhere (and in the two-process CPU smoke test,
    tests/test_distributed.py) it is passed explicitly via
    ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``.

    Launch incantation (one per host)::

        JAX_COORDINATOR_ADDRESS=host0:9123 JAX_NUM_PROCESSES=4 \\
            JAX_PROCESS_ID=$i python -m pathtracer_tpu.cli scene=... --sharded
    """
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if addr is None:
        return
    kwargs = {"coordinator_address": addr}
    has_n = "JAX_NUM_PROCESSES" in os.environ
    has_id = "JAX_PROCESS_ID" in os.environ
    if has_n != has_id:
        missing = "JAX_PROCESS_ID" if has_n else "JAX_NUM_PROCESSES"
        raise RuntimeError(
            "distributed launch misconfigured: JAX_NUM_PROCESSES and "
            f"JAX_PROCESS_ID must be set together; {missing} is missing "
            f"(JAX_COORDINATOR_ADDRESS={addr})"
        )
    if has_n:
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded_rows(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(AXIS))
