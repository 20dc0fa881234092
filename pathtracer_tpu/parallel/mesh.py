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
    already owns every device (single-host)."""
    import os

    if "JAX_COORDINATOR_ADDRESS" in os.environ or "COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded_rows(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(AXIS))
