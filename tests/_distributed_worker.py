"""Subprocess body for the two-process jax.distributed smoke test
(tests/test_distributed.py).  Must be launched with
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID set."""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")

from pathtracer_tpu.parallel.mesh import initialize_distributed  # noqa: E402


def main():
    initialize_distributed()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.local_devices()) == 2, jax.local_devices()
    assert len(jax.devices()) == 4, jax.devices()

    # exercise a real cross-process collective (DCN-analog rendezvous)
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("pathtracer-dist-smoke")
    v = multihost_utils.broadcast_one_to_all(
        jnp.asarray(float(jax.process_index() + 7.0))
    )
    assert float(v) == 7.0, float(v)  # everyone sees process 0's value

    print(f"DIST_OK {jax.process_index()}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
