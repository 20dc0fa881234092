"""Prototype: jax.vjp inside a Pallas TPU kernel (feasibility check for
the fused backward).  Computes d/dx and d/dscale of a toy physics fn with
a where-chain + rsqrt + reduction-to-scalar param grad, comparing the
kernel (compiled on TPU / interpret on CPU) against plain jax.grad."""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES = 8, 128


def physics(x, y, scale, shift):
    # toy bounce-ish physics: normalize, select-chain, smooth nonlinearity
    r = jax.lax.rsqrt(jnp.maximum(x * x + y * y, 1e-12))
    xn, yn = x * r, y * r
    better = xn > yn
    w = jnp.where(better, xn * scale, yn * shift)
    return jnp.sin(w) * scale + w * w


def bwd_kernel(scal_ref, x_ref, y_ref, g_ref, dx_ref, dy_ref, dscal_ref):
    x, y, g = x_ref[:], y_ref[:], g_ref[:]
    scale = scal_ref[0]
    shift = scal_ref[1]
    out, vjp = jax.vjp(physics, x, y, scale, shift)
    dx, dy, dscale, dshift = vjp(g)
    dx_ref[:] = dx
    dy_ref[:] = dy

    # param-grad accumulation across the (sequential) TPU grid: every
    # program revisits the same SMEM block; program 0 initializes
    @pl.when(pl.program_id(0) == 0)
    def _():
        dscal_ref[0, 0] = 0.0
        dscal_ref[0, 1] = 0.0

    dscal_ref[0, 0] += dscale
    dscal_ref[0, 1] += dshift


@functools.partial(jax.jit, static_argnames=("interpret",))
def run(x, y, g, scal, interpret=False):
    n_prog = x.shape[0] // ROWS
    plane = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        bwd_kernel,
        grid=(n_prog,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [plane] * 3,
        out_specs=(
            plane, plane,
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, jnp.float32),
            jax.ShapeDtypeStruct(x.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
        ),
        interpret=interpret,
    )(scal, x, y, g)


def main():
    import numpy as np

    interpret = jax.default_backend() != "tpu"
    print("backend:", jax.default_backend(), "interpret:", interpret)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(ROWS * 2, LANES), jnp.float32)
    y = jnp.asarray(rng.randn(ROWS * 2, LANES), jnp.float32)
    g = jnp.asarray(rng.randn(ROWS * 2, LANES), jnp.float32)
    scal = jnp.asarray([1.3, -0.7], jnp.float32)

    dx, dy, dscal = run(x, y, g, scal, interpret=interpret)

    ref_out, ref_vjp = jax.vjp(physics, x, y, scal[0], scal[1])
    rdx, rdy, rdscale, rdshift = ref_vjp(g)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rdx), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dy), np.asarray(rdy), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(
        float(dscal[0, 0]), float(rdscale), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(dscal[0, 1]), float(rdshift), rtol=1e-4
    )
    print("OK: in-kernel jax.vjp matches jax.vjp outside")


if __name__ == "__main__":
    main()
