"""Hardware probes for the blocked-resident solver kernel design.

Probe A: async-copy DMA from a 3D (C, rows, L) HBM ref with a STATIC
         leading index + dynamic slice on the (new) leading rows dim:
         src.at[c, pl.ds(row0, n)].
Probe B: pl.when-gated DMA + compute (edge slabs skip work entirely).
Probe C: pl.when-gated zero write with unconditional DMA.

Each probe prints OK/FAIL; run alone on the TPU.
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

ROWS, L = 64, 256


def probe_a():
    def kern(src, out_ref, buf, sem):
        i = pl.program_id(0)
        row0 = i.astype(jnp.int32) * np.int32(8)
        d = pltpu.make_async_copy(
            src.at[1, pl.ds(row0, 16)], buf, sem
        )
        d.start()
        d.wait()
        out_ref[:] = buf[:8, :] * 2.0

    x = jnp.arange(3 * ROWS * L, dtype=jnp.float32).reshape(3, ROWS, L)
    call = pl.pallas_call(
        kern,
        grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (8, L), lambda i: (i, np.int32(0)), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((32, L), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((16, L), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = np.asarray(call(x))
    expect = np.asarray(x[1, :32, :]) * 2.0
    np.testing.assert_allclose(out, expect)
    return "A OK (3D ref static-lead + ds DMA)"


def probe_b():
    def kern(src, out_ref, buf, sem):
        i = pl.program_id(0)
        edge = i == np.int32(0)

        @pl.when(edge)
        def _():
            out_ref[:] = jnp.zeros((8, L), jnp.float32)

        @pl.when(jnp.logical_not(edge))
        def _():
            row0 = (i - 1).astype(jnp.int32) * np.int32(8)
            d = pltpu.make_async_copy(
                src.at[pl.ds(row0, 16)], buf, sem
            )
            d.start()
            d.wait()
            out_ref[:] = buf[:8, :] * 3.0

    x = jnp.arange(ROWS * L, dtype=jnp.float32).reshape(ROWS, L)
    call = pl.pallas_call(
        kern,
        grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (8, L), lambda i: (i, np.int32(0)), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((32, L), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((16, L), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = np.asarray(call(x))
    assert (out[:8] == 0).all()
    np.testing.assert_allclose(out[8:], np.asarray(x[:24]) * 3.0)
    return "B OK (pl.when-gated DMA)"


def probe_c():
    def kern(src, out_ref, buf, sem):
        i = pl.program_id(0)
        ic = jnp.clip(i.astype(jnp.int32) - 1, 0, 2)
        d = pltpu.make_async_copy(
            src.at[pl.ds(ic * np.int32(8), 16)], buf, sem
        )
        d.start()
        d.wait()
        live = jnp.logical_and(i > 0, i < 4).astype(jnp.float32)
        out_ref[:] = buf[:8, :] * 3.0 * live

    x = jnp.arange(ROWS * L, dtype=jnp.float32).reshape(ROWS, L)
    call = pl.pallas_call(
        kern,
        grid=(5,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (8, L), lambda i: (i, np.int32(0)), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((40, L), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((16, L), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = np.asarray(call(x))
    assert (out[:8] == 0).all() and (out[32:] == 0).all()
    np.testing.assert_allclose(out[8:32], np.asarray(x[:24]) * 3.0)
    return "C OK (clamped DMA + scalar-mult zeroing)"


if __name__ == "__main__":
    for name, fn in (("A", probe_a), ("B", probe_b), ("C", probe_c)):
        try:
            print(fn())
        except Exception as e:  # noqa: BLE001
            print(f"{name} FAIL: {type(e).__name__}: {e}", file=sys.stderr)
