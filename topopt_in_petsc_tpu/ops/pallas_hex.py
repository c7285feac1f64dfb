"""Pallas TPU kernel: fused matrix-free hex elasticity operator.

The XLA gather-matmul formulation of `K(x) @ u` (ops.hex_operator)
materializes (nelem, 24) intermediates in HBM and keeps dof=3 on the
128-lane minor dimension — measured ~10x off the bandwidth/VPU roofline.
This kernel computes the node-centric form

    out_i[n] = sum_{a,b} E(n - off_a) * KE[a-blk, b-blk][i, j] * u_j[n + off_b - off_a]

entirely in VMEM: each grid step owns a disjoint (TX, TY, full-z) output
tile, DMAs the (TX+2, TY+2, z) input window from zero-padded HBM copies
of u and E (halo included, no edge masking), and accumulates the 64
(a, b) corner terms as fused vector ops with z on the lane dimension.

Layout contract: u enters as (3, nx, ny, nz) ("dof-major"); the public
wrapper transposes from/to the framework's (nx, ny, nz, 3) convention
(two cheap bandwidth passes, fused by XLA into the pad).

Reference parity: this is AssembleStiffnessMatrix + MatMult
(LinearElasticity.cc:487-549, 204) as one kernel, with SIMP scaling
(Emin + x^p (Emax-Emin)) already folded into E by the caller.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from topopt_in_petsc_tpu.grid import CORNER_OFFSETS


def _kernel(up_hbm, ep_hbm, out_ref, ubuf, ebuf, sems,
            *, TX: int, TY: int, nz: int, keb: np.ndarray, pairs=None):
    """One (TX, TY, nz) output tile; up/ep stay in HBM (ANY) and the
    needed halo windows are DMA'd in.

    Mosaic constraints honored (this build crashes otherwise): DMAs copy
    FULL lane extents only, and every VMEM scratch has a 128-multiple
    lane dim — so the staging arrays are lane-padded on the host and the
    compute reads odd-sized lane slices out of aligned buffers.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    u_dma = pltpu.make_async_copy(
        up_hbm.at[:, pl.ds(i * TX, TX + 2), pl.ds(j * TY, TY + 2), :],
        ubuf,
        sems.at[0],
    )
    e_dma = pltpu.make_async_copy(
        ep_hbm.at[pl.ds(i * TX, TX + 1), pl.ds(j * TY, TY + 1), :],
        ebuf,
        sems.at[1],
    )
    u_dma.start()
    e_dma.start()
    u_dma.wait()
    e_dma.wait()

    if pairs is None:
        pairs = [(a, b) for a in range(8) for b in range(8)]
    acc = [jnp.zeros((TX, TY, nz), jnp.float32) for _ in range(3)]
    last_a = None
    Ea = None
    for a, b in pairs:
        oa = CORNER_OFFSETS[a]
        ob = CORNER_OFFSETS[b]
        if a != last_a:
            # E placed at corner a: for out nodes [x0, x0+TX), element
            # index n - oa -> padded-E window offset (1 - oa)
            Ea = ebuf[
                pl.ds(1 - oa[0], TX),
                pl.ds(1 - oa[1], TY),
                pl.ds(1 - oa[2], nz),
            ]
            last_a = a
        if True:
            dx, dy, dz = ob[0] - oa[0], ob[1] - oa[1], ob[2] - oa[2]
            us = [
                ubuf[
                    c,
                    pl.ds(1 + dx, TX),
                    pl.ds(1 + dy, TY),
                    pl.ds(1 + dz, nz),
                ]
                for c in range(3)
            ]
            for ii in range(3):
                k0 = float(keb[a, b, ii, 0])
                k1 = float(keb[a, b, ii, 1])
                k2 = float(keb[a, b, ii, 2])
                acc[ii] = acc[ii] + Ea * (
                    k0 * us[0] + k1 * us[1] + k2 * us[2]
                )
    out_ref[:] = jnp.stack(acc, axis=0)


def make_pallas_hex_apply(
    nn: Tuple[int, int, int],
    KE: np.ndarray,
    *,
    tile: Tuple[int, int] = (8, 8),
    interpret: bool = False,
    split: int = 1,
):
    """Build `apply(u, E) -> K@u` for a fixed grid size.

    u: (nx, ny, nz, 3); E: (ex, ey, ez); both f32.  KE: (24, 24) static.
    """
    nx, ny, nz = nn
    ex, ey, ez = nx - 1, ny - 1, nz - 1
    TX, TY = tile
    gx = -(-nx // TX)
    gy = -(-ny // TY)
    keb = np.asarray(KE, np.float32).reshape(8, 3, 8, 3).transpose(
        0, 2, 1, 3
    )

    # padded HBM shapes: u (3, gx*TX+2, gy*TY+2, ZP); E one less + pad;
    # lane (z) dim padded to a 128 multiple (full-lane DMA requirement)
    upx, upy = gx * TX + 2, gy * TY + 2
    ZP = -(-(nz + 2) // 128) * 128

    all_pairs = [(a, b) for a in range(8) for b in range(8)]
    chunks = [
        all_pairs[i :: split] for i in range(split)
    ] if split > 1 else [all_pairs]

    calls = []
    for pairs in chunks:
        kern = functools.partial(
            _kernel, TX=TX, TY=TY, nz=nz, keb=keb,
            pairs=sorted(pairs),
        )
        calls.append(
            pl.pallas_call(
                kern,
                grid=(gx, gy),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(
                    (3, TX, TY, nz),
                    lambda i, j: (0, i, j, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (3, gx * TX, gy * TY, nz), jnp.float32
                ),
                scratch_shapes=[
                    pltpu.VMEM((3, TX + 2, TY + 2, ZP), jnp.float32),
                    pltpu.VMEM((TX + 1, TY + 1, ZP), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
                interpret=interpret,
            )
        )

    def apply(u: jax.Array, E: jax.Array) -> jax.Array:
        # to dof-major, zero-pad one halo cell + tile round-up; z (lane)
        # padded to ZP
        ut = jnp.transpose(u.astype(jnp.float32), (3, 0, 1, 2))
        up = jnp.pad(
            ut,
            ((0, 0), (1, upx - nx - 1), (1, upy - ny - 1),
             (1, ZP - nz - 1)),
        )
        epad = jnp.pad(
            E.astype(jnp.float32),
            ((1, upx - 1 - ex - 1), (1, upy - 1 - ey - 1),
             (1, ZP - ez - 1)),
        )
        out = calls[0](up, epad)
        for extra in calls[1:]:
            out = out + extra(up, epad)
        out = out[:, :nx, :ny, :]
        return jnp.transpose(out, (1, 2, 3, 0)).astype(u.dtype)

    return apply
