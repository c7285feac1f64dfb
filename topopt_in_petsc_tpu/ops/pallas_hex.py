"""Pallas TPU kernel: fused matrix-free hex elasticity operator.

The XLA gather-matmul formulation of `K(x) @ u` (ops.hex_operator)
materializes (nelem, 24) intermediates in HBM and keeps dof=3 on the
128-lane minor dimension — measured ~10x off the bandwidth/VPU roofline.
This kernel computes the node-centric form

    out_i[n] = sum_{a,b} E(n - oa) * KE[a, b][i, j] * u_j[n + ob - oa]

entirely in VMEM.  Reference parity: AssembleStiffnessMatrix + MatMult
(LinearElasticity.cc:487-549, 204) as one kernel, with SIMP scaling
(Emin + x^p (Emax-Emin)) already folded into E by the caller.

Hardware-probed backend constraints drive the whole layout (this axon
build's Mosaic crashes the TPU *worker process* otherwise — each was
isolated with single-feature probe kernels):

  - `make_async_copy` HBM->VMEM may slice ONLY the leading dimension of
    the source ref; sublane/lane dims must be copied at full extent.
    (Slicing the second-minor dim faults the device at runtime.)
  - Offset slices and `pltpu.roll` on VMEM *values* are fine; lane-dim
    `concatenate` of offset-layout vectors is UNIMPLEMENTED (so no
    jnp.pad of lane slices inside the kernel).

Layout that satisfies them: tile the grid over x-slabs only; flatten
(y, z) onto the 128-lane axis as l = (y+1)*ZPc + (z+1) with ZPc = nz+2
(one halo plane each side, <1% lane padding).  Then

  - the slab DMA is a leading-dim slice (full lanes),
  - x-offsets (element corner a vs b) are sublane slices,
  - y/z-offsets are single lane-rolls by dy*ZPc + dz, whose wrap-around
    garbage provably lands only in the halo lanes (|shift| <= ZPc+1 and
    the valid region starts at lane ZPc+1),
  - boundary truncation comes from the zero halo padding, no masking.

The 64 (a, b) corner-pair terms are grouped by the node offset
d = ob - oa so each (dy, dz) needs one roll per displacement component
(27 rolls of u total) and each (ay, az) one roll of E (16 total).
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

_CIDX = {off: i for i, off in enumerate(CORNER_OFFSETS)}
# 1D corner pairs (a, b) grouped by their offset difference d = b - a
_PAIRS_1D = {-1: [(1, 0)], 0: [(0, 0), (1, 1)], 1: [(0, 1)]}


def _kernel(u0, u1, u2, e_hbm, out_ref, ub0, ub1, ub2, eb, sems,
            *, TX: int, Lp: int, ZPc: int, keb: np.ndarray,
            row_pitch: int):
    """One (3, TX, Lp) output slab; u/E stay in HBM (ANY) as
    (YB*row_pitch, Lp) y-chunk-blocked arrays and the x-slab windows
    (full lane extent!) are DMA'd in."""
    j = pl.program_id(0)  # y chunk
    i = pl.program_id(1)  # x slab

    # DMA slices on the (sublane) leading dim must be 8-aligned in
    # offset AND extent on this backend: copy TX+8 rows (6 rows of
    # slack beyond the +2 halo) so both are multiples of 8.
    # (row_pitch = XP is a multiple of 8 by construction.)
    # pin to i32: under jax_enable_x64 the Python-int multiply promotes
    # to i64, which tpu.memref_slice rejects
    row0 = (
        j.astype(jnp.int32) * np.int32(row_pitch)
        + i.astype(jnp.int32) * np.int32(TX)
    )
    dmas = []
    for r, (src, dst) in enumerate(((u0, ub0), (u1, ub1), (u2, ub2))):
        d = pltpu.make_async_copy(
            src.at[pl.ds(row0, TX + 8), :], dst, sems.at[np.int32(r)]
        )
        d.start()
        dmas.append(d)
    de = pltpu.make_async_copy(
        e_hbm.at[pl.ds(row0, TX + 8), :], eb, sems.at[np.int32(3)]
    )
    de.start()
    for d in dmas:
        d.wait()
    de.wait()

    uv = [ub0[:, :], ub1[:, :], ub2[:, :]]  # (TX+8, Lp) values
    ev = eb[:, :]  # (TX+8, Lp)

    acc = [jnp.zeros((TX, Lp), jnp.float32) for _ in range(3)]
    for dy in (-1, 0, 1):
        for dz in (-1, 0, 1):
            # u_j(.. y+dy, z+dz) aligned at the out lanes: one lane-roll
            # per component, then one sublane slice per dx below
            # pltpu.roll requires non-negative shifts; roll is cyclic
            # over the Lp lanes so reduce mod Lp
            ur = [
                pltpu.roll(uv[c], np.int32((-(dy * ZPc + dz)) % Lp), 1)
                for c in range(3)
            ]
            us = {
                dx: [ur[c][dx + 1 : dx + 1 + TX, :] for c in range(3)]
                for dx in (-1, 0, 1)
            }
            for ay, by in _PAIRS_1D[dy]:
                for az, bz in _PAIRS_1D[dz]:
                    # E(.. y-ay, z-az) aligned at the out lanes
                    Ea = pltpu.roll(ev, np.int32((ay * ZPc + az) % Lp), 1)
                    for ax, bx in ((0, 0), (0, 1), (1, 0), (1, 1)):
                        a = _CIDX[(ax, ay, az)]
                        b = _CIDX[(bx, by, bz)]
                        Eas = Ea[1 - ax : 1 - ax + TX, :]
                        u_s = us[bx - ax]
                        # factor E once per component: 12 vector ops
                        # per pair instead of 15
                        t = [Eas * u_s[jj] for jj in range(3)]
                        for ii in range(3):
                            k0 = float(keb[a, b, ii, 0])
                            k1 = float(keb[a, b, ii, 1])
                            k2 = float(keb[a, b, ii, 2])
                            acc[ii] = (
                                acc[ii] + k0 * t[0] + k1 * t[1]
                                + k2 * t[2]
                            )
    out_ref[:] = jnp.stack(acc, axis=0)


def make_pallas_hex_apply(
    nn: Tuple[int, int, int],
    KE: np.ndarray,
    *,
    tx: int = 8,
    yc: int | None = None,
    lane_budget: int = 20480,
    interpret: bool = False,
):
    """Build `apply(u, E) -> K@u` for a fixed grid size.

    u: (nx, ny, nz, 3); E: (ex, ey, ez) with SIMP scaling folded in.
    KE: (24, 24) static element matrix.  Output matches
    ops.hex_operator.apply_hex_operator (free/Neumann everywhere; the
    caller applies Dirichlet masks outside).

    Large grids are additionally chunked along y (`yc` rows per chunk,
    auto-sized so each tile's flattened lane extent stays within
    `lane_budget` and hence within VMEM): the host pre-blocks u/E into a
    (YB*XP, Lcp) layout with duplicated one-row y-halos so the kernel's
    DMA remains a pure leading-dim slice.
    """
    nx, ny, nz = nn
    ex, ey, ez = nx - 1, ny - 1, nz - 1
    TX = tx
    gx = -(-nx // TX)
    keb = np.asarray(KE, np.float32).reshape(8, 3, 8, 3).transpose(
        0, 2, 1, 3
    )

    ZPc = nz + 2
    if yc is None:
        yc = max(4, lane_budget // ZPc - 2)
    yc = min(yc, ny)
    YB = -(-ny // yc)
    YPb = YB * yc + 2  # padded y extent covering all chunk windows
    Lc = (yc + 2) * ZPc
    Lcp = -(-Lc // 128) * 128
    XP = gx * TX + 8  # slab rows (halo + DMA 8-alignment slack)

    kern = functools.partial(
        _kernel, TX=TX, Lp=Lcp, ZPc=ZPc, keb=keb, row_pitch=XP
    )
    call = pl.pallas_call(
        kern,
        grid=(YB, gx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=pl.BlockSpec(
            (3, TX, Lcp),
            # np.int32 constants: under jax_enable_x64 plain-int index
            # map components trace as i64 and Mosaic can't legalize the
            # mixed-type func.return
            lambda j, i: (np.int32(0), j * gx + i, np.int32(0)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (3, YB * gx * TX, Lcp), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((TX + 8, Lcp), jnp.float32),
            pltpu.VMEM((TX + 8, Lcp), jnp.float32),
            pltpu.VMEM((TX + 8, Lcp), jnp.float32),
            pltpu.VMEM((TX + 8, Lcp), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        # the default 16M *scoped* vmem limit is far below the physical
        # 128M; the unrolled 64-term body keeps several rolled slabs
        # live at once
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )

    def _block(arr_pad):
        """(XP, YPb, ZPc) -> (YB*XP, Lcp): stack overlapping y-windows
        (one halo row each side, duplicated across chunks)."""
        w = jnp.stack(
            [arr_pad[:, j * yc : j * yc + yc + 2, :] for j in range(YB)],
            axis=0,
        ).reshape(YB * XP, Lc)
        return jnp.pad(w, ((0, 0), (0, Lcp - Lc)))

    def _prep_u(u: jax.Array):
        """Per-component pad+block: sequencing components keeps the HBM
        transient peak at ~1 component instead of the whole (3, ...)
        padded copy (matters at 512^3 where each is 1.7 GB)."""
        ubs = []
        for c in range(3):
            uc = jnp.pad(
                u[..., c].astype(jnp.float32),
                ((1, XP - nx - 1), (1, YPb - ny - 1),
                 (1, ZPc - nz - 1)),
            )
            ubs.append(_block(uc))
        return ubs

    def prepare_coef(E: jax.Array) -> jax.Array:
        """Pre-block the element coefficient; constant across all
        applies of one solve, so hoist it (GeometricMultigrid.setup)."""
        ep = jnp.pad(
            E.astype(jnp.float32),
            ((1, XP - ex - 1), (1, YPb - ey - 1), (1, ZPc - ez - 1)),
        )
        return _block(ep)

    def _run(ubs, eb, out_dtype):
        out = call(ubs[0], ubs[1], ubs[2], eb)
        out = out.reshape(3, YB, gx * TX, Lcp)[:, :, :nx, :Lc]
        out = out.reshape(3, YB, nx, yc + 2, ZPc)[
            :, :, :, 1 : 1 + yc, 1 : 1 + nz
        ]
        out = jnp.transpose(out, (0, 2, 1, 3, 4)).reshape(
            3, nx, YB * yc, nz
        )[:, :, :ny, :]
        return jnp.transpose(out, (1, 2, 3, 0)).astype(out_dtype)

    def apply_prepared(u: jax.Array, eb: jax.Array) -> jax.Array:
        return _run(_prep_u(u), eb, u.dtype)

    def apply(u: jax.Array, E: jax.Array) -> jax.Array:
        return _run(_prep_u(u), prepare_coef(E), u.dtype)

    apply.prepare_coef = prepare_coef
    apply.apply_prepared = apply_prepared
    # internals exposed for layout/perf probing (bench, blocked solver)
    apply._call = call
    apply._prep_u = _prep_u
    apply._run = _run
    apply._layout = dict(
        TX=TX, gx=gx, yc=yc, YB=YB, ZPc=ZPc, Lc=Lc, Lcp=Lcp, XP=XP
    )
    return apply

# --------------------------------------------------------------------- #
# Element quadratic form: uKu[e] = u_e^T KE u_e (objective/sensitivity
# kernel; replaces the (nelem, 24)-transient XLA gather of
# ops.hex_operator.element_quadratic_form on TPU).


def _qf_kernel(u0, u1, u2, out_ref, ub0, ub1, ub2, sems,
               *, TX: int, Lp: int, ZPc: int, keb: np.ndarray,
               row_pitch: int):
    """One (TX, Lp) element-slab of the quadratic form.  Same layout
    contract as _kernel; corner offsets are {0,1} (gather-only, no
    halo semantics needed beyond the node grid itself)."""
    j = pl.program_id(0)
    i = pl.program_id(1)
    row0 = (
        j.astype(jnp.int32) * np.int32(row_pitch)
        + i.astype(jnp.int32) * np.int32(TX)
    )
    dmas = []
    for r, (src, dst) in enumerate(((u0, ub0), (u1, ub1), (u2, ub2))):
        d = pltpu.make_async_copy(
            src.at[pl.ds(row0, TX + 8), :], dst, sems.at[np.int32(r)]
        )
        d.start()
        dmas.append(d)
    for d in dmas:
        d.wait()

    uv = [ub0[:, :], ub1[:, :], ub2[:, :]]
    # corner-aligned u views: 4 lane-rolls (y,z in {0,1}) x 2 sublane
    # offsets (x in {0,1}) per displacement component
    us = {}
    for oy in (0, 1):
        for oz in (0, 1):
            amt = np.int32((-(oy * ZPc + oz)) % Lp)
            rolled = [pltpu.roll(uv[c], amt, 1) for c in range(3)]
            for ox in (0, 1):
                us[(ox, oy, oz)] = [
                    rolled[c][ox + 1 : ox + 1 + TX, :] for c in range(3)
                ]

    acc = jnp.zeros((TX, Lp), jnp.float32)
    for a, oa in enumerate(CORNER_OFFSETS):
        ua = us[oa]
        for b, ob in enumerate(CORNER_OFFSETS):
            ubv = us[ob]
            for ii in range(3):
                k0 = float(keb[a, b, ii, 0])
                k1 = float(keb[a, b, ii, 1])
                k2 = float(keb[a, b, ii, 2])
                acc = acc + ua[ii] * (
                    k0 * ubv[0] + k1 * ubv[1] + k2 * ubv[2]
                )
    out_ref[:] = acc


def make_pallas_quadform(
    nn: Tuple[int, int, int],
    KE: np.ndarray,
    *,
    tx: int = 8,
    yc: int | None = None,
    # smaller than the operator kernel's: the 24 hoisted corner views
    # keep more VMEM live per lane (127M scoped at 20480)
    lane_budget: int = 10240,
    interpret: bool = False,
):
    """Build `quadform(u) -> uKu` (element field) for a fixed grid.

    Matches ops.hex_operator.element_quadratic_form
    (LinearElasticity.cc:405-424's u^T KE u loop) without the
    (nelem, 24) HBM transient."""
    nx, ny, nz = nn
    ex, ey, ez = nx - 1, ny - 1, nz - 1
    TX = tx
    gx = -(-nx // TX)
    keb = np.asarray(KE, np.float32).reshape(8, 3, 8, 3).transpose(
        0, 2, 1, 3
    )

    ZPc = nz + 2
    if yc is None:
        yc = max(4, lane_budget // ZPc - 2)
    yc = min(yc, ny)
    YB = -(-ny // yc)
    YPb = YB * yc + 2
    Lc = (yc + 2) * ZPc
    Lcp = -(-Lc // 128) * 128
    XP = gx * TX + 8

    kern = functools.partial(
        _qf_kernel, TX=TX, Lp=Lcp, ZPc=ZPc, keb=keb, row_pitch=XP
    )
    call = pl.pallas_call(
        kern,
        grid=(YB, gx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec(
            (TX, Lcp),
            lambda j, i: (j * gx + i, np.int32(0)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((YB * gx * TX, Lcp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TX + 8, Lcp), jnp.float32),
            pltpu.VMEM((TX + 8, Lcp), jnp.float32),
            pltpu.VMEM((TX + 8, Lcp), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )

    def _block(arr_pad):
        w = jnp.stack(
            [arr_pad[:, j * yc : j * yc + yc + 2, :] for j in range(YB)],
            axis=0,
        ).reshape(YB * XP, Lc)
        return jnp.pad(w, ((0, 0), (0, Lcp - Lc)))

    def quadform(u: jax.Array) -> jax.Array:
        ubs = []
        for c in range(3):
            uc = jnp.pad(
                u[..., c].astype(jnp.float32),
                ((1, XP - nx - 1), (1, YPb - ny - 1),
                 (1, ZPc - nz - 1)),
            )
            ubs.append(_block(uc))
        out = call(ubs[0], ubs[1], ubs[2])
        out = out.reshape(YB, gx * TX, Lcp)[:, :ex, :Lc]
        out = out.reshape(YB, ex, yc + 2, ZPc)[:, :, 1 : 1 + yc,
                                               1 : 1 + ez]
        out = jnp.transpose(out, (1, 0, 2, 3)).reshape(
            ex, YB * yc, ez
        )[:, :ey, :]
        return out.astype(u.dtype)

    return quadform

# --------------------------------------------------------------------- #
# dof=1 variant (the Helmholtz PDE-filter operator, PDEFilter.cc): same
# layout contract with a single displacement component and an (8, 8)
# element matrix.


def _kernel1(u0, e_hbm, out_ref, ub0, eb, sems,
             *, TX: int, Lp: int, ZPc: int, ke1: np.ndarray,
             row_pitch: int):
    j = pl.program_id(0)
    i = pl.program_id(1)
    row0 = (
        j.astype(jnp.int32) * np.int32(row_pitch)
        + i.astype(jnp.int32) * np.int32(TX)
    )
    du = pltpu.make_async_copy(
        u0.at[pl.ds(row0, TX + 8), :], ub0, sems.at[np.int32(0)]
    )
    du.start()
    de = pltpu.make_async_copy(
        e_hbm.at[pl.ds(row0, TX + 8), :], eb, sems.at[np.int32(1)]
    )
    de.start()
    du.wait()
    de.wait()

    uv = ub0[:, :]
    ev = eb[:, :]
    acc = jnp.zeros((TX, Lp), jnp.float32)
    for dy in (-1, 0, 1):
        for dz in (-1, 0, 1):
            ur = pltpu.roll(uv, np.int32((-(dy * ZPc + dz)) % Lp), 1)
            us = {
                dx: ur[dx + 1 : dx + 1 + TX, :] for dx in (-1, 0, 1)
            }
            for ay, by in _PAIRS_1D[dy]:
                for az, bz in _PAIRS_1D[dz]:
                    Ea = pltpu.roll(
                        ev, np.int32((ay * ZPc + az) % Lp), 1
                    )
                    for ax, bx in ((0, 0), (0, 1), (1, 0), (1, 1)):
                        a = _CIDX[(ax, ay, az)]
                        b = _CIDX[(bx, by, bz)]
                        k = float(ke1[a, b])
                        acc = acc + (
                            Ea[1 - ax : 1 - ax + TX, :]
                            * (k * us[bx - ax])
                        )
    out_ref[:] = acc


def make_pallas_helmholtz_apply(
    nn: Tuple[int, int, int],
    KF: np.ndarray,
    *,
    tx: int = 8,
    yc: int | None = None,
    lane_budget: int = 20480,
    interpret: bool = False,
):
    """Build `apply(u, E) -> K@u` for a dof=1 nodal field (the Helmholtz
    filter operator; u: (nx, ny, nz, 1), E: (ex, ey, ez), KF: (8, 8))."""
    nx, ny, nz = nn
    ex, ey, ez = nx - 1, ny - 1, nz - 1
    TX = tx
    gx = -(-nx // TX)
    ke1 = np.asarray(KF, np.float32)
    assert ke1.shape == (8, 8)

    ZPc = nz + 2
    if yc is None:
        yc = max(4, lane_budget // ZPc - 2)
    yc = min(yc, ny)
    YB = -(-ny // yc)
    YPb = YB * yc + 2
    Lc = (yc + 2) * ZPc
    Lcp = -(-Lc // 128) * 128
    XP = gx * TX + 8

    kern = functools.partial(
        _kernel1, TX=TX, Lp=Lcp, ZPc=ZPc, ke1=ke1, row_pitch=XP
    )
    call = pl.pallas_call(
        kern,
        grid=(YB, gx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(
            (TX, Lcp),
            lambda j, i: (j * gx + i, np.int32(0)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((YB * gx * TX, Lcp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TX + 8, Lcp), jnp.float32),
            pltpu.VMEM((TX + 8, Lcp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )

    def _block(arr_pad):
        w = jnp.stack(
            [arr_pad[:, j * yc : j * yc + yc + 2, :] for j in range(YB)],
            axis=0,
        ).reshape(YB * XP, Lc)
        return jnp.pad(w, ((0, 0), (0, Lcp - Lc)))

    def prepare_coef(E: jax.Array) -> jax.Array:
        ep = jnp.pad(
            E.astype(jnp.float32),
            ((1, XP - ex - 1), (1, YPb - ey - 1), (1, ZPc - ez - 1)),
        )
        return _block(ep)

    def _run(ub, eb, out_dtype):
        out = call(ub, eb)
        out = out.reshape(YB, gx * TX, Lcp)[:, :nx, :Lc]
        out = out.reshape(YB, nx, yc + 2, ZPc)[:, :, 1 : 1 + yc,
                                               1 : 1 + nz]
        out = jnp.transpose(out, (1, 0, 2, 3)).reshape(
            nx, YB * yc, nz
        )[:, :ny, :]
        return out[..., None].astype(out_dtype)

    def _prep_u(u):
        uc = jnp.pad(
            u[..., 0].astype(jnp.float32),
            ((1, XP - nx - 1), (1, YPb - ny - 1), (1, ZPc - nz - 1)),
        )
        return _block(uc)

    def apply_prepared(u: jax.Array, eb: jax.Array) -> jax.Array:
        return _run(_prep_u(u), eb, u.dtype)

    def apply(u: jax.Array, E: jax.Array) -> jax.Array:
        return _run(_prep_u(u), prepare_coef(E), u.dtype)

    apply.prepare_coef = prepare_coef
    apply.apply_prepared = apply_prepared
    return apply
