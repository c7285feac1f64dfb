"""Blocked-RESIDENT Pallas hex operator: solver vectors live in the
kernel's native layout across the whole solve.

Round-1's kernel (ops/pallas_hex.py) re-layouts u on every apply:
pad + window-stack on the way in, slice + transpose on the way out —
measured 42% of each matvec at 256^3 (13 of 31 ms; tools/
probe_prep_cost.py).  Inside the V-cycle that tax is paid ~10x per
outer FCG iteration.  This module removes it: vectors are stored as
(dof, YB*R, Lcp) arrays in the kernel layout, and every solver
operation (axpy, Jacobi scaling, Chebyshev recurrences, dots) runs
directly on that layout; conversion to nodal (nx, ny, nz, dof) happens
only at solve entry/exit and at MG level transfers.

Layout (fixed TX = 8):
  - rows: per y-chunk j, R = (gx+2)*TX rows = [8 pad | x = 0..gx*TX-1 |
    8 pad]; x lives at row j*R + 8 + x.  The 8-row pads make every DMA
    window an 8-aligned leading-dim slice (the only slice this
    backend's Mosaic accepts) and hold the x = -1 halo.
  - lanes: (y, z) flattened as (yl)*(nz+2) + (z+1) with yl = y - j*yc + 1,
    one halo plane per side, padded to a multiple of 128.
  - y is chunked only when (ny+2)*(nz+2) exceeds the VMEM lane budget
    (~80k lanes); at <= 257^3 a single chunk covers the whole grid.

Correctness of resident garbage (the key invariant): the kernel writes
every output row (edge slabs write zeros via pl.when), so blocked
arrays never contain uninitialized memory; all taps that would read
pad/halo garbage are multiplied by the coefficient E, which
prepare_coef zero-pads outside the element domain — so garbage
annihilates EXCEPT across interior y-chunk boundaries, where
`refresh()` copies the two true neighbor planes in (a ~2% data touch;
identity when YB == 1).

Reference parity: this is AssembleStiffnessMatrix + MatMult
(LinearElasticity.cc:487-549, 204) as one resident-layout kernel; the
Dirichlet treatment K <- N^T K N + (I-N) (cc:530-538) becomes the
row-mask `mask0` (the cantilever's clamped wall is the x=0 node plane,
cc:143-171), applied on the fly from row indices — no stored masks.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from topopt_in_petsc_tpu.grid import CORNER_OFFSETS

_CIDX = {off: i for i, off in enumerate(CORNER_OFFSETS)}
_PAIRS_1D = {-1: [(1, 0)], 0: [(0, 0), (1, 1)], 1: [(0, 1)]}

TX = 8
# VMEM-feasible flattened lane extent per tile: the unrolled 64-term
# body keeps tens of (TX, Lcp) values live; above ~20k lanes Mosaic's
# register allocator spills past the 100M scoped-VMEM budget (measured:
# 67200 lanes at 257^3 -> 187M spill slots -> compile reject).
LANE_CAP = 20480


def _kernel(u_hbm, e_hbm, out_ref, *scratch, Lp: int, ZPc: int,
            keb: np.ndarray, R: int, gx: int, dof: int, vdt):
    """One (dof, TX, Lp) output slab; u/E stay in HBM (ANY) in the
    resident layout and the x-window is DMA'd in (leading-dim slice,
    8-aligned offset/extent; static component index on u)."""
    ubufs = scratch[:dof]
    ebuf = scratch[dof]
    sems = scratch[dof + 1]
    j = pl.program_id(0)  # y chunk
    i = pl.program_id(1)  # x slab, 0 and gx+1 are pad rows
    edge = jnp.logical_or(i == 0, i == gx + 1)

    @pl.when(edge)
    def _():
        out_ref[:] = jnp.zeros((dof, TX, Lp), vdt)

    @pl.when(jnp.logical_not(edge))
    def _():
        # window x in [(i-1)*TX - 8, (i-1)*TX + 16): storage rows
        # row0 = j*R + (i-1)*TX, extent TX+16 — both multiples of 8.
        # all index arithmetic pinned i32 (x64 promotion -> Mosaic
        # rejects i64 memref slices)
        row0 = (
            j.astype(jnp.int32) * np.int32(R)
            + (i.astype(jnp.int32) - 1) * np.int32(TX)
        )
        dmas = []
        for c in range(dof):
            d = pltpu.make_async_copy(
                # np.int32(c): a bare Python int is traced as i64 under
                # x64 (the CLI enables it for f64 MMA parity) and
                # Mosaic rejects i64 memref-slice indices
                u_hbm.at[np.int32(c), pl.ds(row0, TX + 16)],
                ubufs[c],
                sems.at[np.int32(c)],
            )
            d.start()
            dmas.append(d)
        de = pltpu.make_async_copy(
            e_hbm.at[pl.ds(row0, TX + 16)], ebuf, sems.at[np.int32(dof)]
        )
        de.start()
        for d in dmas:
            d.wait()
        de.wait()

        # storage may be bf16 (halved HBM traffic/footprint for the
        # V-cycle); compute is always f32 in VMEM
        uv = [
            ubufs[c][:, :].astype(jnp.float32) for c in range(dof)
        ]  # (TX+16, Lp)
        ev = ebuf[:, :].astype(jnp.float32)

        acc = [jnp.zeros((TX, Lp), jnp.float32) for _ in range(dof)]
        # NOTE: hoisting the 4 distinct E lane-rolls out of the (dy, dz)
        # loop was probed and REJECTED: 4 extra live (TX+16, Lp) arrays
        # push Mosaic's register allocator into a >20-minute compile
        # (same pathology as the LANE_CAP spill ceiling above)
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                # u(.., y+dy, z+dz) at the out lanes: one lane-roll per
                # component; x taps are sublane slices (buffer row
                # s + 8 + dx holds x = (i-1)*TX + s + dx)
                ur = [
                    pltpu.roll(
                        uv[c], np.int32((-(dy * ZPc + dz)) % Lp), 1
                    )
                    for c in range(dof)
                ]
                us = {
                    dx: [
                        ur[c][dx + 8 : dx + 8 + TX, :]
                        for c in range(dof)
                    ]
                    for dx in (-1, 0, 1)
                }
                for ay, by in _PAIRS_1D[dy]:
                    for az, bz in _PAIRS_1D[dz]:
                        Ea = pltpu.roll(
                            ev, np.int32((ay * ZPc + az) % Lp), 1
                        )
                        for ax, bx in ((0, 0), (0, 1), (1, 0), (1, 1)):
                            a = _CIDX[(ax, ay, az)]
                            b = _CIDX[(bx, by, bz)]
                            # element row e = x - ax at buffer row
                            # s + 8 - ax
                            Eas = Ea[8 - ax : 8 - ax + TX, :]
                            u_s = us[bx - ax]
                            t = [Eas * u_s[jj] for jj in range(dof)]
                            for ii in range(dof):
                                s = keb[a, b, ii, 0] * t[0]
                                for jj in range(1, dof):
                                    s = s + keb[a, b, ii, jj] * t[jj]
                                acc[ii] = acc[ii] + s
        out_ref[:] = jnp.stack(acc, axis=0).astype(vdt)


class BlockedHexOperator:
    """Resident-layout matrix-free K(x) for one grid level.

    All public methods are jit-traceable.  `matvec` applies the FREE
    (Neumann) operator; `mask0` applies the cantilever Dirichlet mask;
    `dot`/`asum` reduce over OWNED positions only (on-the-fly index
    predicates, no stored masks)."""

    def __init__(self, nn: Tuple[int, int, int], KE: np.ndarray, *,
                 dof: int = 3, lane_cap: int = LANE_CAP,
                 dtype=jnp.float32, interpret: bool = False):
        nx, ny, nz = nn
        self.nn = nn
        self.dof = dof
        self.vdt = dtype  # storage dtype (f32 or bf16); compute is f32
        ex, ey, ez = nx - 1, ny - 1, nz - 1
        self.gx = gx = -(-nx // TX)
        self.R = R = (gx + 2) * TX
        self.ZPc = ZPc = nz + 2
        YB = 1
        while (-(-ny // YB) + 2) * ZPc > lane_cap:
            YB += 1
        self.YB = YB
        self.yc = yc = -(-ny // YB)
        self.Lc = Lc = (yc + 2) * ZPc
        self.Lcp = Lcp = -(-Lc // 128) * 128
        self.rows = rows = YB * R
        keb = (
            np.asarray(KE, np.float32)
            .reshape(8, dof, 8, dof)
            .transpose(0, 2, 1, 3)
        )

        kern = functools.partial(
            _kernel, Lp=Lcp, ZPc=ZPc, keb=keb, R=R, gx=gx, dof=dof,
            vdt=dtype,
        )
        self._call = pl.pallas_call(
            kern,
            grid=(YB, gx + 2),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=pl.BlockSpec(
                (dof, TX, Lcp),
                lambda j, i: (np.int32(0), j * (gx + 2) + i, np.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((dof, rows, Lcp), dtype),
            scratch_shapes=(
                [pltpu.VMEM((TX + 16, Lcp), dtype)] * (dof + 1)
                + [pltpu.SemaphoreType.DMA((dof + 1,))]
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )

    # -- layout conversion (solve entry/exit + MG transfers only) ---- #

    def _window_stack(self, arr_pad):
        """(R, YB*yc+2, ZPc) -> (YB*R, Lcp): overlapping y-windows, one
        halo plane each side (duplicated across chunks)."""
        yc, YB, ZPc = self.yc, self.YB, self.ZPc
        w = jnp.stack(
            [
                arr_pad[:, j * yc : j * yc + yc + 2, :]
                for j in range(YB)
            ],
            axis=0,
        ).reshape(self.rows, self.Lc)
        return jnp.pad(w, ((0, 0), (0, self.Lcp - self.Lc)))

    def to_blocked(self, u: jax.Array) -> jax.Array:
        """(nx, ny, nz, dof) -> (dof, rows, Lcp) f32.  Per-component to
        bound the HBM transient to ~1 component."""
        nx, ny, nz = self.nn
        comps = []
        for c in range(self.dof):
            uc = jnp.pad(
                u[..., c].astype(self.vdt),
                (
                    (8, self.R - nx - 8),
                    (1, self.YB * self.yc + 1 - ny),
                    (1, self.ZPc - nz - 1),
                ),
            )
            comps.append(self._window_stack(uc))
        return jnp.stack(comps, axis=0)

    def from_blocked(self, vb: jax.Array, dtype=None) -> jax.Array:
        """(dof, rows, Lcp) -> (nx, ny, nz, dof)."""
        nx, ny, nz = self.nn
        yc, YB, ZPc = self.yc, self.YB, self.ZPc
        v = vb.reshape(self.dof, YB, self.R, self.Lcp)[..., : self.Lc]
        v = v.reshape(self.dof, YB, self.R, yc + 2, ZPc)[
            :, :, 8 : 8 + nx, 1 : 1 + yc, 1 : 1 + nz
        ]
        v = jnp.transpose(v, (0, 2, 1, 3, 4)).reshape(
            self.dof, nx, YB * yc, nz
        )[:, :, :ny, :]
        out = jnp.transpose(v, (1, 2, 3, 0))
        return out if dtype is None else out.astype(dtype)

    def prepare_coef(self, E: jax.Array) -> jax.Array:
        """Element coefficient -> (rows, Lcp); zero outside the element
        domain (the garbage-annihilation invariant), true neighbor
        values in interior chunk-halo lanes."""
        nx, ny, nz = self.nn
        ep = jnp.pad(
            E.astype(self.vdt),
            (
                (8, self.R - (nx - 1) - 8),
                (1, self.YB * self.yc + 1 - (ny - 1)),
                (1, self.ZPc - (nz - 1) - 1),
            ),
        )
        return self._window_stack(ep)

    # -- resident-layout operations ----------------------------------- #

    def matvec(self, vb: jax.Array, eb: jax.Array) -> jax.Array:
        """Free-BC K @ v, resident layout in and out.  Input halo lanes
        must be valid across interior chunk boundaries (`refresh`)."""
        return self._call(vb, eb)

    def refresh(self, vb: jax.Array) -> jax.Array:
        """Re-fill interior y-chunk halo lanes from neighbor chunks'
        owned planes (identity when the grid is a single chunk)."""
        if self.YB == 1:
            return vb
        yc, ZPc = self.yc, self.ZPc
        v = vb.reshape(self.dof, self.YB, self.R, self.Lcp)
        lo_src = v[:, :-1, :, yc * ZPc : (yc + 1) * ZPc]
        hi_src = v[:, 1:, :, ZPc : 2 * ZPc]
        v = v.at[:, 1:, :, 0:ZPc].set(lo_src)
        v = v.at[:, :-1, :, (yc + 1) * ZPc : (yc + 2) * ZPc].set(hi_src)
        return v.reshape(self.dof, self.rows, self.Lcp)

    def mask0(self, vb: jax.Array) -> jax.Array:
        """Zero the x == 0 node plane (cantilever clamped wall,
        LinearElasticity.cc:143-156) — rows r with r % R == 8."""
        r = jax.lax.broadcasted_iota(jnp.int32, (self.rows, 1), 0)
        keep = (r % np.int32(self.R) != 8).astype(vb.dtype)
        return vb * keep

    def xyz_iota(self):
        """(x, y, z, valid) int/bool (rows, Lcp) index fields of the
        blocked layout: the LOCAL nodal coordinates each position
        holds, and the canonical-ownership predicate (pads, halos,
        y-overlap excluded).  Everything downstream (ownership
        weights, RHS predicates, shard masks) is built from these —
        iota-born, so XLA fuses them into consuming ops with no stored
        fields (the 512^3 memory lever)."""
        nx, ny, nz = self.nn
        r = jax.lax.broadcasted_iota(
            jnp.int32, (self.rows, self.Lcp), 0
        )
        l = jax.lax.broadcasted_iota(
            jnp.int32, (self.rows, self.Lcp), 1
        )
        rl = r % np.int32(self.R)
        x = rl - 8
        j = r // np.int32(self.R)
        yl = l // np.int32(self.ZPc)
        zl = l % np.int32(self.ZPc)
        y = j * np.int32(self.yc) + yl - 1
        z = zl - 1
        valid = (
            (x >= 0) & (x < nx)
            & (yl >= 1) & (yl <= self.yc) & (y < ny)
            & (zl >= 1) & (zl <= nz)
        )
        return x, y, z, valid

    def owned(self, dtype=jnp.float32) -> jax.Array:
        """(rows, Lcp) 0/1 ownership weights: each global (x, y, z)
        counted exactly once (pads, halos, y-overlap excluded).  Built
        from iotas — XLA fuses it into consuming reductions.  (Kept as
        a standalone expression — not via xyz_iota — so the traced form
        of every cached single-chip program is unchanged.)"""
        nx, ny, nz = self.nn
        r = jax.lax.broadcasted_iota(
            jnp.int32, (self.rows, self.Lcp), 0
        )
        l = jax.lax.broadcasted_iota(
            jnp.int32, (self.rows, self.Lcp), 1
        )
        rl = r % np.int32(self.R)
        x = rl - 8
        j = r // np.int32(self.R)
        yl = l // np.int32(self.ZPc)
        zl = l % np.int32(self.ZPc)
        y = j * np.int32(self.yc) + yl - 1
        ok = (
            (x >= 0) & (x < nx)
            & (yl >= 1) & (yl <= self.yc) & (y < ny)
            & (zl >= 1) & (zl <= nz)
        )
        return ok.astype(dtype)

    def cantilever_rhs(self, load: float = -0.001,
                       dtype=jnp.float32, *,
                       edge_gate=None, y_offset=0,
                       ny_global: int | None = None) -> jax.Array:
        """Blocked RHS of the reference line load: F_z = load along the
        edge (x = nx-1, z = 0), halved at the two y corners
        (LinearElasticity.cc:158-171) — built from index predicates, so
        no (nx,ny,nz,3) nodal transient exists (the 512^3 lever).
        Duplicated y-chunk halo lanes get the true values (consistent
        under linear combinations).

        SPMD form (BlockedSpmdMG.local_rhs): `edge_gate` (traced bool)
        gates the whole load to shards on the (x=last, z=0) edge,
        `y_offset`/`ny_global` map local y to the GLOBAL y index for
        the corner halving."""
        nx, ny, nz = self.nn
        r = jax.lax.broadcasted_iota(
            jnp.int32, (self.rows, self.Lcp), 0
        )
        l = jax.lax.broadcasted_iota(
            jnp.int32, (self.rows, self.Lcp), 1
        )
        x = r % np.int32(self.R) - 8
        j = r // np.int32(self.R)
        yl = l // np.int32(self.ZPc)
        zl = l % np.int32(self.ZPc)
        y = j * np.int32(self.yc) + yl - 1
        on_edge = (
            (x == nx - 1) & (zl == 1)
            & (y >= 0) & (y < ny) & (l < self.Lc)
        )
        if edge_gate is not None:
            on_edge = on_edge & edge_gate
        # keep the single-chip trace byte-identical to the pre-SPMD
        # form (compile-cache stability for the big cached programs)
        if isinstance(y_offset, int) and y_offset == 0:
            gy = y
        elif isinstance(y_offset, int):
            gy = y + np.int32(y_offset)
        else:
            gy = y + y_offset.astype(jnp.int32)
        NY = np.int32(ny if ny_global is None else ny_global)
        w = jnp.where(
            (gy == 0) | (gy == NY - 1), 0.5, 1.0
        ).astype(dtype)
        plane = jnp.where(on_edge, jnp.asarray(load, dtype) * w, 0.0)
        zero = jnp.zeros_like(plane)
        return jnp.stack([zero, zero, plane], axis=0)

    # -- boundary-plane access (SPMD halo exchange in blocked layout) -- #
    #
    # A width-1 halo exchange between neighbor shards needs the global
    # boundary planes of the LOCAL block.  These helpers slice/update
    # them directly in the blocked layout (strided row/lane slices — no
    # full-array relayout, the whole point of the resident design).
    # Plane shapes are canonical per axis, so ppermute between shards
    # with identical local layouts lines up 1:1 (including halo/pad
    # lanes, whose junk adds harmlessly into junk):
    #   axis 0 (x = k): (dof, YB, Lcp)     rows j*R + 8 + k
    #   axis 1 (y = k): (dof, R, ZPc)      chunk k//yc, lanes yl*ZPc..
    #   axis 2 (z = k): (dof, rows, yc+2)  lanes yl*ZPc + k + 1
    # After add_plane, duplicated y-chunk halo copies of the plane are
    # stale — the next matvec's refresh() restores them (same contract
    # as every other blocked arithmetic op).

    def get_plane(self, vb: jax.Array, axis: int, k: int) -> jax.Array:
        if axis == 0:
            r0 = 8 + k
            return jax.lax.slice(
                vb,
                (0, r0, 0),
                (self.dof, r0 + (self.YB - 1) * self.R + 1, self.Lcp),
                (1, self.R, 1),
            )
        if axis == 1:
            j = k // self.yc
            yl = k - j * self.yc + 1
            return vb[
                :,
                j * self.R : (j + 1) * self.R,
                yl * self.ZPc : (yl + 1) * self.ZPc,
            ]
        l0 = k + 1
        return jax.lax.slice(
            vb,
            (0, 0, l0),
            (self.dof, self.rows, l0 + (self.yc + 1) * self.ZPc + 1),
            (1, 1, self.ZPc),
        )

    def add_plane(
        self, vb: jax.Array, axis: int, k: int, plane: jax.Array
    ) -> jax.Array:
        if axis == 0:
            r0 = 8 + k
            return vb.at[:, r0 :: self.R, :].add(plane)
        if axis == 1:
            j = k // self.yc
            yl = k - j * self.yc + 1
            return vb.at[
                :,
                j * self.R : (j + 1) * self.R,
                yl * self.ZPc : (yl + 1) * self.ZPc,
            ].add(plane)
        l0 = k + 1
        stop = l0 + (self.yc + 1) * self.ZPc + 1
        return vb.at[:, :, l0 : stop : self.ZPc].add(plane)

    def dot(self, a: jax.Array, b: jax.Array,
            precise: bool = True, w_extra: jax.Array | None = None
            ) -> jax.Array:
        """Ownership-weighted inner product, chunked two-stage f64
        accumulation (same rationale as solvers/cg._dot).

        `w_extra`: additional (rows, Lcp) weights — the SPMD engine
        passes its shared-plane ownership weights so duplicated planes
        across shards count once under the outer psum."""
        w = self.owned(jnp.float32)
        if w_extra is not None:
            w = w * w_extra.astype(w.dtype)
        parts = jnp.einsum(
            a, [0, 1, 2], b, [0, 1, 2], w.astype(a.dtype), [1, 2], [1],
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        if precise and a.dtype != jnp.float64:
            return jnp.sum(parts, dtype=jnp.float64)
        return jnp.sum(parts)

    def asum(self, a: jax.Array, precise: bool = True) -> jax.Array:
        """Ownership-weighted sum."""
        w = self.owned(a.dtype)
        parts = jnp.einsum(
            a, [0, 1, 2], w, [1, 2], [1],
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        if precise and a.dtype != jnp.float64:
            return jnp.sum(parts, dtype=jnp.float64)
        return jnp.sum(parts)
