"""Matrix-free structured-grid hex FEM operator.

TPU-native replacement for the reference's assembled sparse stiffness matrix
and its SpMV: instead of MatSetValuesLocal element assembly + MatMult
(LinearElasticity.cc:487-549, 204), we express `K(x) @ u` directly as

    1. *gather*  — 8 static shifted slices collect each element's corner
       dofs into an ``(ex, ey, ez, 8*dof)`` tensor (no indexing arrays; the
       structured grid makes connectivity implicit, so the reference's
       DMDAGetElements_3D helper has no equivalent here),
    2. *matmul*  — one large ``(nelem, 8*dof) x (8*dof, 8*dof)`` contraction
       against the constant element matrix with the per-element SIMP scale
       fused in (runs on the MXU),
    3. *scatter* — 8 static shifted `.at[...].add` updates accumulate corner
       forces back to nodes (pure adds of disjoint slabs per corner; no
       atomics, TPU-safe).

Halo exchange: under `jit` with sharded inputs, XLA GSPMD inserts the
neighbor collectives these shifted slices imply — the explicit
DMGlobalToLocal ghost exchange of the reference (LinearElasticity.cc:249).

All functions are shape-polymorphic in dof (3 for elasticity, 1 for the
Helmholtz PDE filter) and jit/grad-compatible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from topopt_in_petsc_tpu.grid import CORNER_OFFSETS


def _corner_slice(u: jax.Array, corner: int) -> jax.Array:
    """Element-grid view of nodal field `u` at a given hex corner."""
    ox, oy, oz = CORNER_OFFSETS[corner]
    ex, ey, ez = u.shape[0] - 1, u.shape[1] - 1, u.shape[2] - 1
    return u[ox : ox + ex, oy : oy + ey, oz : oz + ez]


def gather_element_dofs(u: jax.Array) -> jax.Array:
    """(nx, ny, nz, dof) nodal field -> (ex, ey, ez, 8*dof) element dofs.

    Concatenation order matches the reference edof ordering
    (LinearElasticity.cc:263-267): corner-major, dof-minor.
    """
    return jnp.concatenate(
        [_corner_slice(u, c) for c in range(8)], axis=-1
    )


def scatter_element_dofs(
    fe: jax.Array, nn: tuple[int, int, int]
) -> jax.Array:
    """(ex, ey, ez, 8*dof) element values -> (nx, ny, nz, dof) nodal sum.

    Adjoint of `gather_element_dofs` (the FEM scatter-add).
    """
    ex, ey, ez, k = fe.shape
    dof = k // 8
    out = jnp.zeros((nn[0], nn[1], nn[2], dof), dtype=fe.dtype)
    for c, (ox, oy, oz) in enumerate(CORNER_OFFSETS):
        out = out.at[ox : ox + ex, oy : oy + ey, oz : oz + ez].add(
            fe[..., c * dof : (c + 1) * dof]
        )
    return out


def apply_hex_operator(
    u: jax.Array,
    scale: jax.Array,
    KE: jax.Array,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Matrix-free `K @ u` with per-element scaling.

        K = sum_e  scale_e * (S_e^T KE S_e)

    u:     (nx, ny, nz, dof) nodal field
    scale: (ex, ey, ez) per-element coefficient (SIMP-interpolated E, or 1)
    KE:    (8*dof, 8*dof) constant element matrix

    Equivalent to AssembleStiffnessMatrix + MatMult of the reference
    (LinearElasticity.cc:487-549) fused into one pass.
    """
    ue = gather_element_dofs(u)
    # Scale before the contraction: scalar per element commutes with KE.
    # precision HIGHEST: TPU matmuls default to bf16 inputs, which is fine
    # for preconditioner-side applications but not for the outer Krylov
    # residual; callers wanting the fast path pass precision explicitly.
    fe = jnp.einsum(
        "...i,ij->...j",
        ue * scale[..., None],
        KE,
        preferred_element_type=u.dtype,
        precision=precision,
    )
    nn = (u.shape[0], u.shape[1], u.shape[2])
    return scatter_element_dofs(fe, nn)


def hex_operator_diagonal(
    scale: jax.Array, KE: jax.Array, nn: tuple[int, int, int]
) -> jax.Array:
    """diag(K) as an (nx, ny, nz, dof) field (for Jacobi/Chebyshev).

    Node n receives, from each adjacent element having n at local corner c,
    the diagonal block entries KE[c*dof+d, c*dof+d] times that element's
    scale.
    """
    dof = KE.shape[0] // 8
    ke_diag = jnp.diagonal(KE).reshape(8, dof)  # (corner, dof)
    ex, ey, ez = scale.shape
    out = jnp.zeros((nn[0], nn[1], nn[2], dof), dtype=scale.dtype)
    for c, (ox, oy, oz) in enumerate(CORNER_OFFSETS):
        out = out.at[ox : ox + ex, oy : oy + ey, oz : oz + ez].add(
            scale[..., None] * ke_diag[c][None, None, None, :]
        )
    return out


def hex_operator_absrowsum(
    scale: jax.Array, KE: jax.Array, nn: tuple[int, int, int]
) -> jax.Array:
    """sum_j |K_ij| as an (nx, ny, nz, dof) field — the Gershgorin bound
    input (solvers/chebyshev.gershgorin_lambda_max).

    Equivalent to `apply_hex_operator(ones, scale, |KE|)` but as an 8-tap
    stencil on the element scale (row sums of |KE| are constants), with
    no (nelem, 8*dof) gather transient: at 512^3 the gather form cannot
    even compile, and per-solve setup drops from ~52 ms to ~5 ms at
    256^3.  Requires scale >= 0 (SIMP scales are)."""
    dof = KE.shape[0] // 8
    ke_rows = jnp.sum(jnp.abs(KE), axis=1).reshape(8, dof)  # (corner, dof)
    ex, ey, ez = scale.shape
    out = jnp.zeros((nn[0], nn[1], nn[2], dof), dtype=scale.dtype)
    for c, (ox, oy, oz) in enumerate(CORNER_OFFSETS):
        out = out.at[ox : ox + ex, oy : oy + ey, oz : oz + ez].add(
            scale[..., None] * ke_rows[c][None, None, None, :]
        )
    return out


def element_quadratic_form(u: jax.Array, KE: jax.Array) -> jax.Array:
    """Per-element quadratic form  q_e = u_e^T KE u_e  -> (ex, ey, ez).

    The uKu loop of the objective/sensitivity computation
    (LinearElasticity.cc:405-424), vectorized.
    """
    ue = gather_element_dofs(u)
    w = jnp.einsum(
        "...i,ij->...j",
        ue,
        KE,
        preferred_element_type=u.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.sum(w * ue, axis=-1)


def octant_split(E: jax.Array) -> jax.Array:
    """(2ex, 2ey, 2ez) child-element field -> (8, ex, ey, ez) octant views
    (strided subsampling in CORNER_OFFSETS order)."""
    return jnp.stack(
        [E[ox::2, oy::2, oz::2] for (ox, oy, oz) in CORNER_OFFSETS]
    )


def apply_hex_operator_octant(
    u: jax.Array,
    octants: jax.Array,
    KEps: jax.Array,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Matrix-free apply of a Galerkin-coarsened operator:

        K = sum_C S_C^T ( sum_p octants[p, C] * KEps[p] ) S_C

    u:       (nx, ny, nz, dof) coarse nodal field
    octants: (8, ex, ey, ez) per-element octant weights (child densities
             or octant-averaged descendants)
    KEps:    (8, 8*dof, 8*dof) constant octant matrices
             (galerkin_octant_matrices)
    """
    ue = gather_element_dofs(u)
    z = jnp.einsum(
        "...i,pij->p...j",
        ue,
        KEps,
        preferred_element_type=u.dtype,
        precision=precision,
    )
    fe = jnp.einsum("p...,p...j->...j", octants, z)
    nn = (u.shape[0], u.shape[1], u.shape[2])
    return scatter_element_dofs(fe, nn)


def hex_operator_diagonal_octant(
    octants: jax.Array, KEps: jax.Array, nn: tuple[int, int, int]
) -> jax.Array:
    """diag(K) for the octant-Galerkin operator."""
    dof = KEps.shape[1] // 8
    ke_diag = jnp.stack(
        [jnp.diagonal(KEps[p]).reshape(8, dof) for p in range(8)]
    )  # (p, corner, dof)
    ex, ey, ez = octants.shape[1:]
    out = jnp.zeros((nn[0], nn[1], nn[2], dof), dtype=octants.dtype)
    for c, (ox, oy, oz) in enumerate(CORNER_OFFSETS):
        contrib = jnp.einsum(
            "p...,pd->...d", octants, ke_diag[:, c, :]
        )
        out = out.at[ox : ox + ex, oy : oy + ey, oz : oz + ez].add(contrib)
    return out


def _shift_nodal(u: jax.Array, d: tuple[int, int, int]) -> jax.Array:
    """v[n] = u[n + d] with zero padding, d in {-1,0,1}^3."""
    pads = []
    slices = []
    for a in range(3):
        if d[a] == 1:
            slices.append(slice(1, None))
            pads.append((0, 1))
        elif d[a] == -1:
            slices.append(slice(0, -1))
            pads.append((1, 0))
        else:
            slices.append(slice(None))
            pads.append((0, 0))
    v = u[tuple(slices)]
    return jnp.pad(v, pads + [(0, 0)] * (u.ndim - 3))


def _corner_pad_elem(E: jax.Array, corner: int) -> jax.Array:
    """Element field placed on the node grid at a hex corner:
    Ea[n] = E[n - offset_a] (zero where no such element)."""
    off = CORNER_OFFSETS[corner]
    pads = [(off[a], 1 - off[a]) for a in range(3)]
    return jnp.pad(E, pads)


def apply_hex_operator_stencil(
    u: jax.Array,
    scale: jax.Array,
    KE: jax.Array,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Node-centric 27-point block-stencil form of `apply_hex_operator`.

    out[n] = sum_d W_d(n) @ u[n+d], with the 3x3 (or 1x1) blocks
    W_d(n) = sum_{(a,b): off_b - off_a = d} scale(n - off_a) KE[a-block, b-block]
    built on the fly from the element scale — a gather-only formulation
    (no scatter, no (nelem, 24) intermediates), which is the TPU-friendly
    shape: 27 shifted elementwise fused multiply-adds over full nodal
    arrays (SURVEY §7.1 'node-centric 27-point block stencil').

    Equivalent to `apply_hex_operator` to rounding.
    """
    dof = u.shape[-1]
    KEb = KE.reshape(8, dof, 8, dof).transpose(0, 2, 1, 3)  # (a,b,i,j)
    Ea = [_corner_pad_elem(scale, a) for a in range(8)]

    # group (a, b) pairs by node offset d = off_b - off_a
    groups: dict = {}
    for a, oa in enumerate(CORNER_OFFSETS):
        for b, ob in enumerate(CORNER_OFFSETS):
            d = (ob[0] - oa[0], ob[1] - oa[1], ob[2] - oa[2])
            groups.setdefault(d, []).append((a, b))

    out = jnp.zeros_like(u)
    for d, pairs in groups.items():
        us = _shift_nodal(u, d)  # (nx, ny, nz, dof)
        # W_d: (nx, ny, nz, dof, dof), built from <=8 scale pads
        W = None
        for a, b in pairs:
            term = Ea[a][..., None, None] * KEb[a, b]
            W = term if W is None else W + term
        out = out + jnp.einsum(
            "...ij,...j->...i",
            W,
            us,
            preferred_element_type=u.dtype,
            precision=precision,
        )
    return out


def apply_hex_operator_dofmajor(
    u: jax.Array, scale: jax.Array, KE: jax.Array
) -> jax.Array:
    """64-term corner-pair form in dof-major layout: pure
    scalar-coefficient fused multiply-adds over (nx, ny, nz) slabs.

    u: (nx, ny, nz, dof) — transposed to (dof, nx, ny, nz) internally so
    the minor dimension is the z-axis (good 128-lane utilization; the
    dof-minor layout wastes 125/128 lanes and the (dof,dof) einsum form
    trips a backend bug).  Same math as `apply_hex_operator`.
    """
    dof = u.shape[-1]
    KEb = np.asarray(KE).reshape(8, dof, 8, dof).transpose(0, 2, 1, 3)
    u3 = jnp.moveaxis(u, -1, 0)  # (dof, nx, ny, nz)
    Ea = [_corner_pad_elem(scale, a) for a in range(8)]

    outs = [None] * dof
    for a, oa in enumerate(CORNER_OFFSETS):
        for b, ob in enumerate(CORNER_OFFSETS):
            d = (ob[0] - oa[0], ob[1] - oa[1], ob[2] - oa[2])
            us = [
                _shift_nodal(u3[j], d) for j in range(dof)
            ]
            for i in range(dof):
                lin = None
                for j in range(dof):
                    kij = float(KEb[a, b, i, j])
                    if kij == 0.0:
                        continue
                    term = kij * us[j]
                    lin = term if lin is None else lin + term
                if lin is None:
                    continue
                contrib = Ea[a] * lin
                outs[i] = contrib if outs[i] is None else outs[i] + contrib
    return jnp.moveaxis(jnp.stack(outs), 0, -1)


def hex_operator_diagonal_stencil(
    scale: jax.Array, KE: jax.Array, nn: tuple[int, int, int]
) -> jax.Array:
    """diag(K) via corner pads (same math as hex_operator_diagonal)."""
    dof = KE.shape[0] // 8
    ke_diag = jnp.diagonal(KE).reshape(8, dof)
    out = None
    for a in range(8):
        term = _corner_pad_elem(scale, a)[..., None] * ke_diag[a]
        out = term if out is None else out + term
    return out


def assemble_dense(
    scale: np.ndarray, KE: np.ndarray, nn: tuple[int, int, int], dof: int
) -> np.ndarray:
    """Dense assembled K for cross-checking on tiny grids (test-only).

    Independent element-loop assembly in numpy, used by the test-suite to
    validate the matrix-free path against explicit assembly (the SURVEY §4
    strategy; the reference itself has no tests).
    """
    nx, ny, nz = nn
    ndof = nx * ny * nz * dof
    K = np.zeros((ndof, ndof))

    def node_id(i, j, k):
        return (i * ny + j) * nz + k

    ex, ey, ez = nx - 1, ny - 1, nz - 1
    for i in range(ex):
        for j in range(ey):
            for k in range(ez):
                edof = []
                for (ox, oy, oz) in CORNER_OFFSETS:
                    n = node_id(i + ox, j + oy, k + oz)
                    edof.extend(range(dof * n, dof * n + dof))
                edof = np.array(edof)
                K[np.ix_(edof, edof)] += scale[i, j, k] * KE
    return K
