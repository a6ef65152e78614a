"""TSDF volume fusion + surface-nets meshing (replaces open3d VoxelBlockGrid).

The reference fuses RGB-D frames into a TSDF with open3d
(evaluation/evaluation_utils.py:160-227; voxel 1/64 m, trunc 5 * voxel) to
build GT and predicted meshes. open3d is unavailable here, so:
  * fusion is a dense jnp program (runs on the TPU: one scan over frames,
    projecting the whole voxel grid per frame — bandwidth-bound and fast),
  * meshing uses the Surface Nets algorithm (table-free dual method): one
    vertex per sign-change cell at the centroid of edge zero-crossings, two
    triangles per sign-change lattice edge. Output is a standard triangle
    mesh (documented delta: reference uses marching cubes; both extract the
    same zero isosurface to within a voxel).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

VOXEL_SIZE = 1.0 / 64.0
TRUNC_MULT = 5.0


def fuse_tsdf(
    frames_depth,
    frames_color,
    intrinsics,
    cam2world,
    voxel_size: float = VOXEL_SIZE,
    trunc: Optional[float] = None,
    bounds: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    max_resolution: int = 448,
    depth_max: float = 5.0,
    use_native: bool = True,
):
    """Fuse RGB-D frames into a TSDF grid.

    Args:
      frames_depth: [F, H, W] metric depth (0 = invalid).
      frames_color: [F, H, W, 3] float in [0, 1] (or None).
      intrinsics: [4] or [F, 4] fx fy cx cy.
      cam2world: [F, 4, 4] OpenCV-convention camera-to-world.

    Returns dict with tsdf [X, Y, Z], weight, color, origin [3], voxel_size.
    """
    import jax
    import jax.numpy as jnp

    frames_depth = np.asarray(frames_depth, np.float32)
    F, H, W = frames_depth.shape
    intrinsics = np.broadcast_to(np.asarray(intrinsics, np.float32),
                                 (F, 4)).copy()
    cam2world = np.asarray(cam2world, np.float32)
    trunc = trunc if trunc is not None else TRUNC_MULT * voxel_size

    if bounds is None:
        # estimate bounds from backprojected depth corners (coarse subsample)
        pts = []
        for f in range(0, F, max(1, F // 20)):
            d = frames_depth[f][::8, ::8]
            ys, xs = np.mgrid[0:H:8, 0:W:8].astype(np.float32)
            fx, fy, cx, cy = intrinsics[f]
            valid = (d > 0) & (d < depth_max)
            if valid.sum() == 0:
                continue
            x = (xs - cx) / fx * d
            y = (ys - cy) / fy * d
            p = np.stack([x[valid], y[valid], d[valid]], -1)
            pw = p @ cam2world[f][:3, :3].T + cam2world[f][:3, 3]
            pts.append(pw)
        pts = np.concatenate(pts, 0)
        lo = np.percentile(pts, 1, axis=0) - 4 * voxel_size
        hi = np.percentile(pts, 99, axis=0) + 4 * voxel_size
    else:
        lo, hi = np.asarray(bounds[0], np.float32), np.asarray(bounds[1], np.float32)

    dims = np.ceil((hi - lo) / voxel_size).astype(int) + 1
    scale_up = max(dims.max() / max_resolution, 1.0)
    voxel_size = float(voxel_size * scale_up)
    trunc = max(trunc, TRUNC_MULT * voxel_size / 5.0 * scale_up)
    dims = (np.ceil((hi - lo) / voxel_size).astype(int) + 1).clip(1, None)
    X, Y, Z = (int(v) for v in dims)

    origin = lo.astype(np.float32)
    gx, gy, gz = jnp.meshgrid(
        jnp.arange(X), jnp.arange(Y), jnp.arange(Z), indexing="ij"
    )
    world = (
        jnp.stack([gx, gy, gz], -1).astype(jnp.float32) * voxel_size
        + jnp.asarray(origin)
    ).reshape(-1, 3)

    has_color = frames_color is not None
    if has_color:
        frames_color = np.asarray(frames_color, np.float32)

    def fuse_one(carry, inputs):
        tsdf, weight, color = carry
        depth_img, color_img, intr, c2w = inputs
        w2c_R = c2w[:3, :3].T
        w2c_t = -w2c_R @ c2w[:3, 3]
        pc = world @ w2c_R.T + w2c_t
        z = pc[:, 2]
        fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
        u = fx * pc[:, 0] / jnp.clip(z, 1e-6) + cx
        v = fy * pc[:, 1] / jnp.clip(z, 1e-6) + cy
        ui = jnp.round(u).astype(jnp.int32)
        vi = jnp.round(v).astype(jnp.int32)
        inb = (z > 0.05) & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
        ui = jnp.clip(ui, 0, W - 1)
        vi = jnp.clip(vi, 0, H - 1)
        d = depth_img[vi, ui]
        valid = inb & (d > 0) & (d < depth_max)
        sdf = d - z
        valid &= sdf > -trunc
        tsdf_new = jnp.clip(sdf / trunc, -1.0, 1.0)
        w_new = valid.astype(jnp.float32)
        w_tot = weight + w_new
        tsdf = jnp.where(
            w_tot > 0, (tsdf * weight + tsdf_new * w_new) / jnp.clip(w_tot, 1e-6),
            tsdf,
        )
        if color is not None:
            c = color_img[vi, ui]
            color = jnp.where(
                (w_tot > 0)[:, None],
                (color * weight[:, None] + c * w_new[:, None])
                / jnp.clip(w_tot[:, None], 1e-6),
                color,
            )
        return (tsdf, w_tot, color), None

    # native C++ fusion when the library is built (same math, multithreaded)
    try:
        if not use_native:
            raise ImportError
        from nerf_vo_tpu import native

        if native.available():
            tsdf_n, weight_n, color_n = native.tsdf_fuse(
                list(frames_depth),
                list(frames_color) if has_color else None,
                intrinsics, list(cam2world), origin, (X, Y, Z),
                voxel_size, trunc, depth_max,
            )
            return {
                "tsdf": tsdf_n, "weight": weight_n, "color": color_n,
                "origin": origin, "voxel_size": voxel_size,
            }
    except Exception:
        pass

    n_vox = X * Y * Z
    init = (
        jnp.ones((n_vox,)),
        jnp.zeros((n_vox,)),
        jnp.zeros((n_vox, 3)) if has_color else None,
    )
    import jax

    inputs = (
        jnp.asarray(frames_depth),
        jnp.asarray(frames_color) if has_color else jnp.zeros((F, 1, 1, 3)),
        jnp.asarray(intrinsics),
        jnp.asarray(cam2world),
    )
    (tsdf, weight, color), _ = jax.lax.scan(fuse_one, init, inputs)

    return {
        "tsdf": np.asarray(tsdf).reshape(X, Y, Z),
        "weight": np.asarray(weight).reshape(X, Y, Z),
        "color": (np.asarray(color).reshape(X, Y, Z, 3) if has_color else None),
        "origin": origin,
        "voxel_size": voxel_size,
    }


def surface_nets(tsdf: np.ndarray, weight: Optional[np.ndarray],
                 origin: np.ndarray, voxel_size: float,
                 color: Optional[np.ndarray] = None):
    """Extract a triangle mesh from a TSDF (Surface Nets, vectorized numpy).

    Returns (vertices [N, 3], faces [M, 3], vertex_colors or None).
    """
    X, Y, Z = tsdf.shape
    valid = weight > 0 if weight is not None else np.ones_like(tsdf, bool)

    # cell = lattice cube between 8 voxels; cell (i,j,k) spans voxels
    # [i..i+1, j..j+1, k..k+1]
    def corners(a):
        return np.stack(
            [a[:-1, :-1, :-1], a[1:, :-1, :-1], a[:-1, 1:, :-1],
             a[1:, 1:, :-1], a[:-1, :-1, 1:], a[1:, :-1, 1:],
             a[:-1, 1:, 1:], a[1:, 1:, 1:]], -1,
        )

    cv = corners(tsdf)  # [X-1, Y-1, Z-1, 8]
    cw = corners(valid.astype(np.uint8)).all(-1)
    sign = cv < 0
    mixed = cw & (sign.any(-1)) & (~sign.all(-1))
    if not mixed.any():
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32), None

    cell_idx = np.full(mixed.shape, -1, np.int64)
    ci, cj, ck = np.nonzero(mixed)
    cell_idx[ci, cj, ck] = np.arange(len(ci))

    # vertex position: approximate centroid of surface inside the cell via
    # SDF-weighted corner average (cheap, within-voxel accurate)
    corner_off = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
         [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]], np.float32,
    )
    vals = cv[ci, cj, ck]  # [N, 8]
    w = 1.0 / (np.abs(vals) + 1e-4)
    w = w / w.sum(-1, keepdims=True)
    base = np.stack([ci, cj, ck], -1).astype(np.float32)
    verts = (base + (w[..., None] * corner_off[None]).sum(1) + 0.5
             ) * voxel_size + origin

    vcolors = None
    if color is not None:
        vcolors = color[ci, cj, ck]

    # faces: for each lattice edge (between voxel v and v+axis) with a sign
    # change, connect the 4 cells sharing that edge
    faces = []
    s = tsdf < 0
    for axis in range(3):
        sl0 = [slice(1, -1)] * 3
        sl1 = [slice(1, -1)] * 3
        sl1[axis] = slice(2, None) if False else slice(1, -1)
        # voxels v=(i,j,k) and v2=v+e_axis, interior only
        a = [slice(1, -1)] * 3
        b = [slice(1, -1)] * 3
        b[axis] = slice(2, None)
        a[axis] = slice(1, -1)
        s0 = s[tuple(a)]
        s1 = s[tuple(b)]
        crossing = s0 != s1
        flip = s0  # orientation by sign of first voxel
        ii, jj, kk = np.nonzero(crossing)
        # offset into full-lattice voxel coords
        vi = ii + 1
        vj = jj + 1
        vk = kk + 1
        ax1, ax2 = [x for x in range(3) if x != axis]

        def cell_at(di, dj, dk):
            return cell_idx[vi + di - 1, vj + dj - 1, vk + dk - 1]

        offs = np.zeros((4, 3), np.int64)
        offs[1][ax1] = -1
        offs[2][ax1] = -1
        offs[2][ax2] = -1
        offs[3][ax2] = -1
        quad = np.stack([cell_at(*o) for o in offs], -1)  # [Q, 4]
        ok = (quad >= 0).all(-1)
        quad = quad[ok]
        fl = np.asarray(flip[ii, jj, kk])[ok]
        q = np.where(fl[:, None], quad[:, ::-1], quad)
        faces.append(np.stack([q[:, 0], q[:, 1], q[:, 2]], -1))
        faces.append(np.stack([q[:, 0], q[:, 2], q[:, 3]], -1))

    faces = np.concatenate(faces, 0).astype(np.int32)
    return verts.astype(np.float32), faces, vcolors


# ---------------------------------------------------------------------------
# marching tetrahedra
# ---------------------------------------------------------------------------

# tet vertex indices into the cube's 8 corners (x + 2y + 4z bit order),
# 6 tets sharing the main diagonal c0-c7
_TETS = np.array(
    [[0, 1, 3, 7], [0, 3, 2, 7], [0, 2, 6, 7],
     [0, 6, 4, 7], [0, 4, 5, 7], [0, 5, 1, 7]], np.int64,
)
# tet edges e0..e5 as (a, b) vertex pairs
_EDGE_A = np.array([0, 0, 0, 1, 1, 2], np.int64)
_EDGE_B = np.array([1, 2, 3, 2, 3, 3], np.int64)
# case (bitmask of "corner inside") -> up to 2 triangles of edge ids, -1 pad.
_TRI_TABLE = -np.ones((16, 2, 3), np.int64)
_TRI_TABLE[1, 0] = (0, 1, 2)
_TRI_TABLE[2, 0] = (0, 3, 4)
_TRI_TABLE[4, 0] = (1, 5, 3)
_TRI_TABLE[8, 0] = (2, 4, 5)
_TRI_TABLE[3] = ((1, 3, 4), (1, 4, 2))
_TRI_TABLE[5] = ((0, 3, 5), (0, 5, 2))
_TRI_TABLE[9] = ((0, 4, 5), (0, 5, 1))
_TRI_TABLE[6] = ((0, 1, 5), (0, 5, 4))
_TRI_TABLE[10] = ((0, 2, 5), (0, 5, 3))
_TRI_TABLE[12] = ((1, 2, 4), (1, 4, 3))
_TRI_TABLE[14, 0] = (0, 2, 1)
_TRI_TABLE[13, 0] = (0, 4, 3)
_TRI_TABLE[11, 0] = (1, 3, 5)
_TRI_TABLE[7, 0] = (2, 5, 4)

_CORNER_OFF = np.array(
    [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
     [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]], np.float32,
)


def marching_tetrahedra(tsdf: np.ndarray, weight: Optional[np.ndarray],
                        origin: np.ndarray, voxel_size: float,
                        color: Optional[np.ndarray] = None, iso: float = 0.0):
    """Primal isosurface extraction via marching tetrahedra (vectorized
    numpy): each sign-change cube is split into 6 tetrahedra and each tet
    emits 1-2 triangles with EXACT linear zero-crossing vertices on its
    edges — same family/fidelity as the reference's marching cubes
    (evaluation/nerf_renderer.py:170-209 [upstream]) without the 256-case
    tables. Shared vertices are merged by lattice-edge dedup.

    Returns (vertices [N, 3], faces [M, 3], vertex_colors or None).
    """
    valid = weight > 0 if weight is not None else np.ones_like(tsdf, bool)

    def corners(a):
        return np.stack(
            [a[:-1, :-1, :-1], a[1:, :-1, :-1], a[:-1, 1:, :-1],
             a[1:, 1:, :-1], a[:-1, :-1, 1:], a[1:, :-1, 1:],
             a[:-1, 1:, 1:], a[1:, 1:, 1:]], -1,
        )

    cv = corners(tsdf)
    cw = corners(valid.astype(np.uint8)).all(-1)
    sign = cv < iso
    mixed = cw & sign.any(-1) & (~sign.all(-1))
    if not mixed.any():
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32), None

    ci, cj, ck = np.nonzero(mixed)
    vals = cv[ci, cj, ck]  # [N, 8]
    base = np.stack([ci, cj, ck], -1).astype(np.float32)  # [N, 3]

    tri_verts = []
    for tet in _TETS:
        tv = vals[:, tet]  # [N, 4]
        case = ((tv < iso) << np.arange(4)).sum(-1)  # [N]
        for t in range(2):
            tri_e = _TRI_TABLE[case, t]  # [N, 3] edge ids or -1
            sel = tri_e[:, 0] >= 0
            if not sel.any():
                continue
            e = tri_e[sel]  # [M, 3]
            va = tv[sel][np.arange(sel.sum())[:, None], _EDGE_A[e]]
            vb = tv[sel][np.arange(sel.sum())[:, None], _EDGE_B[e]]
            pa = base[sel, None, :] + _CORNER_OFF[tet[_EDGE_A[e]]]
            pb = base[sel, None, :] + _CORNER_OFF[tet[_EDGE_B[e]]]
            frac = ((iso - va) / np.where(
                np.abs(vb - va) < 1e-12, 1e-12, vb - va
            ))[..., None]
            tri_verts.append(pa + np.clip(frac, 0.0, 1.0) * (pb - pa))

    v = np.concatenate(tri_verts, 0).reshape(-1, 3)  # [3*T, 3] lattice coords
    # merge duplicate vertices (zero-crossings are shared across tets/cells)
    keys = np.round(v * 4096.0).astype(np.int64)
    _, uniq_idx, inv = np.unique(
        keys.view([("x", np.int64), ("y", np.int64), ("z", np.int64)]),
        return_index=True, return_inverse=True,
    )
    verts = v[uniq_idx]
    faces = inv.reshape(-1, 3).astype(np.int32)
    # drop degenerate triangles
    good = (
        (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    faces = faces[good]

    vcolors = None
    if color is not None:
        vi = np.clip(np.round(verts).astype(np.int64), 0,
                     np.array(color.shape[:3]) - 1)
        vcolors = color[vi[:, 0], vi[:, 1], vi[:, 2]]

    verts = verts * voxel_size + origin
    return verts.astype(np.float32), faces, vcolors


def extract_mesh(tsdf, weight, origin, voxel_size, color=None,
                 method: str = "marching_tetrahedra"):
    """Isosurface extraction dispatch: 'marching_tetrahedra' (default,
    primal, exact edge interpolation) or 'surface_nets' (dual, faster)."""
    if method == "surface_nets":
        return surface_nets(tsdf, weight, origin, voxel_size, color)
    return marching_tetrahedra(tsdf, weight, origin, voxel_size, color)


def integrate_mesh(file_mesh: str, camera_intrinsics: dict,
                   camera_extrinsics, frames_color, frames_depth,
                   voxel_size: float = VOXEL_SIZE) -> None:
    """Fuse frames and write a .ply (reference integrate_mesh,
    evaluation_utils.py:160-227)."""
    from nerf_vo_tpu.evaluation.meshio import write_ply

    intr = np.asarray(
        [camera_intrinsics["fx"], camera_intrinsics["fy"],
         camera_intrinsics["cx"], camera_intrinsics["cy"]], np.float32,
    )
    colors = (
        np.stack(frames_color).astype(np.float32) / 255.0
        if frames_color is not None else None
    )
    vol = fuse_tsdf(
        np.stack(frames_depth), colors, intr,
        np.stack(camera_extrinsics), voxel_size=voxel_size,
    )
    verts, faces, vcol = extract_mesh(
        vol["tsdf"], vol["weight"], vol["origin"], vol["voxel_size"],
        vol["color"],
    )
    write_ply(file_mesh, verts, faces, vcol)
