"""Host-side mesh generation.

Replaces the reference's Gmsh/LibGEOS pipeline (ext/.../mesh_scattered.jl,
mesh_rectangle.jl) with a scipy-based equivalent: convex hull + inflation +
Delaunay triangulation with auto-sized interior fill points. Meshing is
host-only setup; outputs are static NumPy arrays consumed by the assembly
layer.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import ConvexHull, Delaunay, cKDTree

__all__ = ["TriangleMesh", "IntervalMesh", "generate_mesh", "create_inflated_rectangle", "interval_mesh", "icosphere"]


class TriangleMesh:
    """2D (or surface-embedded) P1 triangle mesh."""

    def __init__(self, vertices, triangles):
        self.vertices = np.asarray(vertices, dtype=np.float64)
        self.triangles = np.asarray(triangles, dtype=np.int64)
        if self.triangles.ndim != 2 or self.triangles.shape[1] != 3:
            raise ValueError("triangles must be (m, 3)")

    @property
    def n_vertices(self):
        return self.vertices.shape[0]

    @property
    def n_elements(self):
        return self.triangles.shape[0]

    @property
    def embedding_dim(self):
        return self.vertices.shape[1]

    intrinsic_dim = 2

    def element_coords(self):
        return self.vertices[self.triangles]  # (m, 3, dim)


class IntervalMesh:
    """1D P1 mesh on sorted nodes."""

    def __init__(self, nodes):
        self.nodes = np.sort(np.asarray(nodes, dtype=np.float64))

    @property
    def n_vertices(self):
        return self.nodes.shape[0]

    @property
    def n_elements(self):
        return self.nodes.shape[0] - 1

    intrinsic_dim = 1
    embedding_dim = 1


def interval_mesh(a: float, b: float, n: int) -> IntervalMesh:
    return IntervalMesh(np.linspace(a, b, n))


def auto_mesh_size(points: np.ndarray) -> float:
    """Element size from median nearest-neighbor spacing (reference
    `auto_size_params`, ext/.../mesh_scattered.jl)."""
    if points.shape[0] < 2:
        return 1.0
    tree = cKDTree(points)
    d, _ = tree.query(points, k=2)
    med = float(np.median(d[:, 1]))
    return max(med, 1e-12) * 1.5


def _inflate_polygon(poly: np.ndarray, margin: float) -> np.ndarray:
    """Push convex-polygon vertices outward from the centroid by `margin`."""
    c = poly.mean(axis=0)
    d = poly - c
    norms = np.linalg.norm(d, axis=1, keepdims=True)
    return poly + d / np.maximum(norms, 1e-12) * margin


def generate_mesh(points, element_size=None, buffer_factor: float = 0.2) -> TriangleMesh:
    """Mesh the (inflated) convex hull of scattered 2D points: boundary
    nodes along the hull, interior grid fill at `element_size` spacing, data
    points included as vertices; Delaunay triangulation (convex domain ⇒ the
    triangulation covers exactly the hull)."""
    pts = np.asarray(points, dtype=np.float64)
    if pts.ndim != 2 or pts.shape[1] != 2:
        raise ValueError("points must be (N, 2)")
    if pts.shape[0] < 3:
        raise ValueError("need at least 3 points")
    h = element_size if element_size is not None else auto_mesh_size(pts)
    hull = ConvexHull(pts)
    poly = pts[hull.vertices]
    diameter = float(np.max(poly.max(axis=0) - poly.min(axis=0)))
    poly = _inflate_polygon(poly, buffer_factor * diameter)

    # boundary points sampled along inflated hull edges
    bpts = []
    for i in range(len(poly)):
        a, b = poly[i], poly[(i + 1) % len(poly)]
        steps = max(1, int(np.ceil(np.linalg.norm(b - a) / h)))
        for t in np.linspace(0.0, 1.0, steps, endpoint=False):
            bpts.append(a + t * (b - a))
    bpts = np.asarray(bpts)

    # interior grid fill
    lo, hi = poly.min(axis=0), poly.max(axis=0)
    gx = np.arange(lo[0], hi[0] + h, h)
    gy = np.arange(lo[1], hi[1] + h, h)
    grid = np.stack(np.meshgrid(gx, gy), axis=-1).reshape(-1, 2)
    tri_poly = Delaunay(poly)
    inside = tri_poly.find_simplex(grid) >= 0
    grid = grid[inside]

    allpts = np.vstack([pts, bpts, grid])
    # dedupe near-coincident points (keep data points, which come first)
    tree = cKDTree(allpts)
    keep = np.ones(len(allpts), bool)
    pairs = tree.query_pairs(h * 0.25)
    for i, j in pairs:
        if keep[i] and keep[j]:
            keep[max(i, j)] = False
    allpts = allpts[keep]

    tri = Delaunay(allpts)
    # drop degenerate slivers
    tris = tri.simplices
    coords = allpts[tris]
    u = coords[:, 1] - coords[:, 0]
    v = coords[:, 2] - coords[:, 0]
    areas = 0.5 * np.abs(u[:, 0] * v[:, 1] - u[:, 1] * v[:, 0])
    tris = tris[areas > 1e-12 * np.maximum(areas.max(), 1e-300)]
    return TriangleMesh(allpts, tris)


def create_inflated_rectangle(
    x0: float, y0: float, x1: float, y1: float, h: float, buffer: float = 0.0
) -> TriangleMesh:
    """Structured triangulated rectangle [x0−b, x1+b] × [y0−b, y1+b]
    (reference ext/.../mesh_rectangle.jl boundary-inflated domains)."""
    lo_x, hi_x = x0 - buffer, x1 + buffer
    lo_y, hi_y = y0 - buffer, y1 + buffer
    nx = max(2, int(round((hi_x - lo_x) / h)) + 1)
    ny = max(2, int(round((hi_y - lo_y) / h)) + 1)
    xs = np.linspace(lo_x, hi_x, nx)
    ys = np.linspace(lo_y, hi_y, ny)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    verts = np.stack([X.ravel(), Y.ravel()], axis=-1)

    def vid(i, j):
        return i * ny + j

    tris = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a, b, c, d = vid(i, j), vid(i + 1, j), vid(i + 1, j + 1), vid(i, j + 1)
            tris.append([a, b, c])
            tris.append([a, c, d])
    return TriangleMesh(verts, np.asarray(tris))


def icosphere(subdivisions: int = 3, radius: float = 1.0) -> TriangleMesh:
    """Triangulated unit sphere by icosahedron subdivision — the pure-host
    stand-in for the reference manifolds tutorial's Gmsh OpenCASCADE sphere
    (reference docs/src/literate-tutorials/modelling_on_manifolds.jl:26-44).
    `subdivisions=3` gives 642 vertices / 1280 triangles."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        dtype=np.float64,
    )
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        dtype=np.int64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    for _ in range(subdivisions):
        edges = np.concatenate(
            [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0
        )
        edges = np.sort(edges, axis=1)
        uniq, inv = np.unique(edges, axis=0, return_inverse=True)
        mids = verts[uniq[:, 0]] + verts[uniq[:, 1]]
        mids /= np.linalg.norm(mids, axis=1, keepdims=True)
        mid_idx = len(verts) + np.arange(len(uniq))
        verts = np.concatenate([verts, mids], axis=0)
        m = len(faces)
        ab, bc, ca = (
            mid_idx[inv[:m]],
            mid_idx[inv[m : 2 * m]],
            mid_idx[inv[2 * m :]],
        )
        a, b, c = faces[:, 0], faces[:, 1], faces[:, 2]
        faces = np.concatenate(
            [
                np.stack([a, ab, ca], axis=1),
                np.stack([b, bc, ab], axis=1),
                np.stack([c, ca, bc], axis=1),
                np.stack([ab, bc, ca], axis=1),
            ],
            axis=0,
        )
    return TriangleMesh(verts * radius, faces)
