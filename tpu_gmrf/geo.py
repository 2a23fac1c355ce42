"""Geospatial input: shapefile polygons → contiguity adjacency → Besag/BYM2.

Parity with the reference's Shapefile/LibGEOS extensions
(reference ext/GaussianMarkovRandomFieldsShapefile.jl /
...LibGEOS.jl:1-118): read ESRI shapefile polygon geometry with a
dependency-free binary reader, and build queen/rook contiguity adjacency
(shared vertex / shared edge) as a sparse 0/1 W matrix for `BesagModel` /
`BYM2Model`. All host-side NumPy — runs once at model-build time.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["read_shapefile_polygons", "contiguity_adjacency", "adjacency_from_shapefile"]


def read_shapefile_polygons(path: str):
    """Minimal ESRI .shp reader for shape types 5/15/25 (Polygon*).

    Returns a list of polygons; each polygon is a list of rings, each ring
    an (k, 2) float64 array of vertices. (Spec: ESRI Shapefile Technical
    Description, July 1998 — file header 100 bytes big-endian lengths,
    little-endian record payloads.)
    """
    polys = []
    with open(path, "rb") as f:
        header = f.read(100)
        if len(header) < 100:
            raise ValueError("not a shapefile: truncated header")
        (file_code,) = struct.unpack(">i", header[:4])
        if file_code != 9994:
            raise ValueError("not a shapefile: bad magic")
        (file_len_words,) = struct.unpack(">i", header[24:28])
        file_len = file_len_words * 2
        pos = 100
        while pos < file_len:
            rec_header = f.read(8)
            if len(rec_header) < 8:
                break
            _, content_len_words = struct.unpack(">ii", rec_header)
            content = f.read(content_len_words * 2)
            pos += 8 + content_len_words * 2
            (shape_type,) = struct.unpack("<i", content[:4])
            if shape_type == 0:  # null shape
                continue
            if shape_type not in (5, 15, 25):
                raise ValueError(f"unsupported shape type {shape_type} (want Polygon)")
            num_parts, num_points = struct.unpack("<ii", content[36:44])
            parts = np.frombuffer(content, dtype="<i4", count=num_parts, offset=44)
            pts = np.frombuffer(
                content, dtype="<f8", count=num_points * 2, offset=44 + 4 * num_parts
            ).reshape(num_points, 2)
            bounds = np.append(parts, num_points)
            rings = [pts[bounds[i] : bounds[i + 1]].copy() for i in range(num_parts)]
            polys.append(rings)
    return polys


def _vertex_keys(poly, decimals: int):
    vs = np.concatenate([r for r in poly], axis=0)
    return set(map(tuple, np.round(vs, decimals)))


def _edge_keys(poly, decimals: int):
    edges = set()
    for ring in poly:
        r = np.round(ring, decimals)
        for i in range(len(r) - 1):
            a, b = tuple(r[i]), tuple(r[i + 1])
            edges.add((a, b) if a <= b else (b, a))
    return edges


def contiguity_adjacency(polygons, criterion: str = "queen", decimals: int = 8):
    """Queen (shared vertex) or rook (shared edge) contiguity.

    polygons: list of list-of-rings as returned by
    `read_shapefile_polygons`. Returns a symmetric scipy CSR 0/1 matrix.
    Uses an inverted index vertex→polygons so the cost is O(total
    vertices), not O(n²) pairwise tests.
    """
    import scipy.sparse as sp

    n = len(polygons)
    keyed = [
        _vertex_keys(p, decimals) if criterion == "queen" else _edge_keys(p, decimals)
        for p in polygons
    ]
    index: dict = {}
    for i, keys in enumerate(keyed):
        for k in keys:
            index.setdefault(k, []).append(i)
    rows, cols = [], []
    for members in index.values():
        if len(members) > 1:
            for a in members:
                for b in members:
                    if a != b:
                        rows.append(a)
                        cols.append(b)
    W = sp.csr_matrix(
        (np.ones(len(rows)), (rows, cols)), shape=(n, n)
    )
    W.data[:] = 1.0  # collapse duplicates from multiple shared keys
    W.sum_duplicates()
    W.data[:] = 1.0
    return W


def adjacency_from_shapefile(path: str, criterion: str = "queen"):
    """Shapefile → contiguity W, ready for `BesagModel(W)` / `BYM2Model(W)`."""
    return contiguity_adjacency(read_shapefile_polygons(path), criterion=criterion)
