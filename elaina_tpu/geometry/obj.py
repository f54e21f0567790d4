"""Wavefront OBJ loading for boundary geometry.

Equivalent of ``lbvh::scene_loader<DIM>`` (SURVEY.md §2.1; problem.cu:29-35).
2D boundaries are OBJ line elements (``l i j`` / polylines), 3D boundaries are
triangle faces.  Vertices are returned as (V, DIM) float32 (the z coordinate
is dropped for DIM=2) and indices as (P, DIM) int32, 0-based.
"""

from __future__ import annotations

import numpy as np


def load_obj(path: str, dim: int):
    verts: list[list[float]] = []
    segs: list[tuple[int, int]] = []
    tris: list[tuple[int, int, int]] = []

    def _vidx(tok: str, nverts: int) -> int:
        tok = tok.split("/")[0]
        i = int(tok)
        return i - 1 if i > 0 else nverts + i

    with open(path, "r") as f:
        for line in f:
            if not line or line[0] in "#\n":
                continue
            parts = line.split()
            if not parts:
                continue
            tag = parts[0]
            if tag == "v":
                verts.append([float(parts[1]), float(parts[2]),
                              float(parts[3]) if len(parts) > 3 else 0.0])
            elif tag == "l":
                idx = [_vidx(t, len(verts)) for t in parts[1:]]
                for a, b in zip(idx[:-1], idx[1:]):
                    segs.append((a, b))
            elif tag == "f":
                idx = [_vidx(t, len(verts)) for t in parts[1:]]
                if dim == 2 and len(idx) == 2:
                    segs.append((idx[0], idx[1]))
                else:
                    for k in range(1, len(idx) - 1):  # fan triangulation
                        tris.append((idx[0], idx[k], idx[k + 1]))

    v = np.asarray(verts, np.float32)
    if dim == 2:
        v = v[:, :2]
        indices = np.asarray(segs, np.int32).reshape(-1, 2)
    else:
        indices = np.asarray(tris, np.int32).reshape(-1, 3)
    if indices.shape[0] == 0:
        raise ValueError(f"{path}: no {'line segments' if dim == 2 else 'triangles'} found")
    return v, indices
