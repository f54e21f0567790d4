#!/usr/bin/env python
"""Generate the Neumann-heavy 3D benchmark scene (VERDICT r2 next #5).

Dirichlet boundary: a triangulated cube [-1.3, 1.3]^3 (welded, n x n per
face) carrying the harmonic BC h(x) = 0.5 + 0.4 * (x^2 - y^2) / s^2.
Neumann boundary: the 20,480-triangle bumpy icosphere
(configs/data/bumpy3d_5.obj) scaled 0.5 and translated to (0, 0, 0.6) —
an insulated blob floating above the z = 0 evaluation plane, so every
evaluation point lies OUTSIDE the blob and walks terminate on the cube.
This is the reference's 3D mixed-BC regime (core/problem.h:196-336,
uniform/integrator.cu:318-445) at a primitive count where the dense
silhouette/in-ball sweeps are infeasible — the workload that exercises
the hierarchical Neumann paths on TPU.

Writes configs/data/neumann_cube.obj, neumann_cube_colors.npz,
neumann_blob.obj.
"""

from __future__ import annotations

import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(os.path.dirname(HERE), "configs", "data")
HALF = 1.3
SCALE = 0.5
SHIFT = np.array([0.0, 0.0, 0.6], np.float64)


def cube_mesh(n=8, half=HALF):
    verts, tris = [], []
    for f in range(6):
        axis, sign = f // 2, (f % 2) * 2 - 1
        u_ax, v_ax = [a for a in range(3) if a != axis]
        base = len(verts)
        for i in range(n + 1):
            for j in range(n + 1):
                p = np.zeros(3, np.float64)
                p[axis] = sign * half
                p[u_ax] = -half + 2 * half * i / n
                p[v_ax] = -half + 2 * half * j / n
                verts.append(p)
        for i in range(n):
            for j in range(n):
                a = base + i * (n + 1) + j
                b, c, d = a + 1, a + (n + 1), a + (n + 1) + 1
                # wind so normals face OUTWARD consistently per face sign
                if sign > 0:
                    tris.extend([(a, b, d), (a, d, c)])
                else:
                    tris.extend([(a, d, b), (a, c, d)])
    verts = np.asarray(verts)
    tris = np.asarray(tris, np.int64)
    keys = np.round(verts * 1e6).astype(np.int64)
    _, first, inverse = np.unique(keys, axis=0, return_index=True,
                                  return_inverse=True)
    order = np.argsort(first)
    verts = verts[first[order]]
    remap = np.empty(len(first), np.int64)
    remap[order] = np.arange(len(first))
    tris = remap[inverse][tris]
    return verts, tris


def write_obj(path, verts, tris):
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.9g} {v[1]:.9g} {v[2]:.9g}\n")
        for t in tris:
            f.write(f"f {t[0] + 1} {t[1] + 1} {t[2] + 1}\n")


def load_obj(path):
    verts, tris = [], []
    for line in open(path):
        if line.startswith("v "):
            verts.append([float(x) for x in line.split()[1:4]])
        elif line.startswith("f "):
            idx = [int(tok.split("/")[0]) - 1 for tok in line.split()[1:]]
            for k in range(1, len(idx) - 1):
                tris.append([idx[0], idx[k], idx[k + 1]])
    return np.asarray(verts), np.asarray(tris, np.int64)


def main():
    cv, ct = cube_mesh(8)
    write_obj(os.path.join(DATA, "neumann_cube.obj"), cv, ct)
    s = HALF
    h = 0.5 + 0.4 * (cv[:, 0] ** 2 - cv[:, 1] ** 2) / (s * s)
    colors = np.zeros((len(cv), 2, 3), np.float32)
    colors[:, :, :] = h[:, None, None].astype(np.float32)
    np.savez(os.path.join(DATA, "neumann_cube_colors.npz"), colors=colors)

    bv, bt = load_obj(os.path.join(DATA, "bumpy3d_5.obj"))
    bv = bv * SCALE + SHIFT
    write_obj(os.path.join(DATA, "neumann_blob.obj"), bv, bt)
    print(f"cube: {len(cv)} verts / {len(ct)} tris; "
          f"blob: {len(bv)} verts / {len(bt)} tris "
          f"(z range {bv[:, 2].min():.3f}..{bv[:, 2].max():.3f})")


if __name__ == "__main__":
    main()
