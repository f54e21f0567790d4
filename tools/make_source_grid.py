#!/usr/bin/env python
"""Create volumetric source grids (.npz or .nvdb) for the solver.

The reference loads NanoVDB Vec3f grids (problem.cu:135-149); this build
ingests `.nvdb` directly (core/nanovdb.py) as well as dense ``.npz`` grids
with keys {data, origin, voxel_size} (core/problem.py::SourceGrid).  This
tool generates procedural grids for experiments and tests in either
format (picked by the output extension).

Examples:
    python tools/make_source_grid.py gauss2d out.npz --res 256 \
        --lo -100 -100 --hi 600 600 --center 250 250 --sigma 60
    python tools/make_source_grid.py const3d out.npz --res 64 \
        --lo -1 -1 -1 --hi 1 1 1 --value 1.0
"""

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=["gauss2d", "const2d", "const3d", "gauss3d"])
    ap.add_argument("out")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--lo", type=float, nargs="+", required=True)
    ap.add_argument("--hi", type=float, nargs="+", required=True)
    ap.add_argument("--center", type=float, nargs="+", default=None)
    ap.add_argument("--sigma", type=float, default=1.0)
    ap.add_argument("--value", type=float, default=1.0)
    ap.add_argument("--color", type=float, nargs=3, default=[1.0, 1.0, 1.0])
    args = ap.parse_args()

    dim = 2 if args.kind.endswith("2d") else 3
    lo = np.asarray(args.lo[:dim], np.float32)
    hi = np.asarray(args.hi[:dim], np.float32)
    res = [args.res] * dim
    voxel = (hi - lo) / np.asarray(res, np.float32)
    axes = [lo[d] + (np.arange(res[d]) + 0.5) * voxel[d] for d in range(dim)]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), -1)

    if args.kind.startswith("const"):
        field = np.full(grid.shape[:-1], args.value, np.float32)
    else:
        center = np.asarray((args.center or ((lo + hi) / 2).tolist())[:dim],
                            np.float32)
        r2 = np.sum((grid - center) ** 2, -1)
        field = args.value * np.exp(-0.5 * r2 / args.sigma**2)

    data = field[..., None] * np.asarray(args.color, np.float32)
    if args.out.endswith(".nvdb"):
        import os
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from elaina_tpu.core.nanovdb import write_nvdb
        vals = data.astype(np.float32)
        voxel3 = np.ones(3, np.float32)
        off3 = np.zeros(3, np.float64)
        voxel3[:dim] = voxel
        # SourceGrid origin = voxel CENTER of index 0
        off3[:dim] = lo + 0.5 * voxel
        if dim == 2:
            vals = vals[:, :, None]
        from elaina_tpu.core.nanovdb import CODEC_ZIP
        write_nvdb(args.out, vals, voxel_size=voxel3, world_offset=off3,
                   codec=CODEC_ZIP)
    else:
        np.savez_compressed(args.out, data=data.astype(np.float32),
                            origin=lo + 0.5 * voxel, voxel_size=voxel)
    print(f"wrote {args.out}: data{data.shape} origin={lo + 0.5 * voxel} "
          f"voxel={voxel}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
