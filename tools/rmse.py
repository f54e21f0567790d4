#!/usr/bin/env python
"""RMSE between two solution EXRs (equal-spp / equal-time comparison tool).

The reference's convergence protocol compares solve outputs against a
65,536-spp uniform ground truth (data/*/gt.json; SURVEY.md §6).  Usage:

    python tools/rmse.py exp/ladybug_n/solution.exr exp/ladybug_gt/solution.exr
"""

import json
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from elaina_tpu.output.image_io import read_exr


def rmse(a: np.ndarray, b: np.ndarray, mask: np.ndarray | None = None):
    a = a[..., :3].astype(np.float64)
    b = b[..., :3].astype(np.float64)
    diff2 = (a - b) ** 2
    if mask is not None:
        diff2 = diff2[mask]
    return float(np.sqrt(diff2.mean()))


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        return 1
    img = read_exr(sys.argv[1])
    ref = read_exr(sys.argv[2])
    if img.shape[:2] != ref.shape[:2]:
        print(f"shape mismatch: {img.shape} vs {ref.shape}", file=sys.stderr)
        return 1
    finite = np.isfinite(img[..., :3]).all(-1) & np.isfinite(ref[..., :3]).all(-1)
    print(json.dumps({
        "rmse": rmse(img, ref, finite),
        "mae": float(np.abs(img[..., :3] - ref[..., :3])[finite].mean()),
        "shape": list(img.shape),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
