"""Hand-built NanoVDB 32.x byte-layout fixture (VERDICT r2 missing #4).

Assembles a .nvdb file DIRECTLY from the NanoVDB ABI as published in
nanovdb/NanoVDB.h (file layout v32.x, "NanoVDB0" magic): FileHeader,
FileMetaData, GridData(672)/TreeData(64)/RootData/Internal/Leaf node
arrays.  Every offset below is a hand-derived spec literal — nothing is
imported from ``elaina_tpu.core.nanovdb`` — so reading this file exercises
the repo reader against an independently-constructed byte stream, not a
round-trip of its own writer.

The fixture deliberately differs from anything the repo writer produces:

* non-zero root background (the writer always emits 0) — validates the
  background broadcast outside active voxels;
* PARTIAL leaf value masks with poison values (-999) in inactive slots —
  validates per-voxel mask decoding (the writer only emits full-box masks
  clipped at the grid bbox);
* leaf array in REVERSED breadth-first order — leaves are self-locating
  via mBBoxMin, the reader must not assume lexicographic order;
* leaf mBBoxMin = the ACTIVE-voxel bbox min (per spec), not the 8-lattice
  leaf origin — validates the reader's ``>> 3 << 3`` floor;
* different GridData version/flags/checksum words than the writer uses.

Reference ingestion path being mirrored: nanovdb::io::readGrid +
SampleFromVoxels (reference core/problem.cu:135-149,
integrator/uniform/integrator.cu:302-312).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---- spec literals (nanovdb/NanoVDB.h, ABI v32.x) ------------------------ #
MAGIC = 0x304244566F6E614E        # "NanoVDB0"
VERSION = (32 << 21) | (4 << 10) | 2      # 32.4.2 — differs from the writer

GRID_TYPE_FLOAT = 1
GRID_CLASS_FOG = 2

GRIDDATA_SIZE = 672
TREEDATA_SIZE = 64
LEAF_SIZE_F = 2144      # 96-byte header + 512 * 4 bytes, 32-aligned
LEAF_MASK_OFF = 16      # after Coord mBBoxMin(12) + mBBoxDif[3] + mFlags
LEAF_VALUES_OFF = 96    # after mask(64) + mMin/mMax/mAvg/mStd (4 x 4)
LOWER_SIZE_F = 33856    # alignas(32) header 1088 + 16^3 * 8-byte tiles
LOWER_TABLE_OFF = 1088
UPPER_SIZE_F = 270400   # alignas(32) header 8256 + 32^3 * 8-byte tiles
UPPER_TABLE_OFF = 8256
ROOT_HEADER_F = 64      # BBox(24)+mTableSize(4)+bg/min/max/avg/sd(20) -> 32-al
ROOT_TILE_F = 24        # {uint64 key, int64 child, uint32 state, float value}

FILEHEADER_FMT = "<QIHH"           # magic, version, gridCount, codec
FILEMETA_SIZE = 176

BACKGROUND = 7.5
VOXEL = (0.5, 0.5, 0.5)
WORLD_OFFSET = (1.0, -2.0, 3.5)
BBOX_LO = np.array([-4, 0, 6], np.int64)
BBOX_HI = np.array([10, 12, 13], np.int64)
NAME = b"external-fixture\0"


def _leaf_coords():
    """8-lattice leaf origins covering the bbox, REVERSED order."""
    out = []
    for i in range(BBOX_LO[0] >> 3, (BBOX_HI[0] >> 3) + 1):
        for j in range(BBOX_LO[1] >> 3, (BBOX_HI[1] >> 3) + 1):
            for k in range(BBOX_LO[2] >> 3, (BBOX_HI[2] >> 3) + 1):
                out.append((i << 3, j << 3, k << 3))
    return out[::-1]


def build_fixture(codec_zip: bool = True):
    """Returns (file_bytes, expected_dense (nx,ny,nz) f32, meta dict)."""
    rng = np.random.default_rng(42)
    shape = tuple((BBOX_HI - BBOX_LO + 1).tolist())
    dense = np.full(shape, BACKGROUND, np.float32)

    leaves = _leaf_coords()
    n_leaf = len(leaves)

    # ---- leaf array ------------------------------------------------------ #
    leaf_bytes = bytearray(n_leaf * LEAF_SIZE_F)
    for li, (ox, oy, oz) in enumerate(leaves):
        base = li * LEAF_SIZE_F
        org = np.array([ox, oy, oz], np.int64)
        # voxels of this leaf inside the grid bbox
        v_lo = np.maximum(org, BBOX_LO)
        v_hi = np.minimum(org + 7, BBOX_HI)
        # partial activity: ~60% of in-bbox voxels active
        mask = np.zeros((8, 8, 8), bool)
        sl = tuple(slice(int(a - o), int(b - o + 1))
                   for a, b, o in zip(v_lo, v_hi, org))
        sub = rng.random(mask[sl].shape) < 0.6
        if not sub.any():
            sub.flat[0] = True
        mask[sl] = sub
        vals = np.full((8, 8, 8), -999.0, np.float32)     # poison inactive
        act = rng.uniform(0.25, 4.0, size=int(mask.sum())).astype(np.float32)
        vals[mask] = act
        # mBBoxMin = ACTIVE bbox min (spec), not the leaf origin
        aw = np.argwhere(mask)
        bb_min = org + aw.min(0)
        bb_dif = (aw.max(0) - aw.min(0)).astype(np.uint8)
        struct.pack_into("<3i", leaf_bytes, base, *bb_min.tolist())
        struct.pack_into("<3B", leaf_bytes, base + 12, *bb_dif.tolist())
        leaf_bytes[base + LEAF_MASK_OFF:base + LEAF_MASK_OFF + 64] = (
            np.packbits(mask.reshape(-1), bitorder="little").tobytes())
        a = vals[mask]
        struct.pack_into("<4f", leaf_bytes, base + 80, float(a.min()),
                         float(a.max()), float(a.mean()), float(a.std()))
        leaf_bytes[base + LEAF_VALUES_OFF:base + LEAF_VALUES_OFF + 2048] = (
            vals.astype("<f4").tobytes())
        # expected dense image
        g = org + aw - BBOX_LO
        dense[g[:, 0], g[:, 1], g[:, 2]] = vals[mask]

    # ---- internal + root arrays ------------------------------------------ #
    lowers = sorted({(x >> 7, y >> 7, z >> 7) for x, y, z in leaves})
    uppers = sorted({(x >> 12, y >> 12, z >> 12) for x, y, z in leaves})
    root_size = -(-(ROOT_HEADER_F + len(uppers) * ROOT_TILE_F) // 32) * 32

    off_root = TREEDATA_SIZE
    off_upper = off_root + root_size
    off_lower = off_upper + len(uppers) * UPPER_SIZE_F
    off_leaf = off_lower + len(lowers) * LOWER_SIZE_F
    tree_size = off_leaf + n_leaf * LEAF_SIZE_F
    grid_size = GRIDDATA_SIZE + tree_size

    blob = bytearray(grid_size)

    # GridData — only spec offsets; content differs from the repo writer
    struct.pack_into("<QQIIIIQ", blob, 0, MAGIC, 0xDEADBEEFCAFEF00D,
                     VERSION, (1 << 1) | (1 << 2), 0, 1, grid_size)
    blob[40:40 + len(NAME)] = NAME
    # Map @296: mMatF(36) mInvMatF(36) mVecF(12) mTaperF(4) then doubles
    matf = np.zeros(22, np.float32)
    matf[[0, 4, 8]] = VOXEL
    matf[[9, 13, 17]] = [1.0 / v for v in VOXEL]
    matf[18:21] = WORLD_OFFSET
    struct.pack_into("<22f", blob, 296, *matf.tolist())
    matd = np.zeros(22, np.float64)
    matd[[0, 4, 8]] = VOXEL
    matd[[9, 13, 17]] = [1.0 / v for v in VOXEL]
    matd[18:21] = WORLD_OFFSET
    struct.pack_into("<22d", blob, 296 + 88, *matd.tolist())
    wlo = BBOX_LO * VOXEL + WORLD_OFFSET
    whi = (BBOX_HI + 1) * VOXEL + WORLD_OFFSET
    struct.pack_into("<6d", blob, 560, *wlo.tolist(), *whi.tolist())
    struct.pack_into("<3d", blob, 608, *VOXEL)
    struct.pack_into("<II", blob, 632, GRID_CLASS_FOG, GRID_TYPE_FLOAT)

    # TreeData @672
    t = GRIDDATA_SIZE
    blob[t + off_leaf:t + off_leaf + len(leaf_bytes)] = leaf_bytes
    struct.pack_into("<4Q", blob, t, off_leaf, off_lower, off_upper, off_root)
    struct.pack_into("<3I", blob, t + 32, n_leaf, len(lowers), len(uppers))
    struct.pack_into("<Q", blob, t + 56, int(dense.size))

    # RootData
    ro = t + off_root
    struct.pack_into("<6i", blob, ro, *BBOX_LO.tolist(), *BBOX_HI.tolist())
    struct.pack_into("<I", blob, ro + 24, len(uppers))
    act_all = dense[dense != BACKGROUND]
    struct.pack_into("<5f", blob, ro + 28, BACKGROUND, float(act_all.min()),
                     float(act_all.max()), float(act_all.mean()),
                     float(act_all.std()))
    for ti, (ui, uj, uk) in enumerate(uppers):
        key = (((uk << 12) & 0xFFFFFFFF) >> 12
               | ((((uj << 12) & 0xFFFFFFFF) >> 12) << 21)
               | ((((ui << 12) & 0xFFFFFFFF) >> 12) << 42))
        child = off_upper + uppers.index((ui, uj, uk)) * UPPER_SIZE_F \
            + t - ro
        struct.pack_into("<QqI", blob, ro + ROOT_HEADER_F + ti * ROOT_TILE_F,
                         key, child, 0)

    # Internal nodes: bbox + child masks + child offsets (reader skips
    # these — the leaf array is self-locating — but a spec-shaped file
    # keeps the fixture honest)
    def fill_internal(coords, node_off, node_size, table_off, log2,
                      child_total, child_coords, child_off, child_size):
        dim = 1 << log2
        mask_bytes = dim ** 3 // 8
        for ni, (ci, cj, ck) in enumerate(coords):
            no = t + node_off + ni * node_size
            node_lo = np.array([ci, cj, ck], np.int64) << (child_total + log2)
            b_lo = np.maximum(node_lo, BBOX_LO)
            b_hi = np.minimum(node_lo + (dim << child_total) - 1, BBOX_HI)
            struct.pack_into("<6i", blob, no, *b_lo.tolist(), *b_hi.tolist())
            cmask = np.zeros(dim ** 3, bool)
            for (xx, yy, zz) in child_coords:
                cc = np.array([xx, yy, zz], np.int64) << child_total
                rel = (cc >> child_total) - (node_lo >> child_total)
                if np.all((rel >= 0) & (rel < dim)):
                    n_ = (rel[0] << (2 * log2)) | (rel[1] << log2) | rel[2]
                    cmask[n_] = True
                    e = no + table_off + int(n_) * 8
                    ci2 = child_coords.index((xx, yy, zz))
                    struct.pack_into(
                        "<q", blob, e,
                        child_off + ci2 * child_size + t - no)
            blob[no + 32 + mask_bytes:no + 32 + 2 * mask_bytes] = (
                np.packbits(cmask, bitorder="little").tobytes())

    leaf_lattice = [(x >> 3, y >> 3, z >> 3) for x, y, z in leaves]
    fill_internal(uppers, off_upper, UPPER_SIZE_F, UPPER_TABLE_OFF, 5, 7,
                  lowers, off_lower, LOWER_SIZE_F)
    fill_internal(lowers, off_lower, LOWER_SIZE_F, LOWER_TABLE_OFF, 4, 3,
                  leaf_lattice, off_leaf, LEAF_SIZE_F)

    # ---- file container ---------------------------------------------- #
    raw = bytes(blob)
    if codec_zip:
        payload = struct.pack("<Q", len(raw)) + zlib.compress(raw, 9)
        codec = 1
    else:
        payload = raw
        codec = 0
    meta = bytearray(FILEMETA_SIZE)
    struct.pack_into("<QQQQII", meta, 0, grid_size, len(payload), 0,
                     int(dense.size), GRID_TYPE_FLOAT, GRID_CLASS_FOG)
    struct.pack_into("<6d", meta, 48, *wlo.tolist(), *whi.tolist())
    struct.pack_into("<6i", meta, 96, *BBOX_LO.tolist(), *BBOX_HI.tolist())
    struct.pack_into("<3d", meta, 120, *VOXEL)
    struct.pack_into("<I", meta, 144, len(NAME))
    struct.pack_into("<4I", meta, 148, n_leaf, len(lowers), len(uppers), 1)
    struct.pack_into("<HHI", meta, 168, codec, 0, VERSION)
    out = (struct.pack(FILEHEADER_FMT, MAGIC, VERSION, 1, codec)
           + bytes(meta) + NAME + payload)
    info = {"shape": dense.shape, "origin": BBOX_LO.astype(np.int32),
            "voxel": np.array(VOXEL), "offset": np.array(WORLD_OFFSET),
            "background": BACKGROUND, "name": "external-fixture"}
    return out, dense, info


if __name__ == "__main__":
    import os
    import sys

    data, dense, info = build_fixture()
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                       "handbuilt_v32.nvdb")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "wb") as f:
        f.write(data)
    sys.stdout.write(f"wrote {out}: {len(data)} bytes, "
                     f"dense {dense.shape}\n")
