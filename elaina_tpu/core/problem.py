"""Problem (scene) layer: config -> boundary geometry, colors, source, mask.

TPU-native counterpart of core/problem.{h,cu} (SURVEY.md §2.0 "Problem"):
OBJ Dirichlet/Neumann boundaries with silhouette precompute + acceleration
(problem.cu:21-61), two-sided per-vertex color pairs from JSON
(problem.cu:63-133), dense volumetric source term (NanoVDB in the reference,
problem.cu:135-149 — here a dense ``.npy``/``.npz`` grid sampled
trilinearly), mask image (problem.cu:215-249), AABB + evaluation grid
(problem.cu:151-181), and the statistics printout (problem.cu:183-212).

Device-facing data is carried in registered dataclasses (pytrees) so the
solver jits over them as ordinary arguments; flags and grid resolutions are
metadata (static under jit).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.geomset import GeomSet, make_geom_set
from ..geometry.grid import CandidateGrid, build_candidate_grid
from ..geometry.obj import load_obj as _load_obj_py


def load_obj(path: str, dim: int):
    """OBJ load via the native C++ parser when built, else pure Python."""
    from ..geometry import native as _native
    if _native.available():
        return _native.load_obj_native(path, dim)
    return _load_obj_py(path, dim)
from .config import json_get_optional, json_get_or_throw, load_json_file
from .evaluation_grid import EvaluationGrid
from .logger import log_info, log_success, log_warning

GRID_ACCEL_MIN_PRIMS = 256  # below this the dense prim sweep wins anyway


@partial(jax.tree_util.register_dataclass,
         data_fields=["gs", "colors"], meta_fields=[])
@dataclass
class Boundary:
    gs: GeomSet
    colors: jnp.ndarray          # (V, 2, 3) float32: (side>=0, side<0) pairs


@partial(jax.tree_util.register_dataclass,
         data_fields=["data", "origin", "inv_voxel"], meta_fields=[])
@dataclass
class SourceGrid:
    """Dense volumetric source: world -> voxel affine + trilinear fetch.

    Replaces the NanoVDB device grid (problem.cu:135-149,
    uniform/integrator.cu:302-312).  ``data`` is (X, Y, 3) or (X, Y, Z, 3).
    """

    data: jnp.ndarray
    origin: jnp.ndarray          # (D,) world position of voxel (0,...,0) center
    inv_voxel: jnp.ndarray       # (D,) 1 / voxel_size

    def sample(self, p):
        """Trilinear (bilinear in 2D) sample at world points p (N, D) -> (N, 3)."""
        dim = p.shape[-1]
        idx_f = (p - self.origin) * self.inv_voxel
        i0 = jnp.floor(idx_f).astype(jnp.int32)
        frac = idx_f - i0
        shape = jnp.asarray(self.data.shape[:dim], jnp.int32)

        def fetch(corner):
            ii = jnp.clip(i0 + jnp.asarray(corner, jnp.int32), 0, shape - 1)
            if dim == 2:
                return self.data[ii[..., 0], ii[..., 1]]
            return self.data[ii[..., 0], ii[..., 1], ii[..., 2]]

        out = 0.0
        for corner in np.ndindex(*([2] * dim)):
            w = jnp.ones(p.shape[:-1], self.data.dtype)
            for d in range(dim):
                w = w * (frac[..., d] if corner[d] else (1.0 - frac[..., d]))
            out = out + w[..., None] * fetch(corner)
        return out


@partial(jax.tree_util.register_dataclass,
         data_fields=["dirichlet", "neumann", "d_grid", "source",
                      "aabb_lo", "aabb_hi", "n_sgrid", "n_bgrid"],
         meta_fields=["dim", "source_intensity", "dirichlet_intensity",
                      "neumann_intensity"])
@dataclass
class Scene:
    """Device-facing scene pytree handed to the jitted solver."""

    dirichlet: Optional[Boundary]
    neumann: Optional[Boundary]
    d_grid: Optional[CandidateGrid]
    source: Optional[SourceGrid]
    aabb_lo: jnp.ndarray
    aabb_hi: jnp.ndarray
    dim: int
    source_intensity: float
    dirichlet_intensity: float
    neumann_intensity: float
    # silhouette candidate grid for LARGE Neumann sets (grid.SilGrid):
    # replaces the per-lane coned-BVH descent in the R_N query
    n_sgrid: Optional[object] = None
    # radius-complete prim band grid for LARGE Neumann sets
    # (grid.PrimBandGrid): one row per walk step serves the in-ball /
    # ray / visibility queries densely, with R_B clamped to the row's
    # completeness cap (wost._separate)
    n_bgrid: Optional[object] = None


def _parse_vertex_colors(path: str, n_verts: int) -> np.ndarray:
    """Two-sided vertex color pairs (problem.cu:63-96); missing file -> zeros."""
    colors = np.zeros((n_verts, 2, 3), np.float32)
    conf = load_json_file(path)
    entries = json_get_or_throw(conf, "ColorConfigurations")
    for i, e in enumerate(entries):
        vid = int(json_get_or_throw(e, "vertexID"))
        if vid != i + 1:
            raise ValueError("ColorConfigurations must be sorted by vertexID")
        colors[i, 0] = [e["leftColor"][c] for c in "RGB"]
        colors[i, 1] = [e["rightColor"][c] for c in "RGB"]
    return colors


def _load_source(path: str, dim: int) -> SourceGrid:
    if path.endswith((".npy", ".npz")):
        if path.endswith(".npy"):
            data = np.load(path)
            origin = np.zeros(dim, np.float32)
            voxel = np.ones(dim, np.float32)
        else:
            z = np.load(path)
            data = z["data"]
            origin = np.asarray(z.get("origin", np.zeros(dim)), np.float32)
            voxel = np.asarray(z.get("voxel_size", np.ones(dim)), np.float32)
        if data.ndim == dim:  # scalar grid -> replicate to RGB
            data = np.repeat(data[..., None], 3, axis=-1)
        return SourceGrid(
            data=jnp.asarray(data.astype(np.float32)),
            origin=jnp.asarray(origin),
            inv_voxel=jnp.asarray(1.0 / voxel),
        )
    if path.endswith(".nvdb"):
        # direct NanoVDB ingestion (problem.cu:135-149): decode the sparse
        # tree to a dense array; the kernels sample it trilinearly exactly
        # like SampleFromVoxels<.,1> (uniform/integrator.cu:302-312)
        from .nanovdb import read_nvdb
        g = read_nvdb(path)
        data = g.values
        if data.shape[-1] == 1:
            data = np.repeat(data, 3, axis=-1)
        voxel3 = g.voxel_size.astype(np.float32)
        origin3 = (g.world_offset + g.origin * g.voxel_size).astype(np.float32)
        if dim == 2:
            # the reference samples 2D problems at world z = 0
            # (uniform/integrator.cu:300-309): bake the z interpolation
            zf = float((0.0 - g.world_offset[2]) / g.voxel_size[2]
                       - g.origin[2])
            z0 = int(np.clip(np.floor(zf), 0, data.shape[2] - 1))
            z1 = int(np.clip(z0 + 1, 0, data.shape[2] - 1))
            fz = np.float32(np.clip(zf - z0, 0.0, 1.0))
            data = (1.0 - fz) * data[:, :, z0] + fz * data[:, :, z1]
            return SourceGrid(
                data=jnp.asarray(data.astype(np.float32)),
                origin=jnp.asarray(origin3[:2]),
                inv_voxel=jnp.asarray(1.0 / voxel3[:2]),
            )
        return SourceGrid(
            data=jnp.asarray(data.astype(np.float32)),
            origin=jnp.asarray(origin3),
            inv_voxel=jnp.asarray(1.0 / voxel3),
        )
    if path.endswith(".vdb"):
        try:
            import pyopenvdb  # noqa: F401  (not in the base image)
        except ImportError:
            raise NotImplementedError(
                f"{path!r}: OpenVDB .vdb needs pyopenvdb (not installed); "
                "convert to .nvdb (tools/make_source_grid.py --nvdb) or a "
                "dense .npz") from None
        return _load_source_pyopenvdb(path, dim)
    raise NotImplementedError(
        f"source grid format not supported: {path!r} (use .nvdb, or "
        ".npy/.npz dense grids with keys data/origin/voxel_size)")


def _load_source_pyopenvdb(path: str, dim: int) -> SourceGrid:
    import pyopenvdb

    grids = pyopenvdb.readAllGridMetadata(path)
    grid = pyopenvdb.read(path, grids[0].name)
    bbox = grid.evalActiveVoxelBoundingBox()
    lo, hi = np.asarray(bbox[0]), np.asarray(bbox[1])
    shape = tuple((hi - lo + 1).tolist())
    n_ch = 3 if "Vec" in grid.valueTypeName else 1
    data = np.zeros(shape + ((n_ch,) if n_ch > 1 else ()), np.float32)
    grid.copyToArray(data, ijk=tuple(lo.tolist()))
    if n_ch == 1:
        data = np.repeat(data[..., None], 3, axis=-1)
    voxel = np.asarray(grid.transform.voxelSize(), np.float32)
    origin = np.asarray(grid.transform.indexToWorld(tuple(lo.tolist())),
                        np.float32)
    if dim == 2:
        data = data[:, :, data.shape[2] // 2]
        voxel, origin = voxel[:2], origin[:2]
    return SourceGrid(data=jnp.asarray(data), origin=jnp.asarray(origin),
                      inv_voxel=jnp.asarray(1.0 / voxel))


class Problem:
    """Host-side scene owner: loads config, builds device pytrees.

    Equivalent of Problem<2|3>::loadConfig (problem.h:72,214).
    """

    def __init__(self, dim: int, verbose: bool = True):
        self.dim = dim
        self.verbose = verbose
        self.scene: Scene | None = None
        self.probe: EvaluationGrid | None = None
        self.mask: np.ndarray | None = None  # (H, W) bool or None
        self.d_stack = 48
        self.n_stack = 48
        self.stats: dict = {}

    # -- persistent load-balancing hints ------------------------------------
    # Per-pixel walk costs and steps/s rates measured by earlier solves.
    # Pure HINTS (correctness never depends on them): with them, a fresh
    # process skips the unbalanced probe round (~1.6 s at 2.1M/s on the
    # 512² headline) and time-budgeted solves slice their first round.

    def _hint_path(self) -> str | None:
        cd = getattr(self, "cache_dir", None)
        if not cd or self.scene is None or self.scene.dirichlet is None:
            return None
        import hashlib
        v = np.asarray(self.scene.dirichlet.gs.verts)
        key = hashlib.sha1(
            v[:64].tobytes() + np.int64([v.shape[0], self.dim]).tobytes()
        ).hexdigest()[:16]
        return os.path.join(cd, f"hints_{key}.npz")

    def hint_cache_load(self):
        from ..utils.rng import deterministic
        if deterministic():
            # pinned-round-structure mode: hints from earlier processes
            # encode their timing-dependent measurements, and loading
            # them reshapes this run's rounds (have_cost0, partitions) —
            # the cross-run nondeterminism VERDICT r4 #1 chased
            return
        path = self._hint_path()
        if not path or not os.path.exists(path) or getattr(
                self, "_hints_loaded", False):
            return
        self._hints_loaded = True
        cost = self.__dict__.setdefault("_cost_cache", {})
        rate = self.__dict__.setdefault("_rate_cache", {})
        # the member reads decompress lazily: a truncated/corrupt file
        # (non-atomic writer killed mid-save) must not abort the solve
        # over a performance hint, so the whole loop sits inside the try
        # (ADVICE r3 #2)
        try:
            z = np.load(path, allow_pickle=False)
            for k in z.files:
                parts = k.split("_")
                if k.startswith("cost_"):
                    cost.setdefault((int(parts[1]), float(parts[2]),
                                     int(parts[3])), np.asarray(z[k]))
                elif k.startswith("ratetrain_"):
                    rate.setdefault(("train", int(parts[1])), float(z[k]))
                elif k.startswith("rate_"):
                    rate.setdefault(int(parts[1]), float(z[k]))
        except Exception:
            return

    def hint_cache_save(self):
        from ..utils.rng import deterministic
        if deterministic():
            return  # do not pollute later normal runs with pinned-mode rates
        path = self._hint_path()
        if not path:
            return
        payload = {}
        for k, v in self.__dict__.get("_cost_cache", {}).items():
            payload[f"cost_{k[0]}_{k[1]}_{k[2]}"] = np.asarray(v, np.float32)
        for k, v in self.__dict__.get("_rate_cache", {}).items():
            if isinstance(k, tuple):
                payload[f"ratetrain_{k[1]}"] = np.float64(v)
            else:
                payload[f"rate_{k}"] = np.float64(v)
        if payload:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            # atomic publish: np.savez is not atomic, and a reader (or a
            # killed process) must never observe a half-written archive
            # the tmp name must keep the .npz suffix (np.savez appends it
            # to anything else, breaking the rename)
            tmp = path[:-4] + f".tmp{os.getpid()}.npz"
            np.savez_compressed(tmp, **payload)
            os.replace(tmp, path)

    # -- flags (problem.h:104-171) ------------------------------------------
    @property
    def is_dirichlet_enabled(self):
        return self.scene.dirichlet is not None

    @property
    def is_neumann_enabled(self):
        return self.scene.neumann is not None

    @property
    def is_source_enabled(self):
        return self.scene.source is not None

    def load_config(self, conf: dict, base_dir: str = ".",
                    cache_dir: str | None = None,
                    accel: str = "auto") -> "Problem":
        """``accel``: "grid" builds the candidate grid (the TPU fast path),
        "bvh" skips it (uses the traversal fallback), "auto" picks grid on
        accelerator backends and bvh on the (slow, 1-core) CPU."""
        dim = self.dim
        if accel == "auto":
            accel = "bvh" if jax.default_backend() == "cpu" else "grid"
        # remembered for solver-side persistent caches (per-pixel walk
        # costs etc. — load-balancing hints only, never correctness)
        self.cache_dir = cache_dir

        aabb_min = np.asarray(json_get_or_throw(conf, "aabb/min"), np.float32)
        aabb_max = np.asarray(json_get_or_throw(conf, "aabb/max"), np.float32)
        self.probe = EvaluationGrid.from_json(
            json_get_or_throw(conf, "evaluation_grid"), dim)

        mesh = json_get_or_throw(conf, "mesh")

        def resolve(p):
            return p if p is None or os.path.isabs(p) else os.path.join(base_dir, p)

        dirichlet = neumann = None
        d_grid = None
        if json_get_optional(mesh, "dirichlet_path"):
            v, idx = load_obj(resolve(mesh["dirichlet_path"]), dim)
            gs, depth = make_geom_set(v, idx)
            self.d_stack = depth + 4
            colors = self._load_colors(
                resolve(json_get_optional(mesh, "vertex_color_dirichlet_path")),
                v.shape[0])
            dirichlet = Boundary(gs=gs, colors=jnp.asarray(colors))
            self.stats["dirichlet_vertices"] = v.shape[0]
            self.stats["dirichlet_primitives"] = idx.shape[0]
            if idx.shape[0] > GRID_ACCEL_MIN_PRIMS and accel == "grid":
                margin = 0.05 * (aabb_max - aabb_min)
                d_grid = build_candidate_grid(
                    v, idx,
                    np.minimum(aabb_min, v.min(0)) - margin,
                    np.maximum(aabb_max, v.max(0)) + margin,
                    cache_dir=cache_dir)
                from ..geometry.grid import (_pallas_interpret, _use_pallas,
                                             attach_coords, attach_shading)
                if _use_pallas() or _pallas_interpret():
                    d_grid = attach_coords(d_grid, v, idx)
                    d_grid = attach_shading(d_grid, colors, idx)
        n_verts_idx = None
        if json_get_optional(mesh, "neumann_path"):
            v, idx = load_obj(resolve(mesh["neumann_path"]), dim)
            n_verts_idx = (v, idx)
            gs, depth = make_geom_set(v, idx)
            self.n_stack = depth + 4
            colors = self._load_colors(
                resolve(json_get_optional(mesh, "vertex_color_neumann_path")),
                v.shape[0])
            neumann = Boundary(gs=gs, colors=jnp.asarray(colors))
            self.stats["neumann_vertices"] = v.shape[0]
            self.stats["neumann_primitives"] = idx.shape[0]

        source = None
        if json_get_optional(conf, "source_path"):
            source = _load_source(resolve(conf["source_path"]), dim)
            self.stats["source_shape"] = tuple(source.data.shape)

        mask_path = json_get_optional(conf, "mask_path")
        if mask_path:
            from PIL import Image
            img = np.asarray(Image.open(resolve(mask_path)).convert("RGB"))
            self.mask = np.any(img != 0, axis=-1)  # (H, W), problem.cu:226-239

        # silhouette candidate grid for large Neumann sets: the dense R_N
        # sweep is O(E x lanes) per depth step and the coned-BVH descent is
        # a divergent per-lane loop — the banded grid is the TPU shape
        # (grid.SilGrid; same design as the Dirichlet candidate grid)
        n_sgrid = None
        if neumann is not None and accel == "grid":
            from ..geometry.queries import CHUNKED_DENSE_MAX
            gs = neumann.gs
            if int(gs.sil_p0.shape[0]) > CHUNKED_DENSE_MAX:
                from ..geometry.geomset import host_silhouette_entities
                from ..geometry.grid import build_silhouette_grid
                # re-derive host-side (milliseconds) instead of pulling
                # gs.sil_* off the device — see host_silhouette_entities
                sil = host_silhouette_entities(*n_verts_idx)
                p0, p1 = sil["p0"], sil["p1"]
                margin = 0.05 * (aabb_max - aabb_min)
                s_lo = np.minimum(np.minimum(aabb_min, p0.min(0)),
                                  p1.min(0)) - margin
                s_hi = np.maximum(np.maximum(aabb_max, p0.max(0)),
                                  p1.max(0)) + margin
                n_sgrid = build_silhouette_grid(
                    p0, p1, sil["n1"], sil["n2"],
                    sil["always"], s_lo, s_hi,
                    cache_dir=cache_dir)
                if n_sgrid is not None:
                    self.stats["neumann_sil_grid"] = (
                        f"res={n_sgrid.res} K={n_sgrid.rows.shape[1]}")

        # radius-complete prim band grid: the in-ball / ray / visibility
        # queries of one walk step over a big Neumann set (the vmapped
        # per-lane stack BVH measured ~22 us/lane/step on neumann3d, TPU
        # round 4; the grid turns them into one-row dense sweeps)
        n_bgrid = None
        if neumann is not None and accel == "grid":
            from ..geometry.queries import CHUNKED_DENSE_MAX
            if int(neumann.gs.n_prims) > CHUNKED_DENSE_MAX:
                from ..geometry.grid import build_prim_band_grid
                nv, ni = n_verts_idx
                margin = 0.05 * (aabb_max - aabb_min)
                n_bgrid = build_prim_band_grid(
                    nv, ni, aabb_min - margin, aabb_max + margin,
                    cache_dir=cache_dir)
                if n_bgrid is not None:
                    rc = np.asarray(n_bgrid.r_cap)
                    self.stats["neumann_band_grid"] = (
                        f"res={n_bgrid.res} K={n_bgrid.rows.shape[1]} "
                        f"r_cap_min={float(rc.min()):.4g}")

        self.scene = Scene(
            n_sgrid=n_sgrid,
            n_bgrid=n_bgrid,
            dirichlet=dirichlet,
            neumann=neumann,
            d_grid=d_grid,
            source=source,
            aabb_lo=jnp.asarray(aabb_min),
            aabb_hi=jnp.asarray(aabb_max),
            dim=dim,
            source_intensity=float(json_get_optional(conf, "source_intensity", 1.0)),
            dirichlet_intensity=float(json_get_optional(conf, "dirichlet_intensity", 1.0)),
            neumann_intensity=float(json_get_optional(conf, "neumann_intensity", 1.0)),
        )

        if self.verbose:
            log_success("Problem: loadConfig completed.")
            for k, v in self.stats.items():
                log_info("  %s = %s", k, v)
            if d_grid is not None:
                log_info("  dirichlet candidate grid: res=%s K=%d coverage=%.0f%%",
                         d_grid.res, d_grid.cand.shape[-1],
                         100 * float(d_grid.coverage))
        return self

    def _load_colors(self, path, n_verts) -> np.ndarray:
        if path and os.path.exists(path):
            if path.endswith(".npz"):
                z = np.load(path)
                if "colors" in z:  # (V, 2, 3)
                    return np.asarray(z["colors"], np.float32)
                left = np.asarray(z["left"], np.float32)
                right = np.asarray(z.get("right", left), np.float32)
                return np.stack([left, right], axis=1)
            return _parse_vertex_colors(path, n_verts)
        if path:
            log_warning("vertex color file missing: %s (using zeros)", path)
        return np.zeros((n_verts, 2, 3), np.float32)
