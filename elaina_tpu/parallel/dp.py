"""Multi-chip scaling: data parallelism over walks via shard_map.

The reference is single-GPU (device 0 hard-selected, core/device/context.cpp:
23-24) — there is no distributed layer to port (SURVEY.md §2.2).  The
TPU-native design shards the *lane* (pixel/walk) axis across a 1-D device
mesh: walks are embarrassingly parallel, scene arrays and network params are
replicated (boundary data is MBs), and the only collectives are
``psum``-style reductions of training gradients / loss statistics over the
mesh — all riding ICI.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.problem import Scene
from ..nn.network import AdamConfig, NetworkSpec, TrainerState, adam_ema_step
from ..solver import guided as G
from ..solver.wost import run_one_sample

AXIS = "data"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (AXIS,))


def shard_lanes(mesh: Mesh, *arrays):
    """Place lane-major arrays with the lane axis split across the mesh."""
    out = []
    for a in arrays:
        spec = P(AXIS, *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out) if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def sharded_uniform_sample(mesh: Mesh, scene: Scene, eval_points, mask, key,
                           *, eps: float, max_depth: int, d_stack: int = 48,
                           n_stack: int = 48):
    """One spp of the uniform solver with lanes sharded over the mesh.

    Pure map — no cross-walk coupling, so no collectives (SURVEY.md §2.2
    "TPU-native equivalent").
    """
    n_dev = mesh.devices.size

    def local(pts, m, k):
        # decorrelate per-shard RNG streams
        k = jax.random.fold_in(k, jax.lax.axis_index(AXIS))
        contrib, steps = run_one_sample(scene, pts, m, k, eps=eps,
                                        max_depth=max_depth, d_stack=d_stack,
                                        n_stack=n_stack)
        return contrib, jax.lax.psum(steps, AXIS)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS), None),
        out_specs=(P(AXIS, None), P()),
        check_vma=False,
    )
    assert eval_points.shape[0] % n_dev == 0, "lane count must divide mesh size"
    return fn(eval_points, mask, key)


def sharded_guided_spp(mesh: Mesh, scene: Scene, spec: NetworkSpec,
                       infer_params, eval_points, mask, key, training_on,
                       uniform_fraction, max_guided_depth, *, eps: float,
                       max_depth: int, d_stack: int = 48, n_stack: int = 48):
    """One guided spp sweep sharded over lanes; records stay sharded."""

    def local(params, pts, m, k, ton, uf, mgd):
        k = jax.random.fold_in(k, jax.lax.axis_index(AXIS))
        contrib, rec, steps = G.run_one_guided_sample(
            scene, spec, params, pts, m, k, jnp.bool_(True), ton, uf, mgd,
            eps=eps, max_depth=max_depth, d_stack=d_stack, n_stack=n_stack)
        return contrib, rec, jax.lax.psum(steps, AXIS)

    rec_spec = jax.tree.map(
        lambda _: P(None, AXIS), G.init_records(1, scene.dim),
    )._replace(cur=P(AXIS))
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(AXIS, None), P(AXIS), P(), P(), P(), P()),
        out_specs=(P(AXIS, None), rec_spec, P()),
        check_vma=False,
    )
    return fn(infer_params, eval_points, mask, key, training_on,
              uniform_fraction, max_guided_depth)


def _loss_sums(params, spec, dim, x, wi, Li, dir_pdf, on_neumann, normal,
               valid):
    """Sum-form of the guided objective for cross-shard psum-averaging."""
    from ..solver.distributions import (
        M_EPSILON, vmm_from_raw, vmm_pdf, vmm_selection_prob)
    from ..solver.sampling import (
        uniform_sample_hemisphere_pdf, uniform_sample_sphere_pdf)
    from ..utils.mathops import reflect
    from ..nn.network import apply_network

    raw = apply_network(spec, params, x)
    vmm = vmm_from_raw(raw, dim)
    p = vmm_pdf(vmm, wi, dim)
    p_r = vmm_pdf(vmm, reflect(wi, normal), dim)
    guide_pdf = jnp.where(on_neumann, p + p_r, p) + M_EPSILON
    sp = vmm_selection_prob(raw, dim)
    dir_pdf = dir_pdf + M_EPSILON
    kl = -Li / dir_pdf * jnp.log(guide_pdf)
    uniform_pdf = jnp.where(on_neumann, uniform_sample_hemisphere_pdf(dim),
                            uniform_sample_sphere_pdf(dim))
    sp_term = (-G.SELECTION_MIS_E) * Li * (
        jax.lax.stop_gradient(guide_pdf) - uniform_pdf) / (dir_pdf**2) * sp
    return jnp.sum(jnp.where(valid, kl + sp_term, 0.0)), jnp.sum(
        jnp.where(valid, kl, 0.0))


def sharded_train_on_records(mesh: Mesh, trainer: TrainerState,
                             spec: NetworkSpec, adam_cfg: AdamConfig,
                             scene: Scene, records, *, batch_size: int,
                             n_batches: int):
    """Data-parallel training step: per-shard gradients, psum-mean over the
    mesh, replicated Adam+EMA update."""
    dim = scene.dim

    def local(tr, rec):
        R, n_local = rec.dir_pdf.shape
        total = R * n_local
        r_idx = jnp.broadcast_to(jnp.arange(R)[:, None], (R, n_local))
        base_valid = (r_idx < rec.cur[None, :]).reshape(total)
        pos = rec.pos.reshape(total, dim)
        x = G.normalize_coord(pos, scene.aabb_lo, scene.aabb_hi)
        wi = rec.dir.reshape(total, dim)
        dir_pdf = rec.dir_pdf.reshape(total)
        thp = rec.thp.reshape(total)
        sol = rec.sol.reshape(total, 3)
        on_b = rec.on_neumann.reshape(total)
        normal = rec.normal.reshape(total, dim)
        sol_n = jnp.where(jnp.abs(thp)[:, None] > 1e-5,
                          sol / thp[:, None], 0.0)
        Li = jnp.mean(jnp.abs(sol_n), axis=-1)
        in_aabb = jnp.all((pos >= scene.aabb_lo) & (pos <= scene.aabb_hi), -1)
        valid = (base_valid & in_aabb & (dir_pdf > 0) & jnp.isfinite(Li))

        local_batch = max(1, batch_size // mesh.devices.size)
        grad_fn = jax.grad(lambda p, *a: _loss_sums(p, spec, dim, *a)[0])

        def body(i, carry):
            tr, metric = carry
            start = i * local_batch

            def sl(a):
                return jax.lax.dynamic_slice_in_dim(a, start,
                                                    min(local_batch, total), 0)

            v = sl(valid)
            grads = grad_fn(tr.params, sl(x), sl(wi), sl(Li), sl(dir_pdf),
                            sl(on_b), sl(normal), v)
            _, kl_sum = _loss_sums(tr.params, spec, dim, sl(x), sl(wi),
                                   sl(Li), sl(dir_pdf), sl(on_b), sl(normal), v)
            count = jax.lax.psum(jnp.sum(v.astype(jnp.float32)), AXIS)
            count = jnp.maximum(count, 1.0)
            grads = jax.tree.map(lambda g: jax.lax.psum(g, AXIS) / count, grads)
            tr = adam_ema_step(tr, grads, adam_cfg)
            metric = metric + jax.lax.psum(kl_sum, AXIS) / count
            return tr, metric

        tr, metric = jax.lax.fori_loop(0, n_batches, body,
                                       (tr, jnp.float32(0.0)))
        return tr, metric / n_batches

    rec_in_spec = jax.tree.map(lambda _: P(None, AXIS), records)._replace(
        cur=P(AXIS))
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), rec_in_spec),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(trainer, records)
