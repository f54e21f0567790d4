"""Directional and radial distributions for walk guiding.

TPU-native counterparts of:

* modified-Bessel / von Mises on the circle   — util/vonmises.h:18-209
* von Mises-Fisher on the sphere              — util/vmf.h:21-84
* Beta (via Gamma)                            — util/beta.h:11-81
* network-output activations                  — integrator/guided/train.h:50-106
* vMF mixture (VMM) build / pdf / sample      — integrator/guided/distribution.h:133-444

Everything is batched pure JAX.  Data-dependent rejection loops in the
reference (Best-Fisher von Mises sampler, Marsaglia-Tsang Gamma) become
whole-batch ``lax.while_loop``s that iterate until every lane has accepted
(with a safety cap): lanes run in lockstep on the VPU, and the loop count is
the *maximum* geometric trial count over the batch, which is small because
acceptance rates are >= ~0.66.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.mathops import (
    frame_from_normal_3d,
    frame_from_tangent_2d,
    reflect,
    to_world_2d,
    to_world_3d,
)

M_2PI = 2.0 * math.pi
M_4PI = 4.0 * math.pi
M_EPSILON = 1e-5  # krrmath/constants.h:19

# ---------------------------------------------------------------------------
# Modified Bessel functions I0 / I1 (log), Abramowitz & Stegun 9.8.1-9.8.4
# polynomial fits — the same classical approximation the reference uses
# (util/vonmises.h:18-93); the coefficients are the standard published ones.
# ---------------------------------------------------------------------------

# numpy, not jnp: a module-level device array would initialize the JAX
# backend at import time (jnp consumes numpy constants inside jit freely)
_I0_SMALL = np.array(
    [1.0, 3.5156229, 3.0899424, 1.2067492, 0.2659732, 0.360768e-1, 0.45813e-2],
    np.float32,
)
_I1_SMALL = np.array(
    [0.5, 0.87890594, 0.51498869, 0.15084934, 0.2658733e-1, 0.301532e-2,
     0.32411e-3], np.float32,
)
_I0_LARGE = np.array(
    [0.39894228, 0.1328592e-1, 0.225319e-2, -0.157565e-2, 0.916281e-2,
     -0.2057706e-1, 0.2635537e-1, -0.1647633e-1, 0.392377e-2], np.float32,
)
_I1_LARGE = np.array(
    [0.39894228, -0.3988024e-1, -0.362018e-2, 0.163801e-2, -0.1031555e-1,
     0.2282967e-1, -0.2895312e-1, 0.1787654e-1, -0.420059e-2], np.float32,
)


def _eval_poly(y, coeffs):
    """Horner evaluation, matching evalPoly (util/vonmises.h:64-73)."""
    ret = coeffs[-1]
    for c in coeffs[-2::-1]:
        ret = c + y * ret
    return ret


def log_bessel_i(x, order: int = 0):
    """log I_order(x) for order in {0, 1} (util/vonmises.h:75-93)."""
    coeffs_small = _I0_SMALL if order == 0 else _I1_SMALL
    coeffs_large = _I0_LARGE if order == 0 else _I1_LARGE

    y = (x / 3.75) ** 2
    small = _eval_poly(y, coeffs_small)
    if order == 1:
        small = jnp.abs(x) * small
    small = jnp.log(jnp.maximum(small, 1e-30))

    xs = jnp.maximum(x, 1e-6)  # guard the large branch when it is not taken
    y2 = 3.75 / xs
    large = xs - 0.5 * jnp.log(xs) + jnp.log(jnp.maximum(_eval_poly(y2, coeffs_large), 1e-30))
    return jnp.where(x < 3.75, small, large)


def bessel_i1_over_i0(kappa):
    """I1(kappa)/I0(kappa), the mean resultant length of a von Mises."""
    return jnp.exp(log_bessel_i(kappa, 1) - log_bessel_i(kappa, 0))


# ---------------------------------------------------------------------------
# von Mises on the circle (2D directions)
# ---------------------------------------------------------------------------


def vm_log_eval(cos_theta, kappa):
    """log VM pdf vs cos(angle to mean) (util/vonmises.h:128-133)."""
    return kappa * cos_theta - math.log(M_2PI) - log_bessel_i(kappa, 0)


def vm_eval(cos_theta, kappa):
    """VM pdf; kappa < 1e-3 falls back to uniform (util/vonmises.h:176-183)."""
    return jnp.where(kappa < 1e-3, 1.0 / M_2PI, jnp.exp(vm_log_eval(cos_theta, kappa)))


def vm_d_log_eval_d_kappa(cos_theta, kappa):
    """d log VM / d kappa = cos(theta) - I1/I0 (util/vonmises.h:135-169).

    The reference differentiates the Bessel polynomial directly; the identity
    I0'(k) = I1(k) gives the same value through the fitted ratio.
    """
    return cos_theta - bessel_i1_over_i0(kappa)


def vm_d_eval_d_kappa(cos_theta, kappa):
    """util/vonmises.h:171-174."""
    return vm_eval(cos_theta, kappa) * vm_d_log_eval_d_kappa(cos_theta, kappa)


def _vm_proposal_r(kappa):
    """Best-Fisher wrapped-Cauchy proposal parameter (util/vonmises.h:197-204)."""
    kappa = jnp.asarray(kappa, jnp.float64) if jax.config.read("jax_enable_x64") else kappa
    tau = 1.0 + jnp.sqrt(1.0 + 4.0 * kappa * kappa)
    rho = (tau - jnp.sqrt(2.0 * tau)) / (2.0 * jnp.maximum(kappa, 1e-20))
    r = (1.0 + rho * rho) / (2.0 * jnp.maximum(rho, 1e-20))
    r_taylor = 1.0 / jnp.maximum(kappa, 1e-20) + kappa
    return jnp.where(kappa < 1e-5, r_taylor, r)


def vm_sample_angle(key, kappa, trials: int = 8):
    """Sample angles (relative to the mean) from VM(kappa), batched.

    Best-Fisher rejection (util/vonmises.h:95-118) with a FIXED trial
    count, all randomness drawn in one threefry call: the reference's
    unbounded loop maps to a lockstep ``while_loop`` on TPU whose expected
    trip count is ~log(batch)/log(1/(1-p)) ≈ 10-12 at 65k lanes (it runs
    until EVERY lane accepts), each trip costing 3 key splits + a batch of
    transcendentals.  Acceptance is ≥ ~0.66 for all kappa, so 8 trials
    leave < 2e-4 of lanes unaccepted — those fall back to their last
    proposal angle (bias far below the statistical-test resolution).
    kappa < 1e-3 lanes return a uniform angle.
    ``kappa``: (...,) -> angles in [-pi, pi).
    """
    shape = jnp.shape(kappa)
    proposal_r = _vm_proposal_r(kappa)

    key, k_uni = jax.random.split(key)
    u = jax.random.uniform(key, shape + (trials, 3))
    u1 = u[..., 0]
    u2 = jnp.maximum(u[..., 1], 1e-12)
    u3 = u[..., 2]
    z = jnp.cos(math.pi * u1)                          # (..., T)
    f = (1.0 + proposal_r[..., None] * z) / (proposal_r[..., None] + z)
    c = kappa[..., None] * (proposal_r[..., None] - f)
    accept = ((c * (2.0 - c) - u2) > 0.0) | (
        (jnp.log(c / u2) + 1.0 - c) >= 0.0)
    # first accepted trial (or the last trial when none accepted)
    first = jnp.argmax(accept, axis=-1)
    pick = jnp.where(jnp.any(accept, axis=-1), first, trials - 1)
    onehot = pick[..., None] == jnp.arange(trials)
    f_sel = jnp.sum(jnp.where(onehot, f, 0.0), axis=-1)
    u3_sel = jnp.sum(jnp.where(onehot, u3, 0.0), axis=-1)
    theta = jnp.mod(
        jnp.sign(u3_sel - 0.5) * jnp.arccos(jnp.clip(f_sel, -1.0, 1.0))
        + math.pi, M_2PI) - math.pi
    uniform_theta = M_2PI * jax.random.uniform(k_uni, shape) - math.pi
    return jnp.where(kappa < 1e-3, uniform_theta, theta)


def vm_sample(key, kappa, mu):
    """2D unit-vector samples around mean direction ``mu`` (util/vonmises.h:185-194)."""
    theta = vm_sample_angle(key, kappa)
    local = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    return to_world_2d(frame_from_tangent_2d(mu), local)


# ---------------------------------------------------------------------------
# von Mises-Fisher on S^2 (3D directions) — Jakob [2012] stable forms
# (util/vmf.h:27-55)
# ---------------------------------------------------------------------------


def vmf_eval(cos_theta, kappa):
    safe = jnp.maximum(kappa, M_EPSILON)
    val = jnp.exp(safe * jnp.minimum(0.0, cos_theta - 1.0)) * safe / (
        M_2PI * (1.0 - jnp.exp(-2.0 * safe))
    )
    return jnp.where(kappa < M_EPSILON, 1.0 / M_4PI, val)


def vmf_sample_local(key, kappa, shape=None):
    """Sample vMF around +z; kappa < eps falls back to the uniform sphere."""
    if shape is None:
        shape = jnp.shape(kappa)
    k1, k2 = jax.random.split(key)
    u0 = jax.random.uniform(k1, shape)
    u1 = jax.random.uniform(k2, shape)
    safe = jnp.maximum(kappa, M_EPSILON)
    cos_theta = 1.0 + jnp.log1p(-u0 + jnp.exp(-2.0 * safe) * u0) / safe
    uniform_cos = 1.0 - 2.0 * u0
    cos_theta = jnp.where(kappa < M_EPSILON, uniform_cos, cos_theta)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = M_2PI * u1
    return jnp.stack(
        [jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta], axis=-1
    )


def vmf_sample(key, kappa, mu):
    local = vmf_sample_local(key, kappa)
    return to_world_3d(frame_from_normal_3d(mu), local)


# ---------------------------------------------------------------------------
# Gamma / Beta sampling (util/beta.h:21-80)
# ---------------------------------------------------------------------------


def gamma_sample(key, shape_param, max_iters: int = 64):
    """Marsaglia-Tsang Gamma(shape, 1) sampler, batched.

    shape < 1 uses the boost identity Gamma(a) = Gamma(a+1) * U^{1/a}
    instead of the reference's second rejection loop (util/beta.h:46-58) —
    exact and loop-free.
    """
    bshape = jnp.shape(shape_param)
    boosted = jnp.where(shape_param < 1.0, shape_param + 1.0, shape_param)
    d = boosted - 1.0 / 3.0
    c = 1.0 / jnp.sqrt(9.0 * d)

    def cond(state):
        i, _, accepted, _ = state
        return (i < max_iters) & (~jnp.all(accepted))

    def body(state):
        i, k, accepted, out = state
        k, k1, k2 = jax.random.split(k, 3)
        z = jax.random.normal(k1, bshape)
        v = (1.0 + c * z) ** 3
        u = jnp.maximum(jax.random.uniform(k2, bshape), 1e-12)
        ok = (v > 0.0) & (
            (u < 1.0 - 0.0331 * z**4)
            | (jnp.log(u) < 0.5 * z * z + d * (1.0 - v + jnp.log(jnp.maximum(v, 1e-30))))
        )
        out = jnp.where(accepted, out, jnp.where(ok, d * v, out))
        accepted = accepted | ok
        return i + 1, k, accepted, out

    key, k_boost = jax.random.split(key)
    init = (jnp.int32(0), key, jnp.zeros(bshape, bool), jnp.ones(bshape, jnp.float32))
    _, _, _, g = jax.lax.while_loop(cond, body, init)

    u_boost = jnp.maximum(jax.random.uniform(k_boost, bshape), 1e-12)
    boost = jnp.where(
        shape_param < 1.0, u_boost ** (1.0 / jnp.maximum(shape_param, 1e-6)), 1.0
    )
    return g * boost


def beta_sample(key, a, b):
    """Beta(a, b) via two Gammas (util/beta.h:21-28)."""
    k1, k2 = jax.random.split(key)
    ga = gamma_sample(k1, a)
    gb = gamma_sample(k2, b)
    return ga / jnp.maximum(ga + gb, 1e-30)


def beta_eval(x, a, b):
    """Beta pdf (util/beta.h:17-19)."""
    log_norm = (
        jax.scipy.special.gammaln(a)
        + jax.scipy.special.gammaln(b)
        - jax.scipy.special.gammaln(a + b)
    )
    return x ** (a - 1.0) * (1.0 - x) ** (b - 1.0) * jnp.exp(-log_norm)


# ---------------------------------------------------------------------------
# Network-output activations (train.h:50-106)
# ---------------------------------------------------------------------------

EXP_CLAMP_MIN = -10.0
EXP_CLAMP_MAX = 15.0


@jax.custom_jvp
def act_exp(x):
    """Exponential activation with clamp (train.h:71-72) — used for lambda,
    kappa.  The reference's hand derivative is exp(clamp(x)) even in the
    saturated region (train.h:95-96) — NOT the true zero gradient of the
    clamp — so saturated components keep receiving updates; mirror that."""
    return jnp.exp(jnp.clip(x, EXP_CLAMP_MIN, EXP_CLAMP_MAX))


@act_exp.defjvp
def _act_exp_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    y = jnp.exp(jnp.clip(x, EXP_CLAMP_MIN, EXP_CLAMP_MAX))
    return y, y * dx


def act_logistic(x):
    """Logistic activation (train.h:69-70) — used for the selection probability."""
    return jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# vMF mixture (VMM) — distribution.h:133-444
#
# Raw layout per lane (matching the network output, parameters.h:16-33):
#   [comp0: lambda, kappa, mu_x, mu_y(, mu_z)] * K, then selection-prob logit.
# ---------------------------------------------------------------------------

NUM_VMF_COMPONENTS = 8  # parameters.h:18/28


class VMM(NamedTuple):
    lam: jnp.ndarray        # (..., K) mixture sizes (post-activation)
    kappa: jnp.ndarray      # (..., K)
    mu: jnp.ndarray         # (..., K, D) normalized means
    mu_orig: jnp.ndarray    # (..., K, D) raw (unnormalized) means
    weight: jnp.ndarray     # (..., K) lam / sum(lam)


def n_dim_vmf(dim: int) -> int:
    return dim + 2  # lambda, kappa, coords (parameters.h:21/31)


def n_dim_output(dim: int) -> int:
    return NUM_VMF_COMPONENTS * n_dim_vmf(dim) + 1


def vmm_from_raw(raw: jnp.ndarray, dim: int) -> VMM:
    """Apply activations and build the mixture (distribution.h:146-168, 289-312)."""
    K, P = NUM_VMF_COMPONENTS, n_dim_vmf(dim)
    comp = raw[..., : K * P].reshape(raw.shape[:-1] + (K, P))
    lam = act_exp(comp[..., 0])
    kappa = act_exp(comp[..., 1])
    mu_orig = comp[..., 2:]
    # Degenerate (near-zero) raw means would normalize to the zero vector and
    # poison sampled directions; fall back to the +x axis for those lanes.
    mu_len = jnp.linalg.norm(mu_orig, axis=-1, keepdims=True)
    fallback = jnp.zeros_like(mu_orig).at[..., 0].set(1.0)
    mu = jnp.where(mu_len > 1e-12, mu_orig / jnp.maximum(mu_len, 1e-12), fallback)
    total = jnp.sum(lam, axis=-1, keepdims=True)
    weight = lam / jnp.maximum(total, 1e-30)
    return VMM(lam=lam, kappa=kappa, mu=mu, mu_orig=mu_orig, weight=weight)


def vmm_selection_prob(raw: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Learned guided-vs-uniform selection probability (guided/integrator.cu:517)."""
    return act_logistic(raw[..., NUM_VMF_COMPONENTS * n_dim_vmf(dim)])


def _component_pdf(cos_theta, kappa, dim: int):
    return vm_eval(cos_theta, kappa) if dim == 2 else vmf_eval(cos_theta, kappa)


def vmm_pdf(vmm: VMM, wi: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Mixture pdf at direction(s) ``wi`` (..., D) (distribution.h:170-178, 314-323)."""
    cos_theta = jnp.sum(vmm.mu * wi[..., None, :], axis=-1)  # (..., K)
    return jnp.sum(vmm.weight * _component_pdf(cos_theta, vmm.kappa, dim), axis=-1)


def vmm_pdf_effective(vmm: VMM, wi, on_neumann, n_normal, dim: int):
    """pdf with Neumann reflection folding: pdf(wi) + pdf(reflect(wi)) on the
    boundary (guided/integrator.cu:720-722, 828-833)."""
    p = vmm_pdf(vmm, wi, dim)
    p_ref = vmm_pdf(vmm, reflect(wi, n_normal), dim)
    return jnp.where(on_neumann, p + p_ref, p)


def vmf_beta_sample(key, kappa, mu, alpha, beta, dim: int):
    """Joint direction x radius sample: vMF/von Mises direction + Beta-
    distributed radial fraction (VMFBetaKernel, distribution.h:69-131 —
    present in the reference as a component but not wired into the
    integrators; kept here for the same parity)."""
    k_dir, k_rad = jax.random.split(key)
    direction = (vm_sample(k_dir, kappa, mu) if dim == 2
                 else vmf_sample(k_dir, kappa, mu))
    radius = beta_sample(k_rad, alpha, beta)
    return direction, radius


def vmf_beta_pdf(wi, r, kappa, mu, alpha, beta, dim: int):
    """Product pdf of VMFBetaKernel (distribution.h:82-87, 114-119)."""
    cos_theta = jnp.sum(wi * mu, axis=-1)
    dir_pdf = vm_eval(cos_theta, kappa) if dim == 2 else vmf_eval(cos_theta, kappa)
    return dir_pdf * beta_eval(r, alpha, beta)


def vmm_sample(key, vmm: VMM, dim: int) -> jnp.ndarray:
    """Sample the mixture: CDF walk over weights, then the chosen component
    (distribution.h:186-198, 332-344)."""
    batch = vmm.weight.shape[:-1]
    k_sel, k_dir = jax.random.split(key)
    u = jax.random.uniform(k_sel, batch)
    cdf = jnp.cumsum(vmm.weight, axis=-1)
    idx = jnp.sum((u[..., None] >= cdf).astype(jnp.int32), axis=-1)
    idx = jnp.minimum(idx, NUM_VMF_COMPONENTS - 1)
    # one-hot component select: take_along_axis lowers to a ~19 ns/lane
    # gather on TPU, a K-way masked sum is pure vector math
    onehot = idx[..., None] == jnp.arange(NUM_VMF_COMPONENTS)
    kappa = jnp.sum(jnp.where(onehot, vmm.kappa, 0.0), axis=-1)
    mu = jnp.sum(jnp.where(onehot[..., None], vmm.mu, 0.0), axis=-2)
    if dim == 2:
        return vm_sample(k_dir, kappa, mu)
    return vmf_sample(k_dir, kappa, mu)
