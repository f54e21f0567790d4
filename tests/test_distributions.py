"""Numeric parity tests for the distribution layer.

Golden values mirror the reference test suite (test/beta_test.cu:6-46,
test/vonmises_test.cu:5-148 — the commented goldens are exact expected
values) plus statistical sampler checks in the same style.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elaina_tpu.solver import distributions as D
from elaina_tpu.solver import green as G
from elaina_tpu.solver import sampling as S


def test_log_bessel_goldens():
    # test/vonmises_test.cu:11-22
    x = jnp.array([1.0, 2.0, 3.0, 4.0])
    expected = np.array([0.23591432, 0.82399356, 1.58530772, 2.42497277])
    # XLA's fast f32 log costs ~3e-5 relative accuracy vs libm; tolerate it.
    got = np.asarray(D.log_bessel_i(x, 0))
    np.testing.assert_allclose(got, expected, rtol=2e-4)


def test_von_mises_log_prob_goldens():
    # test/vonmises_test.cu:49-70: kappa=4.2, angles [-2,-1,0,1,2]
    kappa = 4.2
    angles = jnp.array([-2.0, -1.0, 0.0, 1.0, 2.0])
    expected_log = np.array([-6.18411160, -2.16702533, -0.23629522, -2.16702533, -6.18411160])
    expected_p = np.array([0.00206193, 0.11451776, 0.78954756, 0.11451776, 0.00206193])
    got_log = np.asarray(D.vm_log_eval(jnp.cos(angles), kappa))
    got_p = np.asarray(D.vm_eval(jnp.cos(angles), kappa))
    np.testing.assert_allclose(got_log, expected_log, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got_p, expected_p, rtol=5e-4)


def test_von_mises_d_log_d_kappa_goldens():
    # test/vonmises_test.cu:124-148
    got_small = float(D.vm_d_log_eval_d_kappa(jnp.cos(0.5), jnp.float32(1.45)))
    assert got_small == pytest.approx(0.29405486583709717, rel=2e-4)
    got_large = float(D.vm_d_log_eval_d_kappa(jnp.cos(0.5), jnp.float32(14.5)))
    assert got_large == pytest.approx(-0.08729398250579834, rel=2e-3, abs=2e-4)


def _circular_stats(theta):
    c = np.mean(np.cos(theta))
    s = np.mean(np.sin(theta))
    mean = math.atan2(s, c)
    var = 1.0 - math.hypot(c, s)
    return mean, var


@pytest.mark.parametrize("kappa,n,tol", [(145.0, 10_000, 0.05), (1.45, 200_000, 0.02)])
def test_von_mises_sampler_stats(kappa, n, tol):
    # test/vonmises_test.cu:72-122: circular mean ~ 0, variance ~ 1 - I1/I0
    key = jax.random.PRNGKey(42)
    theta = np.asarray(D.vm_sample_angle(key, jnp.full((n,), kappa)))
    mean, var = _circular_stats(theta)
    assert abs(mean) < 0.1
    theoretical = 1.0 - float(D.bessel_i1_over_i0(jnp.float32(kappa)))
    assert var == pytest.approx(theoretical, rel=tol, abs=1e-3)


def test_vm_pdf_normalizes():
    theta = jnp.linspace(-math.pi, math.pi, 4097)[:-1]
    for kappa in [0.0, 0.5, 1.45, 14.5, 145.0]:
        p = D.vm_eval(jnp.cos(theta), jnp.float32(kappa))
        integral = float(jnp.mean(p) * 2 * math.pi)
        assert integral == pytest.approx(1.0, rel=2e-3)


def test_vmf_pdf_normalizes_and_samples():
    # vMF depends only on cos(theta): integral = 2*pi * int_{-1}^{1} p(c) dc
    c = jnp.linspace(-1.0, 1.0, 200_001)
    for kappa in [0.0, 1.0, 10.0, 100.0]:
        p = D.vmf_eval(c, jnp.float32(kappa))
        integral = float(jnp.trapezoid(p, c) * 2 * math.pi)
        assert integral == pytest.approx(1.0, rel=2e-3)
    # sample mean cosine matches coth(k) - 1/k
    kappa = 5.0
    samples = D.vmf_sample_local(jax.random.PRNGKey(1), jnp.full((100_000,), kappa))
    mean_cos = float(jnp.mean(samples[..., 2]))
    expected = 1.0 / math.tanh(kappa) - 1.0 / kappa
    assert mean_cos == pytest.approx(expected, abs=5e-3)


def test_beta_eval_goldens():
    # test/beta_test.cu:6-46
    cases = [
        (1.0, 1.0, 0.5, 1.0),
        (2.0, 2.0, 0.5, 1.5),
        (0.5, 0.5, 0.5, 0.6366197723675814),
        (2.0, 5.0, 0.2, 2.4576),
        (5.0, 2.0, 0.8, 2.4576),
    ]
    for a, b, x, expected in cases:
        got = float(D.beta_eval(jnp.float32(x), jnp.float32(a), jnp.float32(b)))
        assert got == pytest.approx(expected, rel=1e-3)


@pytest.mark.parametrize("a,b", [(2.0, 5.0), (0.5, 0.5), (5.0, 2.0)])
def test_beta_sampler_moments(a, b):
    key = jax.random.PRNGKey(7)
    x = np.asarray(D.beta_sample(key, jnp.full((100_000,), a), jnp.full((100_000,), b)))
    assert np.all((x >= 0) & (x <= 1))
    assert x.mean() == pytest.approx(a / (a + b), abs=6e-3)
    var = a * b / ((a + b) ** 2 * (a + b + 1))
    assert x.var() == pytest.approx(var, rel=0.05)


def test_green_values():
    # green.h: eval/norm closed forms
    assert float(G.green_eval(jnp.float32(0.5), jnp.float32(1.0), 2)) == pytest.approx(
        math.log(2.0) / (2 * math.pi), rel=1e-6
    )
    assert float(G.green_norm(jnp.float32(2.0), 2)) == pytest.approx(1.0)
    assert float(G.green_eval(jnp.float32(0.5), jnp.float32(1.0), 3)) == pytest.approx(
        1.0 / (4 * math.pi), rel=1e-6
    )
    assert float(G.green_norm(jnp.float32(3.0), 3)) == pytest.approx(1.5)


@pytest.mark.parametrize("dim", [2, 3])
def test_green_radius_sampler_histogram(dim):
    R = 2.0
    n = 400_000
    u = jax.random.uniform(jax.random.PRNGKey(3), (n, 3))
    r, pdf = G.green_sample_radius(u, jnp.float32(R), dim)
    r = np.asarray(r)
    # the returned pdf is the radial density at r
    np.testing.assert_allclose(
        np.asarray(pdf), np.asarray(G.green_pdf_radius(jnp.asarray(r), R, dim)), rtol=1e-5
    )
    hist, edges = np.histogram(r, bins=40, range=(0, R), density=True)
    centers = 0.5 * (edges[1:] + edges[:-1])
    expected = np.asarray(G.green_pdf_radius(jnp.asarray(centers), R, dim))
    np.testing.assert_allclose(hist, expected, atol=0.03)


def test_vmm_build_pdf_sample():
    dim = 2
    key = jax.random.PRNGKey(11)
    raw = 0.5 * jax.random.normal(key, (4, D.n_dim_output(dim)))
    vmm = D.vmm_from_raw(raw, dim)
    # weights normalized
    np.testing.assert_allclose(np.asarray(jnp.sum(vmm.weight, -1)), 1.0, rtol=1e-5)
    # pdf integrates to 1 on the circle
    theta = jnp.linspace(-math.pi, math.pi, 2049)[:-1]
    dirs = jnp.stack([jnp.cos(theta), jnp.sin(theta)], -1)
    for i in range(4):
        one = jax.tree.map(lambda a: a[i], vmm)
        p = jax.vmap(lambda d: D.vmm_pdf(one, d, dim))(dirs)
        assert float(jnp.mean(p) * 2 * math.pi) == pytest.approx(1.0, rel=5e-3)
    # sampling statistics match the pdf (chi^2-ish histogram check, comp 0)
    one = jax.tree.map(lambda a: jnp.broadcast_to(a[0], (200_000,) + a.shape[1:]), vmm)
    samples = D.vmm_sample(jax.random.PRNGKey(5), one, dim)
    angles = np.arctan2(np.asarray(samples[:, 1]), np.asarray(samples[:, 0]))
    hist, edges = np.histogram(angles, bins=64, range=(-math.pi, math.pi), density=True)
    centers = 0.5 * (edges[1:] + edges[:-1])
    cdirs = jnp.stack([jnp.cos(jnp.asarray(centers)), jnp.sin(jnp.asarray(centers))], -1)
    single = jax.tree.map(lambda a: a[0], vmm)
    expected = np.asarray(jax.vmap(lambda d: D.vmm_pdf(single, d, dim))(cdirs))
    np.testing.assert_allclose(hist, expected, atol=0.05, rtol=0.2)


def test_vmm_3d_pdf_and_sample():
    dim = 3
    raw = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (D.n_dim_output(dim),))
    vmm = D.vmm_from_raw(raw, dim)
    dirs = S.uniform_sample_sphere(jax.random.PRNGKey(3), (200_000,), 3)
    p = jax.vmap(lambda d: D.vmm_pdf(vmm, d, dim))(dirs)
    assert float(jnp.mean(p) * 4 * math.pi) == pytest.approx(1.0, rel=3e-2)
    big = jax.tree.map(lambda a: jnp.broadcast_to(a, (50_000,) + a.shape), vmm)
    s = D.vmm_sample(jax.random.PRNGKey(4), big, dim)
    norms = np.asarray(jnp.linalg.norm(s, axis=-1))
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    # sample mean direction should align with pdf mean direction
    mean_dir = np.asarray(jnp.mean(s, axis=0))
    expected_dir = np.asarray(jnp.sum(vmm.weight[:, None] * vmm.mu, axis=0))
    cos = float(
        np.dot(mean_dir, expected_dir)
        / (np.linalg.norm(mean_dir) * np.linalg.norm(expected_dir) + 1e-9)
    )
    assert cos > 0.9


def test_vmm_gradients_match_finite_difference():
    """Parity check for the hand-derived reference gradients
    (distribution.h:200-264): autodiff of our pdf w.r.t. raw outputs must
    match finite differences, including the Neumann reflection term."""
    dim = 2
    raw = np.asarray(0.4 * jax.random.normal(jax.random.PRNGKey(9), (D.n_dim_output(dim),)))
    wi = np.array([math.cos(0.7), math.sin(0.7)], np.float32)
    normal = np.array([0.0, 1.0], np.float32)

    def prob(r):
        vmm = D.vmm_from_raw(r, dim)
        return D.vmm_pdf_effective(
            vmm, jnp.asarray(wi), jnp.asarray(True), jnp.asarray(normal), dim
        )

    grad = np.asarray(jax.grad(prob)(jnp.asarray(raw)))
    # f32 evals: use a wide central difference so roundoff noise stays small
    eps = 1e-2
    for i in range(0, D.n_dim_output(dim) - 1, 7):
        rp = raw.copy(); rp[i] += eps
        rm = raw.copy(); rm[i] -= eps
        fd = (float(prob(jnp.asarray(rp))) - float(prob(jnp.asarray(rm)))) / (2 * eps)
        assert grad[i] == pytest.approx(fd, rel=5e-2, abs=5e-4)


def test_activations():
    # train.h:60-79
    assert float(D.act_exp(jnp.float32(20.0))) == pytest.approx(math.exp(15.0), rel=1e-4)
    assert float(D.act_exp(jnp.float32(-20.0))) == pytest.approx(math.exp(-10.0), rel=1e-4)
    assert float(D.act_logistic(jnp.float32(0.0))) == pytest.approx(0.5)


def test_uniform_direction_samplers():
    key = jax.random.PRNGKey(1)
    d2 = S.uniform_sample_sphere(key, (50_000,), 2)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d2), axis=-1), 1.0, atol=1e-5)
    assert abs(float(jnp.mean(d2[:, 0]))) < 0.02
    h3 = S.uniform_sample_hemisphere(key, (50_000,), 3)
    assert float(jnp.min(h3[:, 2])) >= 0.0
    assert float(jnp.mean(h3[:, 2])) == pytest.approx(0.5, abs=0.01)
    h2 = S.uniform_sample_hemisphere(key, (50_000,), 2)
    assert float(jnp.min(h2[:, 1])) >= -1e-6
