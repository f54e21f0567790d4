"""Literal reference goldens for the von Mises mixture and its gradients.

Ports the exact expected values from the reference's (commented-out)
Catch2 suite, test/distribution_test.cu:39-176.  Those tests target the
angle-parameterized VMM generation (3 raw values per component:
lambda_raw, kappa_raw, mu_raw with activations lambda = exp, kappa = exp,
mu = 2*pi*sigmoid) — the numeric pin is on the SAME von Mises evaluation
(util/vonmises.h) and the same mixture-weight gradient derivation
(distribution.h:200-264) that the production 4-parameter (x, y) code
shares, so agreement here catches any shared systematic error in pdf and
gradient that finite-difference self-consistency cannot
(tests/test_distributions.py checks FD only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elaina_tpu.solver.distributions import (
    bessel_i1_over_i0,
    log_bessel_i,
    vm_eval,
)

M_PI_4 = np.pi / 4.0


def vm_pdf_angle(theta, mu, kappa):
    """VMKernel::pdf (vonmises.h:120-209): e^{k cos(t-mu)} / (2 pi I0(k))."""
    return vm_eval(jnp.cos(theta - mu), kappa)


def vmm_angle_pdf(theta, lam, kappa, mu):
    """Angle-parameterized mixture pdf, weights w_i = lam_i / sum(lam)."""
    w = lam / jnp.sum(lam)
    return jnp.sum(w * vm_pdf_angle(theta, mu, kappa))


def params_from_raw(data):
    """distribution_test-era activations: exp / exp / 2*pi*sigmoid."""
    raw = jnp.asarray(data, jnp.float32).reshape(-1, 3)
    lam = jnp.exp(raw[:, 0])
    kappa = jnp.exp(raw[:, 1])
    mu = 2.0 * jnp.pi * jax.nn.sigmoid(raw[:, 2])
    return lam, kappa, mu


class TestVMKernelGoldens:
    """distribution_test.cu:39-133 ("VMKernel")."""

    def test_pdf(self):
        # VMKernel(1.0, 1.45, pi/4).pdf(0.0) (distribution_test.cu:44-52)
        v = float(vm_pdf_angle(jnp.float32(0.0), jnp.float32(M_PI_4),
                               jnp.float32(1.45)))
        assert v == pytest.approx(0.27751895785331726, abs=1e-5)

    def test_pdf_mean_not_normalized(self):
        # mu + 2*pi wraps (distribution_test.cu:56-66)
        v = float(vm_pdf_angle(jnp.float32(0.0),
                               jnp.float32(M_PI_4 + 2 * np.pi),
                               jnp.float32(1.45)))
        assert v == pytest.approx(0.27751895785331726, abs=1e-5)

    def test_d_pdf_d_kappa(self):
        # distribution_test.cu:115-121
        g = float(jax.grad(
            lambda k: vm_pdf_angle(jnp.float32(0.0), jnp.float32(M_PI_4), k)
        )(jnp.float32(1.45)))
        assert g == pytest.approx(0.034295544028282166, abs=1e-5)

    def test_d_pdf_d_mean(self):
        # distribution_test.cu:123-127
        g = float(jax.grad(
            lambda m: vm_pdf_angle(jnp.float32(0.0), m, jnp.float32(1.45))
        )(jnp.float32(M_PI_4)))
        assert g == pytest.approx(-0.284541517496109, abs=1e-5)

    def test_sampler_circular_stats(self):
        # distribution_test.cu:72-92: circular mean ~ mu, circular variance
        # ~ 1 - I1(k)/I0(k) over 1e6 samples
        from elaina_tpu.solver.distributions import vm_sample_angle

        kappa = jnp.float32(1.45)
        n = 1 << 20
        theta = vm_sample_angle(
            jax.random.PRNGKey(42), jnp.full((n,), kappa)) + M_PI_4
        c, s = float(jnp.mean(jnp.cos(theta))), float(jnp.mean(jnp.sin(theta)))
        mean = np.arctan2(s, c)
        assert mean == pytest.approx(M_PI_4, abs=1e-2)
        var = 1.0 - np.hypot(c, s)
        theoretical = 1.0 - float(
            jnp.exp(log_bessel_i(jnp.float32(kappa), 1)
                    - log_bessel_i(jnp.float32(kappa), 0)))
        assert var == pytest.approx(theoretical, rel=0.01)


class TestVMMGoldens:
    """distribution_test.cu:136-162 ("VMM")."""

    def test_uniform_raw_pdf(self):
        # VMM<1> from zeros: lambda=1, kappa=1, mu=pi -> pdf(0) =
        # e^{-1} / (2 pi I0(1)) (distribution_test.cu:138-144)
        lam, kappa, mu = params_from_raw([0.0, 0.0, 0.0])
        v = float(vmm_angle_pdf(jnp.float32(0.0), lam, kappa, mu))
        assert v == pytest.approx(0.04624549299478531, abs=1e-5)

    def test_two_component_grads(self):
        # VMM<2> from zeros (distribution_test.cu:146-161): symmetric
        # components; golden per-component gradient values
        data = [0.0] * 6
        lam, kappa, mu = params_from_raw(data)

        def pdf(lam, kappa, mu):
            return vmm_angle_pdf(jnp.float32(0.0), lam, kappa, mu)

        v = float(pdf(lam, kappa, mu))
        assert v == pytest.approx(0.04624549299478531, abs=1e-5)
        g_lam, g_kap, g_mu = jax.grad(pdf, argnums=(0, 1, 2))(lam, kappa, mu)
        out = np.stack([np.asarray(g_lam), np.asarray(g_kap),
                        np.asarray(g_mu)], axis=-1).reshape(-1)
        # output[1] (d/dkappa comp 0) and output[2] (d/dmean comp 0)
        assert out[1] == pytest.approx(0.5 * -0.06688901782035828, abs=1e-5)
        assert out[2] == pytest.approx(0.5 * 4.042909562684827e-09, abs=1e-5)
        assert out[0] == pytest.approx(0.0, abs=1e-5)
        # symmetry between the two identical components
        np.testing.assert_allclose(out[:3], out[3:], rtol=1e-3, atol=1e-8)


class TestVMM9Golden:
    """distribution_test.cu:164-176 ("VMM 2"): the 9-element gradient
    golden — the one numeric pin SURVEY.md §4 singles out."""

    DATA = [-0.3391095697879791, 1.3653955459594727, -0.11165934801101685,
            0.7329881191253662, 1.1205719709396362, -1.145609736442566,
            1.5198860168457031, -0.962236225605011, 1.4103161096572876]
    EXPECTED_PDF = 0.11850630
    EXPECTED_GRADS = [
        -0.016046222299337387, -5.7009561714949086e-05,
        -2.110011519107502e-05,
        -0.011129779741168022, -0.007846416905522346, -0.031608663499355316,
        0.00756735447794199, 0.015586040914058685, 0.0389787033200264]

    def test_pdf_and_gradients(self):
        lam, kappa, mu = params_from_raw(self.DATA)

        def pdf(lam, kappa, mu):
            return vmm_angle_pdf(jnp.float32(0.0), lam, kappa, mu)

        v = float(pdf(lam, kappa, mu))
        assert v == pytest.approx(self.EXPECTED_PDF, abs=1e-5)

        g_lam, g_kap, g_mu = jax.grad(pdf, argnums=(0, 1, 2))(lam, kappa, mu)
        out = np.stack([np.asarray(g_lam), np.asarray(g_kap),
                        np.asarray(g_mu)], axis=-1).reshape(-1)
        np.testing.assert_allclose(out, np.asarray(self.EXPECTED_GRADS),
                                   atol=1e-5)


class TestProductionParity:
    """The production 4-param (x, y) path shares vm_eval with the angle
    form: pin vmm_pdf against the same Bessel normalization."""

    def test_vmm_pdf_matches_angle_form(self):
        from elaina_tpu.solver.distributions import vmm_from_raw, vmm_pdf

        rng = np.random.default_rng(7)
        raw = rng.normal(size=(1, 33)).astype(np.float32)
        vmm = vmm_from_raw(jnp.asarray(raw), 2)
        theta = 0.37
        wi = jnp.asarray([[np.cos(theta), np.sin(theta)]], jnp.float32)
        p = float(vmm_pdf(vmm, wi, 2)[0])

        lam = np.asarray(vmm.lam)[0]
        kappa = np.asarray(vmm.kappa)[0]
        mu_ang = np.arctan2(np.asarray(vmm.mu)[0, :, 1],
                            np.asarray(vmm.mu)[0, :, 0])
        ref = float(vmm_angle_pdf(jnp.float32(theta), jnp.asarray(lam),
                                  jnp.asarray(kappa), jnp.asarray(mu_ang)))
        assert p == pytest.approx(ref, rel=1e-4)
