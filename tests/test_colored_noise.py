"""Colored-noise kernel tests.

Strategy per SURVEY.md §4: (1) exact match against an independent numpy
implementation of the published algorithm spec given identical white draws,
(2) statistical tests: unit variance and PSD log-log slope ~ -beta.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icem_tpu.ops.colored_noise import (
    powerlaw_psd_gaussian,
    sample_colored_action_noise,
    shape_white_spectrum,
)


def numpy_powerlaw_reference(white_real, white_imag, beta, n, fmin=0.0):
    """Clean-room numpy implementation of the Timmer & Koenig power-law PSD
    sampler as specified in SURVEY.md §2.2.1 (the algorithm of the public
    `colorednoise` package the reference depends on)."""
    f = np.fft.rfftfreq(n)
    fmin = max(fmin, 1.0 / n)
    s_scale = np.array(f)
    ix = int(np.sum(s_scale < fmin))
    if ix and ix < len(s_scale):
        s_scale[:ix] = s_scale[ix]
    s_scale = s_scale ** (-beta / 2.0)

    w = s_scale[1:].copy()
    w[-1] *= (1 + (n % 2)) / 2.0
    sigma = 2 * np.sqrt(np.sum(w**2)) / n

    sr = white_real * s_scale
    si = white_imag * s_scale
    if not (n % 2):
        si[..., -1] = 0
        sr[..., -1] *= np.sqrt(2)  # package's "Fix magnitude"
    si[..., 0] = 0
    sr[..., 0] *= np.sqrt(2)       # package's "Fix magnitude"
    s = sr + 1j * si
    return np.fft.irfft(s, n=n, axis=-1) / sigma


@pytest.mark.parametrize("beta", [0.25, 1.0, 2.5, 3.5])
@pytest.mark.parametrize("n", [30, 12, 31])
def test_matches_reference_spec_exactly(beta, n):
    rng = np.random.default_rng(0)
    shape = (16, 4, n // 2 + 1)
    wr = rng.standard_normal(shape).astype(np.float32)
    wi = rng.standard_normal(shape).astype(np.float32)

    got = np.asarray(shape_white_spectrum(jnp.array(wr), jnp.array(wi), beta, n))
    want = numpy_powerlaw_reference(wr.astype(np.float64), wi.astype(np.float64), beta, n)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("beta", [0.25, 1.0, 2.5])
@pytest.mark.parametrize("n", [30, 12, 31])
def test_matches_vendored_colorednoise_package(beta, n):
    """Draw-for-draw parity against the VENDORED `colorednoise` package core
    (tests/vendor/colorednoise_vendored.py, MIT) — the artifact the reference
    actually imports, not a paraphrase of its spec.

    The package draws its spectral coefficients via
    ``Generator.normal(scale=s_scale, size=size)`` which consumes exactly the
    same underlying standard normals as ``Generator.normal(size=size)``
    scaled afterwards, so a same-seeded generator recovers the white draws
    the package used; feeding those into our deterministic core must
    reproduce the package output bit-for-tolerance.
    """
    from tests.vendor import colorednoise_vendored as cn

    seed = 1234
    shape = (8, 3, n)
    y_pkg = cn.powerlaw_psd_gaussian(beta, shape, random_state=np.random.default_rng(seed))

    spec_shape = (8, 3, n // 2 + 1)
    rng = np.random.default_rng(seed)
    wr = rng.normal(size=spec_shape)
    wi = rng.normal(size=spec_shape)
    got = np.asarray(shape_white_spectrum(
        jnp.array(wr, jnp.float32), jnp.array(wi, jnp.float32), beta, n))
    np.testing.assert_allclose(got, y_pkg, rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("beta,tol", [(0.0, 0.05), (0.25, 0.05), (2.0, 0.25)])
def test_unit_variance(beta, tol):
    key = jax.random.key(1)
    y = powerlaw_psd_gaussian(key, beta, (4096, 64))
    # the published normalization (colorednoise pkg) excludes the clamped DC
    # bin from sigma but boosts its magnitude by sqrt(2), so the AC part has
    # unit std exactly while the total std runs a few percent high for
    # strongly colored noise — identical to the package the reference uses
    y_ac = y - jnp.mean(y, axis=-1, keepdims=True)
    assert abs(float(jnp.std(y_ac)) - 1.0) < 0.03
    assert abs(float(jnp.std(y)) - 1.0) < tol


def test_psd_slope():
    beta = 2.0
    n = 1024
    y = np.asarray(powerlaw_psd_gaussian(jax.random.key(2), beta, (512, n)))
    psd = np.abs(np.fft.rfft(y, axis=-1)) ** 2
    mean_psd = psd.mean(axis=0)
    f = np.fft.rfftfreq(n)
    sel = slice(2, n // 4)  # avoid clamped DC region and the Nyquist edge
    slope = np.polyfit(np.log(f[sel]), np.log(mean_psd[sel]), 1)[0]
    assert abs(slope + beta) < 0.15


def test_action_noise_orientation():
    """Temporal correlation must run along the horizon axis, not action dim."""
    key = jax.random.key(3)
    noise = sample_colored_action_noise(key, 3.0, num_traj=2048, horizon=32, dim=4)
    assert noise.shape == (2048, 32, 4)
    x = np.asarray(noise)

    def lag1(a, axis):
        a0 = np.take(a, range(a.shape[axis] - 1), axis=axis)
        a1 = np.take(a, range(1, a.shape[axis]), axis=axis)
        return np.corrcoef(a0.ravel(), a1.ravel())[0, 1]

    corr_time = lag1(x, axis=1)
    corr_dim = lag1(x, axis=2)
    assert corr_time > 0.5          # strongly correlated along horizon
    assert abs(corr_dim) < 0.1      # independent across action dims


def test_jit_and_vmap_compose():
    f = jax.jit(lambda k, b: powerlaw_psd_gaussian(k, b, (8, 30)))
    y = f(jax.random.key(0), 2.5)
    assert y.shape == (8, 30)
    ks = jax.random.split(jax.random.key(1), 5)
    ys = jax.vmap(lambda k: powerlaw_psd_gaussian(k, 1.0, (3, 16)))(ks)
    assert ys.shape == (5, 3, 16)
