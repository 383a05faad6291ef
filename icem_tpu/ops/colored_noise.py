"""Colored (1/f^beta) Gaussian noise, generated on device in the rFFT domain.

Reproduces the published power-law PSD algorithm (Timmer & Koenig 1995) that
the reference consumes via the external ``colorednoise`` PyPI package from a
host-side loop (reference: icem/controllers/icem.py:61-82, Pipfile:10):

1. build rFFT frequencies ``f = rfftfreq(n)`` and scale the white spectrum by
   ``f^(-beta/2)``; frequencies below ``fmin`` (default: 1/n, i.e. only the
   DC bin) are clamped to the scale of the first kept bin,
2. draw independent Gaussian real/imag spectral coefficients with that scale,
   zero the imaginary part of DC (and of Nyquist when n is even),
3. inverse rFFT and normalize by the theoretical output std
   ``sigma = 2 * sqrt(sum(w^2)) / n`` with ``w = s_scale[1:]`` and the
   Nyquist weight halved for even n — giving a unit-variance 1/f^beta series.

Unlike the reference's per-CEM-iteration host FFT over numpy arrays, this
runs as one fused XLA program batched over (population, action-dim) and is
differentiable and shard_map-compatible. ``beta`` may be a traced scalar so
one compiled planner serves all noise colors.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

# horizons are tens of steps; a dense DFT-synthesis matmul (MXU) beats the
# generic FFT lowering by a wide margin at these sizes
_MATMUL_IRFFT_MAX_N = 512


@lru_cache(maxsize=None)
def _irfft_synthesis_matrices(n: int):
    """Real matrices (C, D) with irfft(S, n) = Re(S) @ C + Im(S) @ D.

    Standard inverse-rFFT synthesis: y[t] = (1/n) * [S_0 + 2 * sum_{k=1}
    (Re S_k cos(2 pi k t / n) - Im S_k sin(...)) + (even n) S_{n/2} cos(pi t)].
    """
    nf = n // 2 + 1
    k = np.arange(nf)[:, None]
    t = np.arange(n)[None, :]
    ang = 2.0 * np.pi * k * t / n
    coef = np.full((nf, 1), 2.0)
    coef[0] = 1.0
    if n % 2 == 0 and n > 1:
        coef[-1] = 1.0
    # return NUMPY arrays: a jnp conversion here would be staged by whichever
    # trace calls first and the cache would leak that trace's tracer into
    # later traces — constants must be lifted fresh per trace
    C = (coef * np.cos(ang) / n).astype(np.float32)
    D = (-coef * np.sin(ang) / n).astype(np.float32)
    return C, D


def powerlaw_spectrum_scale(n: int, beta, fmin: float = 0.0, dtype=jnp.float32):
    """Per-rFFT-bin std scale ``s_scale`` and normalization ``sigma``.

    n is the number of time samples (static); beta may be traced.
    """
    if n < 1:
        raise ValueError("need at least one sample")
    f = jnp.fft.rfftfreq(n).astype(dtype)  # [n//2 + 1]
    fmin = max(float(fmin), 1.0 / n)

    beta = jnp.asarray(beta, dtype)
    # number of bins strictly below the cutoff; they get clamped to the scale
    # of the first kept bin (reference algorithm's s_scale[:ix] = s_scale[ix])
    ix = jnp.sum(f < fmin)
    ix = jnp.minimum(ix, f.shape[0] - 1)
    f_kept = jnp.take(f, ix)
    f_eff = jnp.where(jnp.arange(f.shape[0]) < ix, f_kept, f)
    # avoid 0^negative at DC when every bin is kept (n == 1)
    f_eff = jnp.maximum(f_eff, jnp.finfo(dtype).tiny)
    s_scale = f_eff ** (-beta / 2.0)

    # theoretical output std of the unnormalized series
    w = s_scale[1:] if n > 1 else s_scale
    if n > 1:
        nyquist_weight = (1.0 + (n % 2)) / 2.0  # halve Nyquist for even n
        w = w.at[-1].multiply(nyquist_weight)
    sigma = 2.0 * jnp.sqrt(jnp.sum(w**2)) / n
    return s_scale, sigma


def shape_white_spectrum(white_real, white_imag, beta, n: int, fmin: float = 0.0):
    """Deterministic core: shape unit-Gaussian spectral draws into 1/f^beta noise.

    white_real/white_imag: [..., n//2 + 1] standard-normal draws.
    Returns [..., n] unit-variance colored noise. Split out from the sampler
    so parity tests can inject identical white draws into an independent
    reference implementation.
    """
    dtype = white_real.dtype
    s_scale, sigma = powerlaw_spectrum_scale(n, beta, fmin, dtype=dtype)

    sr = white_real * s_scale
    si = white_imag * s_scale
    # DC must be real; Nyquist must be real for even n. The package then
    # multiplies those real parts by sqrt(2) ("Fix magnitude") so the
    # one-sided bins keep the full spectral power their imaginary halves
    # would have carried (colorednoise.py powerlaw_psd_gaussian).
    nbins = n // 2 + 1
    bin_idx = jnp.arange(nbins)
    real_only = bin_idx == 0
    if n % 2 == 0 and n > 1:
        real_only = real_only | (bin_idx == nbins - 1)
    si = si * (~real_only).astype(dtype)
    sr = sr * jnp.where(real_only, jnp.sqrt(jnp.asarray(2.0, dtype)), 1.0)

    if n <= _MATMUL_IRFFT_MAX_N:
        C, D = _irfft_synthesis_matrices(n)
        # Precision.HIGHEST: default TPU matmul precision lowers f32 to bf16
        # passes, which would break the exact colorednoise-package parity this
        # module guarantees (~1e-3 relative drift). The matrices are tiny.
        y = (jnp.matmul(sr.astype(jnp.float32), C,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
             + jnp.matmul(si.astype(jnp.float32), D,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)).astype(dtype)
    else:
        spectrum = jax.lax.complex(sr.astype(jnp.float32), si.astype(jnp.float32))
        y = jnp.fft.irfft(spectrum, n=n, axis=-1).astype(dtype)
    return y / sigma.astype(dtype)


def powerlaw_psd_gaussian(key, beta, shape, fmin: float = 0.0, dtype=jnp.float32):
    """Sample Gaussian 1/f^beta noise with unit variance.

    shape: output shape whose LAST axis is the correlated (time) axis.
    For beta == 0 this reduces (statistically) to white noise.
    """
    n = shape[-1]
    spec_shape = shape[:-1] + (n // 2 + 1,)
    kr, ki = jax.random.split(key)
    white_real = jax.random.normal(kr, spec_shape, dtype)
    white_imag = jax.random.normal(ki, spec_shape, dtype)
    return shape_white_spectrum(white_real, white_imag, beta, n, fmin)


def sample_colored_action_noise(key, beta, num_traj: int, horizon: int, dim: int,
                                dtype=jnp.float32):
    """Noise for action sequences: temporally correlated along the horizon.

    Returns [num_traj, horizon, dim]: correlations run along ``horizon``,
    independent per action dimension — the reference samples with shape
    (p, d, h) and transposes to (p, h, d) (icem/controllers/icem.py:68-75).
    """
    noise = powerlaw_psd_gaussian(key, beta, (num_traj, dim, horizon), dtype=dtype)
    return jnp.swapaxes(noise, -1, -2)
