"""Pallas rollout kernel (ops/planar_rollout.py) — TPU-only correctness.

The CI suite forces CPU (conftest), where Pallas-TPU is unavailable; these
tests self-skip there and run when invoked on a TPU host:

    JAX_PLATFORMS='' python -m pytest tests/test_pallas_rollout.py -q
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from icem_tpu.envs.cheetah import HalfCheetah
from icem_tpu.envs.physics import batched
from icem_tpu.ops.planar_rollout import (BLOCK, pallas_available,
                                         rollout_planar_pallas)

pytestmark = pytest.mark.skipif(
    not pallas_available(), reason="needs a TPU backend for Pallas kernels")


def test_pallas_rollout_matches_xla_path():
    env = HalfCheetah(exclude_current_positions_from_observation=True,
                      penalise_flipping=True)
    model = env.model
    P, H = BLOCK, 8
    Q = jax.random.normal(jax.random.key(0), (P, 9)) * 0.05
    QD = jax.random.normal(jax.random.key(1), (P, 9)) * 0.1
    A = jax.random.uniform(jax.random.key(2), (P, H, 6), minval=-1, maxval=1)

    qs, qds = jax.jit(lambda q, qd, a: rollout_planar_pallas(model, q, qd, a))(Q, QD, A)
    assert qs.shape == (H, P, 9)
    assert bool(jnp.all(jnp.isfinite(qs))) and bool(jnp.all(jnp.isfinite(qds)))

    def ref(Q, QD, A):
        def body(c, a):
            q, qd = c
            q2, qd2 = batched.step_batched(model, q, qd, a)
            return (q2, qd2), (q2, qd2)
        _, out = jax.lax.scan(body, (Q, QD), jnp.swapaxes(A, 0, 1))
        return out
    qs_r, qds_r = jax.jit(ref)(Q, QD, A)
    # identical math modulo fusion-order roundoff, chaos-amplified over H steps
    np.testing.assert_allclose(np.asarray(qs[:3]), np.asarray(qs_r[:3]), atol=1e-3)


def test_env_rollout_batched_uses_pallas_at_scale():
    env = HalfCheetah(exclude_current_positions_from_observation=True,
                      penalise_flipping=True)
    P, H = BLOCK + 40, 5   # forces padding to the next block multiple
    states = jnp.broadcast_to(env.init_state(jax.random.key(0)), (P, 18))
    actions = jax.random.uniform(jax.random.key(1), (P, H, 6), minval=-1, maxval=1)
    out = jax.jit(env.rollout_batched)(states, actions)
    assert out is not None
    obs_seq, next_obs_seq, acts_tm, rewards, final_states = out
    assert next_obs_seq.shape == (H, P, 17)
    assert bool(jnp.all(jnp.isfinite(next_obs_seq)))
    assert bool(jnp.all(jnp.isfinite(rewards)))
