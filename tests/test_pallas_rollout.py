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


# --------------------------------------------------------------------------
# spatial (3D) kernel — ops/spatial_rollout.py
# --------------------------------------------------------------------------

def test_spatial_pallas_rollout_matches_xla_rows():
    from icem_tpu.envs.ant3d import Ant3D
    from icem_tpu.envs.physics import spatial_batched
    from icem_tpu.ops.spatial_rollout import rollout_spatial_pallas
    from icem_tpu.ops.spatial_rollout import BLOCK as SBLOCK

    env = Ant3D()
    model = env.model
    nd, na = model.ndof, len(model.actuator_dof)
    P, H = SBLOCK, 8
    base = env.init_state(jax.random.key(0))[:nd]
    Q = base[None] + jax.random.normal(jax.random.key(1), (P, nd)) * 0.01
    QD = jax.random.normal(jax.random.key(2), (P, nd)) * 0.05
    A = jax.random.uniform(jax.random.key(3), (P, H, na), minval=-1, maxval=1)

    qs, qds = jax.jit(lambda q, qd, a: rollout_spatial_pallas(model, q, qd, a))(Q, QD, A)
    assert qs.shape == (H, P, nd)
    assert bool(jnp.all(jnp.isfinite(qs))) and bool(jnp.all(jnp.isfinite(qds)))

    def ref(Q, QD, A):
        def body(c, a):
            q, qd = c
            q2, qd2 = spatial_batched.step_batched(model, q, qd, a)
            return (q2, qd2), (q2, qd2)
        _, out = jax.lax.scan(body, (Q, QD), jnp.swapaxes(A, 0, 1))
        return out
    qs_r, qds_r = jax.jit(ref)(Q, QD, A)
    # Mosaic and XLA contract FMAs differently; a trajectory sitting on a
    # Coulomb-clamp switch amplifies that last-bit difference over substeps
    # (measured on v5e: 9 of 43k elements off by up to ~1e-2 after 3 control
    # steps; interpret mode matches to 7.6e-6). Require the bulk to agree
    # tightly and bound the contact-switch outlier fraction.
    diff = np.abs(np.asarray(qs[:3]) - np.asarray(qs_r[:3]))
    assert float(np.quantile(diff, 0.999)) < 1e-3, float(np.quantile(diff, 0.999))
    assert float(diff.max()) < 5e-2, float(diff.max())


def test_spatial_env_rollout_batched_uses_pallas_at_scale():
    """Humanoid3D (23 dof, the horizon-chunked kernel shape) through the
    product path at a reference-scale population (pads 504 -> 1024)."""
    from icem_tpu.envs.humanoid3d import HumanoidStandup3D
    from icem_tpu.ops.spatial_rollout import PALLAS_MIN_POP

    env = HumanoidStandup3D()
    P, H = max(PALLAS_MIN_POP, 504), 30
    S = env.init_state(jax.random.key(0)).shape[0]
    states = jnp.broadcast_to(env.init_state(jax.random.key(0)), (P, S))
    na = env.action_space.shape[0]
    actions = jax.random.uniform(jax.random.key(1), (P, H, na),
                                 minval=-1, maxval=1)
    out = jax.jit(env.rollout_batched)(states, actions)
    assert out is not None
    obs_seq, next_obs_seq, acts_tm, rewards, final_states = out
    assert next_obs_seq.shape[0] == H and next_obs_seq.shape[1] == P
    assert bool(jnp.all(jnp.isfinite(next_obs_seq)))
    assert bool(jnp.all(jnp.isfinite(rewards)))
