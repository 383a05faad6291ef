"""Ground-truth forward models backed by pure-JAX env dynamics.

The reference has two: GroundTruthModel (one private env replica stepped
serially, icem/models/gt_model.py) and ParallelGroundTruthModel (N forked
worker processes with pipe scatter/gather, icem/models/gt_par_model.py).
Because our env dynamics are pure functions, BOTH collapse into value
passing: the model state is the env state array, one-step prediction is
``env.step``, and population parallelism is vmap (in-chip) or shard_map
(across the mesh) applied by the caller. ``ParallelGroundTruthModel`` is
kept as an alias so reference configs (forward_model:
"ParallelGroundTruthModel") resolve unchanged — its ``num_parallel`` knob is
accepted and ignored (XLA owns the parallel schedule).
"""

from __future__ import annotations

from icem_tpu.models.base import ForwardModel


class GroundTruthModel(ForwardModel):
    """Forward model that IS the environment dynamics.

    reference: models/gt_model.py:24-102 — but with no env cloning: the
    dynamics are pure, so the "private replica" is just the state value.
    """

    def __init__(self, *, env, **kwargs):
        super().__init__(env=env)

        # instance-attribute closure (shadows the method) so the population-
        # batched fast path travels WITH the function: rollout_open_loop picks
        # up ``.batched`` and skips the per-trajectory vmap when the env has a
        # population-native step (envs/planar_base.py)
        def _predict(model_state, obs, action):
            next_state, next_obs, reward, _ = env.step(model_state, action)
            return next_state, next_obs, reward

        def _predict_batched(model_states, obs, actions):
            next_states, next_obs, rewards, _ = env.step_batched(model_states, actions)
            return next_states, next_obs, rewards

        _predict.batched = _predict_batched
        if hasattr(env, "rollout_batched"):
            # whole-horizon fast path: physics carry stays in the VPU row
            # layout across the scan (envs/planar_base.py); returns None at
            # trace time when the population/model doesn't qualify
            _predict.rollout = env.rollout_batched
        self.predict_fn = _predict

    def init_model_state(self, observation, env_state=None):
        """Use the real env state when given, else reconstruct from the
        observation (reference: gt_model.py:46-51)."""
        if env_state is not None:
            return env_state
        return self.env.state_from_observation(observation)


class ParallelGroundTruthModel(GroundTruthModel):
    """Config-compatible alias of GroundTruthModel.

    The reference version forks ``num_parallel`` worker processes and
    scatters population chunks over pipes (gt_par_model.py:20-94). On TPU the
    population axis is batched by vmap / sharded by shard_map inside the
    planner itself, so there is nothing process-shaped left to manage.
    """

    def __init__(self, *, env, num_parallel: int = 0, **kwargs):
        super().__init__(env=env)
        self.num_parallel = num_parallel  # accepted for config parity; unused
