"""Recurrent State-Space Model (PlaNet-style) latent forward model.

The reference's PlaNet experiments (h=12 configs, README.md:23-29) used an
external codebase; the shipped repo only defines the ForwardModel API slot
(icem/misc/base_types.py:62-118). This module fills that capability with a
state-based RSSM (Hafner et al. 2019): a deterministic GRU path plus a
stochastic latent, trained on sequences from the rollout buffer with the
standard ELBO (reconstruction + reward NLL + KL with free nats).

Planning contract (same as every forward model here):
- ``apply_fn(params, model_state, obs, action)`` advances the latent one
  step open-loop through the PRIOR — the passed obs is ignored, as latent
  imagination must not peek at decoded observations,
- ``got_actual_observation_and_env_state`` is the FILTER step: it keeps the
  deterministic state (already advanced by the executed action via the
  controller's model-advance hook, icem/controllers/icem.py:186-188 analog)
  and replaces the stochastic latent with the posterior sample given the
  real observation,
- decoded observations feed the env cost_fn, so ground-truth-env cost
  functions work unchanged on imagined trajectories.

TPU notes: the latent step is a few small matmuls — the population vmap
batches them into MXU-shaped GEMMs; weights thread through plan_step as
runtime args (models/base.ForwardModel) and stay replicated on the mesh.
"""

from __future__ import annotations

import pickle
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from icem_tpu.models.base import ForwardModel
from icem_tpu.models.ensemble import _init_mlp, _mlp_forward, _key_hash

_MIN_STD = 0.1


def _init_gru(key, in_dim: int, h_dim: int):
    k1, k2, k3 = jax.random.split(key, 3)
    scale_x = 1.0 / np.sqrt(in_dim)
    scale_h = 1.0 / np.sqrt(h_dim)
    return {
        "wx": jax.random.normal(k1, (in_dim, 3 * h_dim)) * scale_x,
        "wh": jax.random.normal(k2, (h_dim, 3 * h_dim)) * scale_h,
        "b": jnp.zeros((3 * h_dim,)),
    }


def _gru_step(p, x, h):
    gx = x @ p["wx"] + p["b"]
    gh = h @ p["wh"]
    xr, xu, xc = jnp.split(gx, 3, axis=-1)
    hr, hu, hc = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    u = jax.nn.sigmoid(xu + hu)
    c = jnp.tanh(xc + r * hc)
    return u * h + (1.0 - u) * c


def _gaussian(raw):
    mu, pre_std = jnp.split(raw, 2, axis=-1)
    return mu, jax.nn.softplus(pre_std) + _MIN_STD


class RSSMModel(ForwardModel):
    """Latent RSSM forward model with the reference ForwardModel lifecycle."""

    supports_stochastic = True
    needs_training = True

    def __init__(self, *, env, stoch_dim: int = 30, det_dim: int = 128,
                 hidden: int = 128, embed_dim: int = 128,
                 learning_rate: float = 6e-4, grad_clip: float = 100.0,
                 free_nats: float = 3.0, kl_scale: float = 1.0,
                 seq_length: int = 32, batch_size: int = 16,
                 train_steps: int = 100,
                 deterministic_plan: bool = False, seed: Optional[int] = None,
                 **kwargs):
        super().__init__(env=env)
        self.obs_dim = env.observation_space.dim
        self.act_dim = env.action_space.dim
        self.stoch_dim = int(stoch_dim)
        self.det_dim = int(det_dim)
        self.free_nats = float(free_nats)
        self.kl_scale = float(kl_scale)
        self.seq_length = int(seq_length)
        self.batch_size = int(batch_size)
        self.train_steps = int(train_steps)
        self.deterministic_plan = bool(deterministic_plan)

        from icem_tpu.runtime.seeding import Seeding
        key = jax.random.key(seed) if seed is not None \
            else Seeding.next_key("model/rssm")
        key, k_enc, k_gru, k_pri, k_post, k_dec, k_rew = jax.random.split(key, 7)
        self._key = key
        self._step_count = 0

        H, S, E = int(hidden), self.stoch_dim, int(embed_dim)
        self.params = {
            "encoder": _init_mlp(k_enc, (self.obs_dim, H, E)),
            "gru": _init_gru(k_gru, S + self.act_dim, self.det_dim),
            "prior": _init_mlp(k_pri, (self.det_dim, H, 2 * S)),
            "posterior": _init_mlp(k_post, (self.det_dim + E, H, 2 * S)),
            "decoder": _init_mlp(k_dec, (self.det_dim + S, H, H, self.obs_dim)),
            "reward": _init_mlp(k_rew, (self.det_dim + S, H, 1)),
            # obs/reward normalizers (threaded through jit like the ensemble's)
            "obs_mu": jnp.zeros((self.obs_dim,)),
            "obs_std": jnp.ones((self.obs_dim,)),
            "rew_mu": jnp.zeros(()),
            "rew_std": jnp.ones(()),
        }
        self._tx = optax.chain(optax.clip_by_global_norm(grad_clip),
                               optax.adam(learning_rate))
        self._opt_state = self._tx.init(self.params)
        self._fit = self._make_fit()
        self.trained = False

    # -- functional pieces ----------------------------------------------------
    def _encode(self, params, obs):
        obs_n = (obs - params["obs_mu"]) / params["obs_std"]
        return jax.nn.swish(_mlp_forward(params["encoder"], obs_n))

    def _decode(self, params, h, z):
        x = jnp.concatenate([h, z], axis=-1)
        obs_n = _mlp_forward(params["decoder"], x)
        return obs_n * params["obs_std"] + params["obs_mu"]

    def _reward(self, params, h, z):
        r_n = _mlp_forward(params["reward"], jnp.concatenate([h, z], axis=-1))[..., 0]
        return r_n * params["rew_std"] + params["rew_mu"]

    def _prior(self, params, h):
        return _gaussian(_mlp_forward(params["prior"], h))

    def _posterior(self, params, h, embed):
        return _gaussian(_mlp_forward(params["posterior"],
                                      jnp.concatenate([h, embed], axis=-1)))

    # -- planning core ----------------------------------------------------------
    def apply_fn(self, params, model_state, obs, action):
        """Open-loop latent step through the prior; obs is IGNORED by design."""
        h, z, key = model_state["h"], model_state["z"], model_state["key"]
        h2 = _gru_step(params["gru"], jnp.concatenate([z, action], axis=-1), h)
        mu, std = self._prior(params, h2)
        if self.deterministic_plan:
            z2 = mu
        else:
            k_t = jax.random.fold_in(key, _key_hash(z, action))
            z2 = mu + std * jax.random.normal(k_t, mu.shape)
        next_obs = self._decode(params, h2, z2)
        reward = self._reward(params, h2, z2)
        new_state = {"h": h2, "z": z2, "key": jax.random.fold_in(key, jnp.uint32(1))}
        return new_state, next_obs, reward

    def predict_fn(self, model_state, obs, action):
        return self.apply_fn(self.params, model_state, obs, action)

    def _filter(self, observation, model_state):
        """Posterior update: keep h, resample z given the real observation."""
        self._step_count += 1
        key = jax.random.fold_in(self._key, self._step_count)
        h = model_state["h"] if model_state is not None \
            else jnp.zeros((self.det_dim,))
        e = self._encode(self.params, jnp.asarray(observation, jnp.float32))
        mu, std = self._posterior(self.params, h, e)
        if self.deterministic_plan:
            z = mu
        else:
            key, k = jax.random.split(key)
            z = mu + std * jax.random.normal(k, mu.shape)
        return {"h": h, "z": z, "key": key}

    def got_actual_observation_and_env_state(self, *, observation, env_state=None,
                                             model_state=None):
        return self._filter(observation, model_state)

    def init_model_state(self, observation, env_state=None):
        return self._filter(observation, None)

    def reset(self, observation):
        return self._filter(observation, None)

    # -- training ----------------------------------------------------------------
    def _make_fit(self):
        tx = self._tx
        S = self.stoch_dim

        def elbo_loss(params, key, obs_seq, act_seq, rew_seq):
            """obs/act/rew: [L, B, dim] time-major segments.

            Observe pass: h_t from (h_{t-1}, z_{t-1}, a_{t-1}); posterior
            given e_t; reconstruct obs_t; reward head at t predicts r_{t-1}.
            """
            L, B = obs_seq.shape[0], obs_seq.shape[1]
            # normalizers are data statistics, not trainable: without the
            # stop_gradient the optimizer inflates the stds to shrink the
            # normalized losses instead of fitting the model
            obs_mu = jax.lax.stop_gradient(params["obs_mu"])
            obs_std = jax.lax.stop_gradient(params["obs_std"])
            obs_n = (obs_seq - obs_mu) / obs_std
            embed = jax.nn.swish(_mlp_forward(params["encoder"], obs_n))
            eps = jax.random.normal(key, (L, B, S))

            h0 = jnp.zeros((B, self.det_dim))
            z0 = jnp.zeros((B, S))

            def step(carry, inp):
                h, z = carry
                e_t, a_prev, eps_t = inp
                h2 = _gru_step(params["gru"],
                               jnp.concatenate([z, a_prev], axis=-1), h)
                pri_mu, pri_std = self._prior(params, h2)
                post_mu, post_std = self._posterior(params, h2, e_t)
                z2 = post_mu + post_std * eps_t
                return (h2, z2), (h2, z2, pri_mu, pri_std, post_mu, post_std)

            a_prev = jnp.concatenate([jnp.zeros_like(act_seq[:1]), act_seq[:-1]],
                                     axis=0)
            (_, _), (hs, zs, pri_mu, pri_std, post_mu, post_std) = jax.lax.scan(
                step, (h0, z0), (embed, a_prev, eps))

            recon_n = _mlp_forward(params["decoder"],
                                   jnp.concatenate([hs, zs], axis=-1))
            recon_loss = 0.5 * jnp.mean(jnp.sum((recon_n - obs_n) ** 2, axis=-1))

            rew_pred = _mlp_forward(params["reward"],
                                    jnp.concatenate([hs, zs], axis=-1))[..., 0]
            rew_n = (rew_seq - jax.lax.stop_gradient(params["rew_mu"])) \
                / jax.lax.stop_gradient(params["rew_std"])
            # reward at t is for transition t-1 -> skip t=0
            rew_loss = 0.5 * jnp.mean((rew_pred[1:] - rew_n[:-1]) ** 2)

            kl = (jnp.log(pri_std / post_std)
                  + (post_std ** 2 + (post_mu - pri_mu) ** 2) / (2 * pri_std ** 2)
                  - 0.5)
            kl = jnp.sum(kl, axis=-1)  # [L, B]
            kl_loss = jnp.mean(jnp.maximum(kl, self.free_nats))

            loss = recon_loss + rew_loss + self.kl_scale * kl_loss
            return loss, (recon_loss, rew_loss, kl_loss)

        @jax.jit
        def fit_step(params, opt_state, key, obs_seq, act_seq, rew_seq):
            (loss, aux), grads = jax.value_and_grad(elbo_loss, has_aux=True)(
                params, key, obs_seq, act_seq, rew_seq)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, aux

        return fit_step

    @staticmethod
    def _stacked_sequences(buffer):
        """[R, T, ...] arrays from possibly ragged rollouts: early-terminated
        episodes (runtime truncates at done) are trimmed to the common length
        so sequence batching stays rectangular."""
        rollouts = [r for r in buffer if len(r) >= 2]
        if not rollouts:
            return None
        t_min = min(len(r) for r in rollouts)
        try:
            obs = np.stack([np.asarray(r["observations"][:t_min], np.float32)
                            for r in rollouts])
            act = np.stack([np.asarray(r["actions"][:t_min], np.float32)
                            for r in rollouts])
            rew = np.stack([np.asarray(r["rewards"][:t_min], np.float32)
                            for r in rollouts])
        except (KeyError, ValueError):
            return None
        return obs, act, rew

    def train(self, buffer):
        """Sequence-ELBO training on the rollout buffer."""
        data = self._stacked_sequences(buffer)
        if data is None:
            return {}
        obs, act, rew = data
        if act.ndim == 2:
            act = act[..., None]
        R, T = obs.shape[0], obs.shape[1]
        L = min(self.seq_length, T)
        if R == 0 or T < 2:
            return {}

        mu = obs.reshape(-1, obs.shape[-1]).mean(axis=0)
        std = obs.reshape(-1, obs.shape[-1]).std(axis=0) + 1e-6
        self.params = {**self.params, "obs_mu": jnp.asarray(mu),
                       "obs_std": jnp.asarray(std),
                       "rew_mu": jnp.asarray(rew.mean()),
                       "rew_std": jnp.asarray(rew.std() + 1e-6)}

        params, opt_state = self.params, self._opt_state
        rng = np.random.default_rng(int(jax.random.randint(self._key, (), 0, 2**31 - 1)))
        hist = []
        for _ in range(self.train_steps):
            r_idx = rng.integers(0, R, self.batch_size)
            t_idx = rng.integers(0, T - L + 1, self.batch_size)
            gather = lambda arr: np.stack(
                [arr[r, t:t + L] for r, t in zip(r_idx, t_idx)], axis=1)  # [L,B,..]
            self._key, k = jax.random.split(self._key)
            params, opt_state, loss, aux = self._fit(
                params, opt_state, k, jnp.asarray(gather(obs)),
                jnp.asarray(gather(act)), jnp.asarray(gather(rew)))
            hist.append((float(loss),) + tuple(float(a) for a in aux))
        self.params, self._opt_state = params, opt_state
        self.trained = True
        self.version += 1
        # report means over the last quarter of steps (single-batch values are noisy)
        tail = np.mean(hist[-max(len(hist) // 4, 1):], axis=0)
        return {"loss": float(tail[0]), "recon": float(tail[1]),
                "reward_loss": float(tail[2]), "kl": float(tail[3])}

    # -- persistence ---------------------------------------------------------------
    def save(self, path):
        state = {"params": jax.tree_util.tree_map(np.asarray, self.params),
                 "opt_state": jax.tree_util.tree_map(np.asarray, self._opt_state),
                 "trained": self.trained}
        with open(path, "wb") as f:
            pickle.dump(state, f)

    def load(self, path):
        import os
        if not os.path.exists(path):
            # tolerate checkpoints without a model file (see
            # CheckpointManager.load_forward_model)
            print(f"RSSM.load: no file at {path}; keeping fresh params")
            return
        with open(path, "rb") as f:
            state = pickle.load(f)
        self.params = jax.tree_util.tree_map(jnp.asarray, state["params"])
        self._opt_state = jax.tree_util.tree_map(jnp.asarray, state["opt_state"])
        self.trained = state["trained"]
        self.version += 1  # params changed -> invalidate fused caches
