"""Probabilistic ensemble forward model (PETS-style).

Fills the learned-model slot the reference only stubs out
(icem/models/abstract_models.py:56-73 ``StochasticModel`` /
``SequentialEnsembleModel``): an ensemble of Gaussian MLPs predicting the
observation delta and the reward, trained by negative log-likelihood on the
rollout buffer (the ``forward_model.train(rollout_buffer)`` hook at
icem/main.py:209-210).

TPU-first design:
- one weight pytree with a leading ensemble axis; all members evaluate in a
  single vmapped matmul batch (MXU-friendly) rather than E separate modules,
- the weights thread through planners as an explicit ``apply_fn`` argument
  (see models/base.ForwardModel), staying replicated under the population
  vmap / shard_map,
- training is one jitted update step scanned over shuffled minibatches —
  the whole epoch is a single device program,
- TS1-style trajectory sampling: each one-step prediction draws an ensemble
  member (and optionally Gaussian noise). Model state carries a PRNG key;
  because planners broadcast one model state across the population, the key
  is decorrelated per trajectory by folding in the action bits (trajectories
  taking identical actions see identical draws — harmless; everything else
  decorrelates from step one).
- ``deterministic=True`` by default: members are still TS1-sampled but the
  per-step Gaussian draw is off. On the deterministic benchmark envs the
  aleateric noise compounds over the horizon and CEM's max-bias then
  selects LUCKY noise realizations — measured on pendulum: stochastic
  imagination plateaus at tail cost ~5.4 where deterministic propagation
  reaches ~0.04 with the identical trained model. Stochastic propagation
  stays available (``deterministic: false``) for genuinely noisy dynamics.
"""

from __future__ import annotations

import pickle
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from icem_tpu.models.base import ForwardModel

_LOGVAR_MAX_INIT = 0.5
_LOGVAR_MIN_INIT = -10.0


def _init_mlp(key, sizes: Sequence[int]):
    """Truncated-normal init, one params dict per layer."""
    layers = []
    for i, (n_in, n_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        key, k = jax.random.split(key)
        w = jax.random.truncated_normal(k, -2.0, 2.0, (n_in, n_out)) / np.sqrt(n_in)
        layers.append({"w": w.astype(jnp.float32), "b": jnp.zeros(n_out, jnp.float32)})
    return layers


def _mlp_forward(layers, x):
    for layer in layers[:-1]:
        x = jax.nn.swish(x @ layer["w"] + layer["b"])
    return x @ layers[-1]["w"] + layers[-1]["b"]


def _bound_logvar(logvar, max_logvar, min_logvar):
    """PETS soft bounds keep variances trainable but sane."""
    logvar = max_logvar - jax.nn.softplus(max_logvar - logvar)
    return min_logvar + jax.nn.softplus(logvar - min_logvar)


def _member_forward(net, x, max_logvar, min_logvar, out_dim: int):
    raw = _mlp_forward(net, x)
    mu, logvar = raw[..., :out_dim], raw[..., out_dim:]
    return mu, _bound_logvar(logvar, max_logvar, min_logvar)


def _key_hash(*arrays):
    """Per-trajectory decorrelation value from array bits (uint32 sum)."""
    total = jnp.uint32(0)
    for a in arrays:
        bits = jax.lax.bitcast_convert_type(jnp.asarray(a, jnp.float32), jnp.uint32)
        total = total + jnp.sum(bits.astype(jnp.uint32))
    return total


class EnsembleModel(ForwardModel):
    """Gaussian-MLP ensemble over (obs, action) -> (delta obs, reward).

    Plugs into the reference's learned-model slot: batched one-step
    ``predict`` driven h steps by the planner's scan, exactly the path
    ForwardModelWithDefaults.predict_n_steps describes
    (icem/models/abstract_models.py:17-53).
    """

    supports_stochastic = True
    needs_training = True

    def __init__(self, *, env, ensemble_size: int = 5, hidden: Sequence[int] = (200, 200, 200),
                 propagation: str = "ts1", deterministic: bool = True,
                 learning_rate: float = 1e-3, weight_decay: float = 1e-5,
                 batch_size: int = 256, epochs: int = 20, bootstrap: bool = True,
                 logvar_bound_weight: float = 0.01, reset_on_train: bool = False,
                 seed: Optional[int] = None,
                 **kwargs):
        super().__init__(env=env)
        if propagation not in ("ts1", "expectation"):
            raise ValueError(f"unknown propagation {propagation!r}")
        self.ensemble_size = int(ensemble_size)
        self.hidden = tuple(int(h) for h in hidden)
        self.propagation = propagation
        self.deterministic = bool(deterministic)
        self.batch_size = int(batch_size)
        self.epochs = int(epochs)
        self.bootstrap = bool(bootstrap)
        self.logvar_bound_weight = float(logvar_bound_weight)
        # optional refit-from-scratch per train() call. Measured on the
        # pendulum loop at epochs=25: warm-started refits (default) track
        # the growing buffer better than scratch refits, which need a much
        # larger epoch budget to re-converge each iteration; the option
        # exists for large-epoch / drift-sensitive regimes
        self.reset_on_train = bool(reset_on_train)

        self.obs_dim = env.observation_space.dim
        self.act_dim = env.action_space.dim
        self.in_dim = self.obs_dim + self.act_dim
        self.out_dim = self.obs_dim + 1  # delta obs + reward

        from icem_tpu.runtime.seeding import Seeding
        key = jax.random.key(seed) if seed is not None \
            else Seeding.next_key("model/ensemble")
        self._key = key
        self._step_count = 0

        self._tx = optax.adamw(learning_rate, weight_decay=weight_decay)
        self._reinit_params()
        self._fit = self._make_fit()
        self.trained = False

    def _reinit_params(self):
        """Fresh member weights + optimizer state (constructor and
        reset_on_train refits)."""
        self._key, *member_keys = jax.random.split(
            self._key, self.ensemble_size + 1)
        sizes = (self.in_dim,) + self.hidden + (2 * self.out_dim,)
        nets = [_init_mlp(k, sizes) for k in member_keys]
        # stack into one pytree with a leading ensemble axis
        net = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *nets)
        self.params = {
            "net": net,
            "max_logvar": jnp.full((self.out_dim,), _LOGVAR_MAX_INIT),
            "min_logvar": jnp.full((self.out_dim,), _LOGVAR_MIN_INIT),
            # input normalizers live in params so they thread through jit
            "in_mu": jnp.zeros((self.in_dim,)),
            "in_std": jnp.ones((self.in_dim,)),
        }
        self._opt_state = self._tx.init(self.params)

    # -- functional core -----------------------------------------------------
    def apply_fn(self, params, model_state, obs, action):
        """(params, {key}, obs, action) -> ({key'}, next_obs, reward)."""
        x = (jnp.concatenate([obs, action], axis=-1) - params["in_mu"]) / params["in_std"]
        mu, logvar = jax.vmap(
            lambda net: _member_forward(net, x, params["max_logvar"],
                                        params["min_logvar"], self.out_dim)
        )(params["net"])  # [E, out], [E, out]

        key = model_state["key"]
        # decorrelate the population-broadcast key per trajectory (see module doc)
        k_t = jax.random.fold_in(key, _key_hash(obs, action))
        k_member, k_noise = jax.random.split(k_t)

        if self.propagation == "expectation":
            pred_mu = jnp.mean(mu, axis=0)
            pred = pred_mu
        else:  # ts1
            m = jax.random.randint(k_member, (), 0, self.ensemble_size)
            pred_mu = jnp.take(mu, m, axis=0)
            pred_lv = jnp.take(logvar, m, axis=0)
            if self.deterministic:
                pred = pred_mu
            else:
                pred = pred_mu + jnp.exp(0.5 * pred_lv) * \
                    jax.random.normal(k_noise, pred_mu.shape)

        next_obs = obs + pred[..., : self.obs_dim]
        reward = pred[..., self.obs_dim]
        new_state = {"key": jax.random.fold_in(key, jnp.uint32(1))}
        return new_state, next_obs, reward

    def predict_fn(self, model_state, obs, action):
        """Host-convenience core bound to the live params (eager use only —
        jitted callers must use apply_fn + params, see base class)."""
        return self.apply_fn(self.params, model_state, obs, action)

    def init_model_state(self, observation, env_state=None):
        self._step_count += 1
        return {"key": jax.random.fold_in(self._key, self._step_count)}

    # -- training --------------------------------------------------------------
    def _make_fit(self):
        tx = self._tx
        E = self.ensemble_size
        out_dim = self.out_dim
        lv_w = self.logvar_bound_weight

        def nll_loss(params, x, target):
            # x: [E, B, in], target: [E, B, out]
            mu, logvar = jax.vmap(
                lambda net, xb: _member_forward(net, xb, params["max_logvar"],
                                                params["min_logvar"], out_dim)
            )(params["net"], x)
            inv_var = jnp.exp(-logvar)
            nll = 0.5 * ((target - mu) ** 2 * inv_var + logvar)
            loss = jnp.mean(jnp.sum(nll, axis=-1))
            bound_reg = lv_w * (jnp.sum(params["max_logvar"])
                                - jnp.sum(params["min_logvar"]))
            mse = jnp.mean(jnp.sum((target - mu) ** 2, axis=-1))
            return loss + bound_reg, (loss, mse)

        def update(carry, batch):
            params, opt_state = carry
            (_, (nll, mse)), grads = jax.value_and_grad(
                nll_loss, has_aux=True)(params, *batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (nll, mse)

        @jax.jit
        def fit_epoch(params, opt_state, key, x_all, t_all):
            """One epoch: bootstrap/shuffle per member, scan over minibatches.

            x_all: [N, in], t_all: [N, out]. Normalizers already applied.
            """
            n = x_all.shape[0]
            n_batches = max(n // self.batch_size, 1)
            used = n_batches * self.batch_size
            if self.bootstrap:
                idx = jax.random.randint(key, (E, used), 0, n)
            else:
                # wrap the permutation when the dataset is smaller than one
                # batch (n < used) so the reshape below stays valid
                idx = jnp.stack([jnp.take(
                    jax.random.permutation(jax.random.fold_in(key, e), n),
                    jnp.arange(used) % n) for e in range(E)])
            xb = x_all[idx].reshape(E, n_batches, self.batch_size, -1)
            tb = t_all[idx].reshape(E, n_batches, self.batch_size, -1)
            # time-major for scan: [n_batches, E, B, dim]
            xb = jnp.swapaxes(xb, 0, 1)
            tb = jnp.swapaxes(tb, 0, 1)
            (params, opt_state), (nlls, mses) = jax.lax.scan(
                update, (params, opt_state), (xb, tb))
            return params, opt_state, jnp.mean(nlls), jnp.mean(mses)

        return fit_epoch

    def train(self, buffer):
        """Fit the ensemble on the buffer (main.py:209-210 train hook)."""
        flat = buffer.flat
        if not flat or len(flat.get("observations", ())) < 2:
            return {}
        obs = np.asarray(flat["observations"], np.float32)
        act = np.asarray(flat["actions"], np.float32)
        next_obs = np.asarray(flat["next_observations"], np.float32)
        rew = np.asarray(flat["rewards"], np.float32).reshape(-1, 1)
        if act.ndim == 1:
            act = act[:, None]

        x = np.concatenate([obs, act], axis=-1)
        target = np.concatenate([next_obs - obs, rew], axis=-1)

        if self.reset_on_train:
            self._reinit_params()

        in_mu = x.mean(axis=0)
        in_std = x.std(axis=0) + 1e-6
        self.params = {**self.params, "in_mu": jnp.asarray(in_mu),
                       "in_std": jnp.asarray(in_std)}
        x_n = jnp.asarray((x - in_mu) / in_std)
        t = jnp.asarray(target)

        params, opt_state = self.params, self._opt_state
        nll = mse = float("nan")
        for epoch in range(self.epochs):
            self._key, k = jax.random.split(self._key)
            params, opt_state, nll, mse = self._fit(params, opt_state, k, x_n, t)
        self.params, self._opt_state = params, opt_state
        self.trained = True
        self.version += 1
        return {"nll": float(nll), "mse": float(mse),
                "num_transitions": int(x.shape[0])}

    # -- persistence -----------------------------------------------------------
    def save(self, path):
        state = {
            "params": jax.tree_util.tree_map(np.asarray, self.params),
            "opt_state": jax.tree_util.tree_map(np.asarray, self._opt_state),
            "trained": self.trained,
        }
        with open(path, "wb") as f:
            pickle.dump(state, f)

    def load(self, path):
        import os
        if not os.path.exists(path):
            # tolerate checkpoints without a model file (see
            # CheckpointManager.load_forward_model)
            print(f"EnsembleModel.load: no file at {path}; keeping fresh params")
            return
        with open(path, "rb") as f:
            state = pickle.load(f)
        self.params = jax.tree_util.tree_map(jnp.asarray, state["params"])
        self._opt_state = jax.tree_util.tree_map(jnp.asarray, state["opt_state"])
        self.trained = state["trained"]
        self.version += 1  # params changed -> invalidate fused caches
