"""Optimizers over scene-parameter dicts.

Reference: src/python/python/ad/optimizers.py — ``Optimizer`` param-dict
base with per-parameter learning rates (:6), ``SGD`` with momentum (:112),
``Adam`` with per-element moments and optional ``mask_updates`` (:204).

Functional JAX style: an optimizer holds hyperparameters; state is an
explicit dict pytree threaded through ``step`` (jit/scan friendly).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


class Optimizer:
    """Base: per-param learning-rate overrides via set_learning_rate."""

    def __init__(self, lr: float):
        self.lr = lr
        self.lr_per_param: dict[str, float] = {}

    def set_learning_rate(self, overrides: dict[str, float] | float):
        if isinstance(overrides, dict):
            self.lr_per_param.update(overrides)
        else:
            self.lr = float(overrides)

    def _lr(self, key):
        return self.lr_per_param.get(key, self.lr)

    def init(self, params: dict):
        raise NotImplementedError

    def step(self, params: dict, grads: dict, state: dict):
        raise NotImplementedError


class SGD(Optimizer):
    """SGD with optional momentum (optimizers.py:112)."""

    def __init__(self, lr: float, momentum: float = 0.0,
                 mask_updates: bool = False):
        super().__init__(lr)
        self.momentum = momentum
        self.mask_updates = mask_updates

    def init(self, params):
        if self.momentum == 0.0:
            return {}
        return {k: jnp.zeros_like(v) for k, v in params.items()}

    def step(self, params, grads, state):
        new_p, new_s = {}, {}
        for k, p in params.items():
            g = grads[k]
            lr = self._lr(k)
            if self.momentum != 0.0:
                v = self.momentum * state[k] + g
                if self.mask_updates:
                    v = jnp.where(g != 0.0, v, state[k])
                new_s[k] = v
                upd = lr * v
            else:
                upd = lr * g
            if self.mask_updates:
                upd = jnp.where(g != 0.0, upd, 0.0)
            new_p[k] = p - upd
        return new_p, new_s


class Adam(Optimizer):
    """Adam with bias correction; ``mask_updates`` freezes parameters whose
    gradient is exactly zero this step; ``uniform`` uses the max second
    moment across elements (UniformAdam, optimizers.py:204 variants)."""

    def __init__(self, lr: float, beta_1: float = 0.9, beta_2: float = 0.999,
                 epsilon: float = 1e-8, mask_updates: bool = False,
                 uniform: bool = False):
        super().__init__(lr)
        self.beta_1 = beta_1
        self.beta_2 = beta_2
        self.epsilon = epsilon
        self.mask_updates = mask_updates
        self.uniform = uniform

    def init(self, params):
        return {
            "t": jnp.zeros((), jnp.int32),
            "m": {k: jnp.zeros_like(v) for k, v in params.items()},
            "v": {k: jnp.zeros_like(v) for k, v in params.items()},
        }

    def step(self, params, grads, state):
        t = state["t"] + 1
        tf = t.astype(jnp.float32)
        lr_scale = (
            jnp.sqrt(1.0 - self.beta_2**tf) / (1.0 - self.beta_1**tf)
        )
        new_p = {}
        new_m = {}
        new_v = {}
        for k, p in params.items():
            g = grads[k]
            m = self.beta_1 * state["m"][k] + (1.0 - self.beta_1) * g
            v = self.beta_2 * state["v"][k] + (1.0 - self.beta_2) * g * g
            if self.mask_updates:
                nz = g != 0.0
                m = jnp.where(nz, m, state["m"][k])
                v = jnp.where(nz, v, state["v"][k])
            denom = (
                jnp.sqrt(jnp.max(v)) if self.uniform else jnp.sqrt(v)
            )
            upd = self._lr(k) * lr_scale * m / (denom + self.epsilon)
            if self.mask_updates:
                upd = jnp.where(g != 0.0, upd, 0.0)
            new_p[k] = p - upd
            new_m[k] = m
            new_v[k] = v
        return new_p, {"t": t, "m": new_m, "v": new_v}
