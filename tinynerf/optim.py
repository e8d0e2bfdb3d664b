"""Optimizer + LR schedules as pure functions over pytrees (own impl, no optax).

Adam reproduces ``torch.optim.Adam`` semantics exactly — bias-corrected first
and second moments with eps **outside** the sqrt — with the reference's
hyperparameters ``betas=(0.9, 0.999), eps=1e-7`` (reference ``nerf.py:425``).

Schedules reproduce the reference's two options (``nerf.py:426-427``):

- ``EXP``: multiplier ``gamma**(iter/decay_end)`` while ``iter < decay_end``,
  else ``gamma * learning`` — yes, the post-decay multiplier really is
  ``gamma * learning`` (a reference quirk, Q6: with the shipped configs the
  post-decay lr is ``learning * gamma * learning ≈ 9e-9``), reproduced
  verbatim per SURVEY.md decision D2.
- ``MULTISTEP``: multiplier ``gamma ** (#milestones <= iter)``.

Both are closed-form functions of the iteration counter, so resume-from-
checkpoint restores the schedule exactly (the counter lives in TrainState).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    count: jnp.ndarray  # int32 number of updates applied
    mu: Any             # first-moment pytree
    nu: Any             # second-moment pytree


def adam_init(params: Any) -> AdamState:
    zeros = lambda p: jnp.zeros_like(p)
    return AdamState(count=jnp.zeros((), jnp.int32),
                     mu=jax.tree_util.tree_map(zeros, params),
                     nu=jax.tree_util.tree_map(zeros, params))


def adam_update(grads: Any, state: AdamState, params: Any, lr: jnp.ndarray,
                b1: float = 0.9, b2: float = 0.999, eps: float = 1e-7,
                lr_scale: Any = None):
    """One Adam step (torch semantics). Returns (new_params, new_state).

    ``lr_scale`` (optional) is a pytree of per-leaf scalar multipliers on
    the learning rate — the factorized-grid field trains its line tables
    at ``GRID_LR_MULT`` x the base rate (train.make_lr_scale). ``None``
    keeps the torch-exact single-LR semantics bit-for-bit."""
    count = state.count + 1
    t = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t

    mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g,
                                state.mu, grads)
    nu = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g,
                                state.nu, grads)
    if lr_scale is None:
        new_params = jax.tree_util.tree_map(
            lambda p, m, v: p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps),
            params, mu, nu)
    else:
        new_params = jax.tree_util.tree_map(
            lambda p, m, v, s: p - (lr * s) * (m / bc1)
            / (jnp.sqrt(v / bc2) + eps),
            params, mu, nu, lr_scale)
    return new_params, AdamState(count=count, mu=mu, nu=nu)


def exp_schedule(iteration: jnp.ndarray, learning: float, gamma: float,
                 decay_end: float) -> jnp.ndarray:
    """Reference EXP schedule, Q6-exact (``nerf.py:426``)."""
    it = iteration.astype(jnp.float32)
    mult = jnp.where(it < decay_end,
                     jnp.power(gamma, it / decay_end),
                     gamma * learning)
    return learning * mult


def multistep_schedule(iteration: jnp.ndarray, learning: float, gamma: float,
                       milestones: Sequence[int]) -> jnp.ndarray:
    """Reference MultiStepLR: lr = learning * gamma^(#milestones <= iter)."""
    it = iteration.astype(jnp.float32)
    ms = jnp.asarray(list(milestones), dtype=jnp.float32)
    if ms.size == 0:
        return jnp.full_like(it, learning)
    crossed = jnp.sum((ms[None, ...] <= it[..., None]).astype(jnp.float32),
                      axis=-1) if it.ndim else jnp.sum(ms <= it)
    return learning * jnp.power(gamma, crossed)


def make_lr_fn(cfg) -> Any:
    """Schedule closure from a :class:`tinynerf.config.Config`."""
    if cfg.sched.upper() == "EXP":
        return lambda it: exp_schedule(it, cfg.learning, cfg.lr_gamma,
                                       float(cfg.decay_end))
    return lambda it: multistep_schedule(it, cfg.learning, cfg.lr_gamma,
                                         cfg.lr_milestone)
