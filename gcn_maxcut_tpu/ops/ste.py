"""Straight-through estimator ops (terminal pinning, hard argmax/threshold).

Reproduces the reference's detach algebra exactly under JAX autodiff:

  * ``override_fixed_nodes`` (reference ``Training/TrainingNeural.py:87-94``):
    rows 0/1/2 of the softmax output are replaced by one-hot e0/e1/e2 while
    ``+ h[i] - h[i].detach()`` keeps gradients flowing — here
    ``stop_gradient`` plays the role of ``detach``.
  * ``max_to_one_hot``/``apply_max_to_one_hot`` (reference ``:96-106``): hard
    per-row argmax one-hot forward, identity backward.  The reference's
    per-row Python loop (a noted hot spot, SURVEY.md §2.3) becomes a single
    vectorized expression.

In all cases  forward(x) = hard(x)  and  d forward / d x = I.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pin_terminals(h: jnp.ndarray, num_terminals: int | None = None) -> jnp.ndarray:
    """Pin rows ``0..k-1`` to one-hot ``e_0..e_{k-1}`` with identity gradient.

    ``h`` is ``[n, k]`` (class probabilities).  The data pipeline normalizes
    terminals onto node ids ``[0, 1, 2]`` (reference ``graphExtender.py:114``),
    so pinning is always on the leading rows.  ``num_terminals`` defaults to
    the class count ``k``.
    """
    n, k = h.shape
    t = k if num_terminals is None else num_terminals
    row = jnp.arange(n)[:, None]
    col = jnp.arange(k)[None, :]
    onehot_rows = (row == col).astype(h.dtype)      # row i -> e_i (i < k)
    is_terminal = (row < t).astype(h.dtype)
    hard = is_terminal * onehot_rows + (1.0 - is_terminal) * h
    # forward: hard; backward: identity on every row (pinned rows included,
    # matching `+ h[i] - h[i].detach()` in the reference).
    return jax.lax.stop_gradient(hard - h) + h


def ste_argmax_onehot(h: jnp.ndarray) -> jnp.ndarray:
    """Row-wise hard argmax one-hot with straight-through gradient.

    ``h`` is ``[n, k]``; ties resolve to the lowest index, matching
    ``torch.argmax`` on equal values in the reference's ``max_to_one_hot``.
    """
    idx = jnp.argmax(h, axis=-1)
    hard = jax.nn.one_hot(idx, h.shape[-1], dtype=h.dtype)
    return jax.lax.stop_gradient(hard - h) + h


def ste_threshold(h: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    """Elementwise hard threshold with straight-through gradient.

    The legacy QUBO path's projection ``(probs >= prob_threshold)``
    (reference ``utils.py:205-218``) in differentiable form.
    """
    hard = (h >= threshold).astype(h.dtype)
    return jax.lax.stop_gradient(hard - h) + h
