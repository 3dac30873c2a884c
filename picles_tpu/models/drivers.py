"""Multi-step drivers shared by every model class.

One mixin provides the three dispatch shapes over an abstract ``self.step``
(the reference's outer run! loop never varies per model either,
run.jl:72-115):

- ``step_n``: ``lax.scan`` with stacked per-step states (the CashStore
  analog) — O(n * state) device memory, static n;
- ``step_n_buffered``: TRACED trip count into a static-``capacity``
  buffer, so chunked store drivers reuse ONE compiled executable for full
  and ragged chunks alike (rows past ``n`` stay zero; callers slice
  ``[:n]``);
- ``step_n_quiet``: ``fori_loop`` with no per-step output — O(state)
  memory for any horizon, traced n.

jit caches key on ``self`` (static): model instances must stay hashable,
which the frozen-config model classes are.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


class StepDrivers:
    """Mixin: multi-step dispatchers over ``self.step(state) -> state``."""

    @partial(jax.jit, static_argnums=(0, 2))
    def step_n(self, ms, n: int):
        """n steps via ``lax.scan``, returning (final_state, stacked
        Eulerian states ``[n, ...]``).  Static ``n`` — one compile per
        distinct length (the buffered variant below amortizes that)."""

        def body(carry, _):
            nxt = self.step(carry)
            return nxt, nxt.state

        return jax.lax.scan(body, ms, None, length=n)

    @partial(jax.jit, static_argnums=(0, 3))
    def step_n_buffered(self, ms, n, capacity: int):
        """``step_n`` with a traced trip count (see module docstring)."""
        buf = jnp.zeros((capacity,) + ms.state.shape, ms.state.dtype)

        def body(i, c):
            s, b = c
            s2 = self.step(s)
            return s2, jax.lax.dynamic_update_index_in_dim(b, s2.state, i, 0)

        return jax.lax.fori_loop(0, n, body, (ms, buf))

    @partial(jax.jit, static_argnums=(0,))
    def step_n_quiet(self, ms, n):
        """n steps with NO per-step output: peak memory stays O(state)
        instead of step_n's O(n * state) — a 6-day 1536^2 run through
        step_n would stack ~24 GB of unread history.  ``n`` is a traced
        scalar so chunked drivers reuse one compilation for any length."""
        return jax.lax.fori_loop(0, n, lambda _, s: self.step(s), ms)

    def step_jit(self):
        return jax.jit(self.step)
