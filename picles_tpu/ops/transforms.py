"""Particle <-> node state transforms (reference src/Operators/core_2D.jl).

particle (lne, cg_x, cg_y)  ->  node (E, m_x, m_y):
    E = exp(lne),  m = cg * E / (2 |cg|^2)          (core_2D.jl:69-78)
node -> particle:
    cg = m * E / (2 |m|^2),  lne = log(E)           (core_2D.jl:121-128)

All denominators are clamped with a tiny floor because the masked/batched
formulation evaluates both sides of every ``where``; the clamps only engage
where the reference would have divided by zero (guarded upstream by the
minimal-state threshold, mapping_2D.jl:306).
"""

from __future__ import annotations

import jax.numpy as jnp

_TINY = 1e-30


def particle_to_node(lne, cg_x, cg_y):
    """(E, m_x, m_y) from particle state (GetParticleEnergyMomentum)."""
    e = jnp.exp(lne)
    c2 = jnp.maximum(cg_x ** 2 + cg_y ** 2, _TINY)
    m_x = cg_x * e / c2 / 2.0
    m_y = cg_y * e / c2 / 2.0
    return e, m_x, m_y


def node_to_particle(e, m_x, m_y):
    """(lne, cg_x, cg_y) from node state (GetVariablesAtVertex)."""
    m2 = jnp.maximum(m_x ** 2 + m_y ** 2, _TINY)
    e_safe = jnp.maximum(e, _TINY)
    cg_x = m_x * e_safe / (2.0 * m2)
    cg_y = m_y * e_safe / (2.0 * m2)
    return jnp.log(e_safe), cg_x, cg_y


def group_velocity_from_state(state):
    """Field-level diagnostic (GetGroupVelocity, core_2D.jl:138-147);
    state[..., 3] = (e, m_x, m_y)."""
    _, cg_x, cg_y = node_to_particle(state[..., 0], state[..., 1],
                                     state[..., 2])
    return cg_x, cg_y


def particle_to_node_1d(lne, cg_x):
    """1D: m_x = E / (2 cg_x) (reference core_1D.jl:103-112)."""
    e = jnp.exp(lne)
    cg_safe = jnp.where(jnp.abs(cg_x) < _TINY, _TINY, cg_x)
    return e, e / cg_safe / 2.0


def node_to_particle_1d(e, m_x):
    """1D: cg_x = E / (2 m_x) (reference core_1D.jl:123-130)."""
    e_safe = jnp.maximum(e, _TINY)
    m_safe = jnp.where(jnp.abs(m_x) < _TINY, _TINY, m_x)
    return jnp.log(e_safe), e_safe / (2.0 * m_safe)
