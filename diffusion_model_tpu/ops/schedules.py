"""Noise schedules for the diffusion process, as pure jnp functions.

Reproduces the reference math exactly (ref diffusion_x_h.py:92-106):

  * ``clip_noise_schedule``: stabilise alpha^2 by clamping stepwise ratios
    then re-cumprod.
  * ``polynomial_alpha_schedule``: alpha^2(t) = (1 - (t/T)^power)^2, clipped,
    then affinely squeezed into [s, 1-s] with precision ``s``
    (``noise_precision`` in parameters.yaml:18).

Returned arrays have length ``T+1`` (t = 0..T), and the conventions are

  alpha_t = sqrt(alphas2[t]),  sigma_t = sqrt(1 - alphas2[t])

matching ``E3DiffusionProcess.__init__`` (ref diffusion_x_h.py:20-26, note the
reference stores ``alpha_schedule = alphas2`` and uses it directly as alpha —
i.e. its ``alpha`` is the *squared*-free value returned by
``polynomial_schedule``; we mirror that exactly: the polynomial schedule value
IS alpha_t, and sigma_t = sqrt(1 - alpha_t^2)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def clip_noise_schedule(alphas2: jnp.ndarray, clip_value: float = 0.001) -> jnp.ndarray:
    """Clamp per-step alpha^2 ratios to [clip_value, 1] and re-accumulate.

    Ref diffusion_x_h.py:92-97.
    """
    alphas2 = jnp.concatenate([jnp.ones((1,), alphas2.dtype), alphas2], axis=0)
    alphas_step = alphas2[1:] / alphas2[:-1]
    alphas_step = jnp.clip(alphas_step, clip_value, 1.0)
    return jnp.cumprod(alphas_step, axis=0)


def beta_schedule(kind: str, initial_beta: float, final_beta: float,
                  timesteps: int) -> jnp.ndarray:
    """Legacy DDPM-style beta schedules over t = 0..T (length T+1).

    Ref E3diffusion.py:15-20 ('sigmoid' and 'linear'; the duplicate numpy
    variant lives at data_preparation.py:218-224). These back the
    superseded beta-parameterised process the live joint model replaced
    with the polynomial/learned alpha schedules.
    """
    if kind == "sigmoid":
        base = jax.nn.sigmoid(jnp.linspace(-6.0, 6.0, timesteps + 1))
        return base * (final_beta - initial_beta) + initial_beta
    if kind == "linear":
        return jnp.linspace(initial_beta, final_beta, timesteps + 1)
    raise ValueError(f"unknown beta schedule {kind!r}")


def ddpm_alpha_bar(betas: jnp.ndarray) -> jnp.ndarray:
    """Cumulative product alpha_bar_t = prod(1 - beta) (ref E3diffusion.py:
    21-22)."""
    return jnp.cumprod(1.0 - betas, axis=0)


def polynomial_alpha_schedule(
    timesteps: int, s: float = 1e-4, power: float = 3.0
) -> jnp.ndarray:
    """Polynomial alpha schedule over t = 0..T (length T+1).

    Ref diffusion_x_h.py:99-106. The returned value is what the reference
    calls ``alpha_schedule`` (used directly as alpha_t, with
    sigma_t = sqrt(1 - alpha_t^2), ref diffusion_x_h.py:25-26).
    """
    x = jnp.linspace(0.0, float(timesteps), timesteps + 1)
    alphas2 = (1.0 - (x / timesteps) ** power) ** 2
    alphas2 = clip_noise_schedule(alphas2, clip_value=0.001)
    precision = 1.0 - 2.0 * s
    return precision * alphas2 + s
