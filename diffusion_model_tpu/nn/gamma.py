"""VDM learned monotone noise schedule (gamma network).

Equivalent of the reference ``GammaNetwork``/``PositiveLinear``
(ref SNR.py:5-65): gamma_tilde(t) = l1(t) + l3(sigmoid(l2(l1(t)))) with
softplus-positive weights (monotone in t), normalised to [0, 1] over the
unit interval and rescaled to trainable endpoints gamma_0=-5, gamma_1=10.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class PositiveLinear(nn.Module):
    """Linear layer with softplus-positive weights and no bias.

    Ref SNR.py:5-22: weights are kaiming-uniform initialised then shifted by
    ``param_init_offset`` (=-2) so softplus(weight) starts small.
    """

    features: int
    param_init_offset: float = -2.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]

        def init(key, shape, dtype=jnp.float32):
            # kaiming_uniform(a=sqrt(5)) over fan_in, as torch does for
            # nn.Linear weights, then the constant offset.
            fan_in = shape[1]
            gain = jnp.sqrt(2.0 / (1.0 + 5.0))  # a = sqrt(5)
            bound = gain * jnp.sqrt(3.0 / fan_in)
            w = jax.random.uniform(key, shape, dtype, -bound, bound)
            return w + self.param_init_offset

        weight = self.param(
            "weight", init, (self.features, in_features)
        )
        return x @ jax.nn.softplus(weight).T


class GammaNetwork(nn.Module):
    """Monotone gamma(t) on t in [0, 1] (ref SNR.py:27-65).

    The trainable endpoints are stored PRE-SCALED by ``endpoint_scale``:
    Adam-family optimizers move every parameter ~lr per step regardless of
    gradient magnitude, so at lr=2e-4 a raw gamma_0 could traverse only
    ~±2 over a full 3000-epoch run — not enough to reach the clean-endpoint
    region (gamma_0 ~ -9 for sigma_0 ~ 1e-2) that the VDM boundary terms
    (train/trainer.py) ask for. Scaling the stored parameter multiplies the
    per-step endpoint movement without touching the loss surface shape.

    Checkpoint-format note: this reparameterisation changed the meaning of
    the stored ``gamma_0``/``gamma_1`` arrays. Checkpoints stamp the scale
    they were written under (``gamma_endpoint_scale`` in the saved config)
    and ``train.checkpoint.restore_checkpoint`` rescales mismatched
    endpoints on load (unstamped = pre-reparameterisation raw endpoints,
    scale 1.0), so old learned-schedule checkpoints restore to the same
    semantic schedule.
    """

    hidden: int = 1024
    endpoint_scale: float = 25.0

    def setup(self):
        self.l1 = PositiveLinear(1, name="l1")
        self.l2 = PositiveLinear(self.hidden, name="l2")
        self.l3 = PositiveLinear(1, name="l3")
        s = self.endpoint_scale
        self.gamma_0 = self.param("gamma_0", lambda k: jnp.asarray([-5.0 / s]))
        self.gamma_1 = self.param("gamma_1", lambda k: jnp.asarray([10.0 / s]))

    def gamma_tilde(self, t: jnp.ndarray) -> jnp.ndarray:
        l1_t = self.l1(t)
        return l1_t + self.l3(nn.sigmoid(self.l2(l1_t)))

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        """t: ``[..., 1]`` in [0, 1] -> gamma ``[..., 1]``."""
        g0 = self.gamma_tilde(jnp.zeros_like(t))
        g1 = self.gamma_tilde(jnp.ones_like(t))
        gt = self.gamma_tilde(t)
        normalized = (gt - g0) / (g1 - g0)
        gamma_0 = self.gamma_0 * self.endpoint_scale
        gamma_1 = self.gamma_1 * self.endpoint_scale
        return gamma_0 + (gamma_1 - gamma_0) * normalized
