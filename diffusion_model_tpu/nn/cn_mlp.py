"""Coordination-number predictor: spectrum -> atom count regression.

Equivalent of the reference's standalone CN model (ref CN.py:79-96): a ReLU
MLP spectrum(200) -> hidden -> 1 regressing the number of atoms in the local
environment from the EELS spectrum.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class CNPredictor(nn.Module):
    hidden_dims: Sequence[int] = (100, 100, 50, 25)

    @nn.compact
    def __call__(self, spectrum: jnp.ndarray) -> jnp.ndarray:
        y = spectrum
        for i, f in enumerate(self.hidden_dims):
            y = nn.relu(nn.Dense(f, name=f"dense{i}")(y))
        return nn.Dense(1, name="dense_out")(y)
