"""EELS spectrum compressor MLP.

Equivalent of the reference ``SpectrumCompressor`` (ref DataPreprocessor.py:
4-22): Linear/ReLU stack 200 -> hidden_dims -> 32 applied per node. Batched
over arbitrary leading axes; spectra live as ``[..., S]``.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class SpectrumCompressor(nn.Module):
    hidden_dims: Sequence[int] = (150, 100, 50)
    out_dim: int = 32
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, spectrum: jnp.ndarray) -> jnp.ndarray:
        y = spectrum.astype(self.compute_dtype)
        for i, f in enumerate(self.hidden_dims):
            y = nn.Dense(f, dtype=self.compute_dtype, name=f"dense{i}")(y)
            y = nn.relu(y)
        y = nn.Dense(
            self.out_dim, dtype=self.compute_dtype, name="dense_out"
        )(y)
        return y.astype(spectrum.dtype)
