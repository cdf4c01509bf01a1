"""On-device radial distribution function (RDF) from the excited-oxygen site.

Replaces the reference's host-side Python-loop RDF (ref evaluate_RDF.py:39-60)
with a vectorised, vmappable jnp implementation:

  * distances from node 0 (exO, ref make_dataset.py puts exO at index 0)
    to every other node,
  * histogram in ``dR``-wide bins over (dR, R], normalised by the ideal-gas
    shell density ``4*pi*rho*r^2*dR`` with ``rho = N / (4/3*pi*R^3)``,
  * Gaussian smoothing (scipy ``gaussian_filter1d`` semantics: truncate=4,
    reflect boundary) as an explicit 1-D correlation.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(sigma: float, truncate: float = 4.0) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_smooth_1d(y: jnp.ndarray, sigma: float, truncate: float = 4.0):
    """scipy.ndimage.gaussian_filter1d equivalent (mode='reflect')."""
    kernel = jnp.asarray(_gaussian_kernel(sigma, truncate))
    radius = (kernel.shape[0] - 1) // 2
    # 'reflect' boundary: (d c b a | a b c d | d c b a)
    left = y[..., :radius][..., ::-1]
    right = y[..., -radius:][..., ::-1]
    padded = jnp.concatenate([left, y, right], axis=-1)
    # Correlate: out[i] = sum_k padded[i + k] * kernel[k]
    window = padded.shape[-1] - kernel.shape[0] + 1
    idx = jnp.arange(window)[:, None] + jnp.arange(kernel.shape[0])[None, :]
    return jnp.sum(padded[..., idx] * kernel, axis=-1)


def rdf_from_exo(
    pos: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    sigma: float = 5.0,
    r_max: float = 5.0,
    dr: float = 0.01,
    normalize: bool = False,
) -> jnp.ndarray:
    """RDF of distances from node 0, matching ref evaluate_RDF.py:48-60.

    Args:
      pos: ``[N, 3]`` positions (node 0 = exO).
      mask: optional ``[N]`` validity mask for padded graphs.

    Returns:
      ``[nbins]`` smoothed RDF with nbins = round(r_max/dr).
    """
    nbins = int(round(r_max / dr))
    n = pos.shape[0]
    d = jnp.linalg.norm(pos[1:] - pos[0], axis=-1)
    valid = jnp.ones((n - 1,), jnp.float32)
    num_atom = jnp.asarray(float(n))
    if mask is not None:
        valid = mask[1:].astype(jnp.float32) * mask[0].astype(jnp.float32)
        num_atom = jnp.sum(mask.astype(jnp.float32))

    # Reference bins: r_k = (k+1)*dr, count distances with r_k < d < r_k + dr
    # => bin index floor(d/dr) - 1 (distances below dr fall out of range).
    bin_idx = jnp.floor(d / dr).astype(jnp.int32) - 1
    in_range = (bin_idx >= 0) & (bin_idx < nbins)
    weights = valid * in_range.astype(jnp.float32)
    counts = jnp.zeros((nbins,), jnp.float32).at[
        jnp.clip(bin_idx, 0, nbins - 1)
    ].add(weights)

    rho = num_atom / (4.0 / 3.0 * jnp.pi * r_max**3)
    r = (jnp.arange(nbins, dtype=jnp.float32) + 1.0) * dr
    g = counts / (4.0 * jnp.pi * rho * r**2 * dr)
    g = gaussian_smooth_1d(g, sigma)
    if normalize:
        g = g / jnp.max(g)
    return g


def rdf_cos_similarity(rdf_a: jnp.ndarray, rdf_b: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity between two RDF curves (ref evaluate_RDF.py:62-63)."""
    return jnp.sum(rdf_a * rdf_b) / (
        jnp.linalg.norm(rdf_a) * jnp.linalg.norm(rdf_b)
    )
