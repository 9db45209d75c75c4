"""Window functions.

The reference fsk demod uses a symmetric hann window over ``Ndft-1``
(reference utils/fsk.c:91-98); numpy's ``hanning`` matches that convention.
"""

import numpy as np
import jax.numpy as jnp


def hann_symmetric(n: int) -> jnp.ndarray:
    """0.5 - 0.5*cos(2*pi*i/(n-1)) — matches reference utils/fsk.c:96."""
    i = np.arange(n, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * i / (n - 1))
    return jnp.asarray(w, dtype=jnp.float32)


def hann_periodic(n: int) -> jnp.ndarray:
    """Periodic hann (DFT-even), for spectral estimation with overlapping hops."""
    i = np.arange(n, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * i / n)
    return jnp.asarray(w, dtype=jnp.float32)
