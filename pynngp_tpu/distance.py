"""Distance / similarity functions (TPU-native analog of the reference's
``include/distFunc.h`` abstract ``DistFunc`` hierarchy — SURVEY.md section 2,
"Distance functions" row).

The reference exposes Euclidean distance plus (in the bwpriest fork) a
dot-product/cosine-type similarity so NNGP runs on embedding spaces.  Here a
distance function is a small stateless object with two vectorized methods; all
math is ``jnp`` and shape-polymorphic so the same object serves the host-side
neighbor search (via numpy arrays) and the jitted covariance builds.

Design note (TPU): pairwise distances inside the Vecchia build are computed on
gathered fixed-shape neighbor blocks ``(..., m, d)`` — elementwise VPU work —
rather than via a virtual-dispatch scalar call per pair as in the C++
reference.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["Euclidean", "DotProduct", "get_distance"]


class Euclidean:
    """Euclidean (L2) distance. Reference semantics: dist(x, y) = ||x - y||."""

    name = "euclidean"

    def pairwise(self, a, b):
        """Distance matrix between rows of ``a (..., p, d)`` and ``b (..., q, d)``."""
        d2 = self.pairwise_sq(a, b)
        return jnp.sqrt(d2)

    def pairwise_sq(self, a, b):
        """Squared distances — cheaper when the kernel only needs d**2."""
        diff = a[..., :, None, :] - b[..., None, :, :]
        return jnp.sum(diff * diff, axis=-1)

    def one_to_many(self, x, b):
        """Distances from a single point ``x (..., d)`` to rows of ``b (..., q, d)``."""
        diff = x[..., None, :] - b
        return jnp.sqrt(jnp.sum(diff * diff, axis=-1))

    # numpy (host, f64) variants — one-time precompute of distance tables
    # must NOT run on device (eager round-trips + TPU matmul precision)
    def pairwise_np(self, a, b):
        diff = a[..., :, None, :] - b[..., None, :, :]
        return np.sqrt(np.maximum((diff * diff).sum(-1), 0.0))

    def one_to_many_np(self, x, b):
        diff = x[..., None, :] - b
        return np.sqrt(np.maximum((diff * diff).sum(-1), 0.0))


class DotProduct:
    """Similarity-based 'distance' for embedding spaces (bwpriest fork
    extension): d(x, y) = 1 - <x, y> / (||x|| ||y||)  (cosine dissimilarity).

    With unit-norm inputs this equals ``1 - <x, y>`` (pure dot-product
    similarity).  Kernels treat the returned value exactly like a distance:
    zero at identical (parallel) inputs, larger when less similar.
    """

    name = "dotproduct"

    def __init__(self, normalize: bool = True, eps: float = 1e-12):
        self.normalize = normalize
        self.eps = eps

    def _maybe_normalize(self, x):
        if not self.normalize:
            return x
        nrm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
        return x / jnp.maximum(nrm, self.eps)

    def pairwise(self, a, b):
        a = self._maybe_normalize(a)
        b = self._maybe_normalize(b)
        # (..., p, d) @ (..., d, q) -> (..., p, q): MXU contraction.  HIGHEST
        # precision is required: the default bf16 TPU matmul loses ~1e-2 in
        # 1 - sim near sim = 1 (exactly where neighbors live), which feeds
        # straight into the Cholesky.
        sim = jnp.matmul(a, jnp.swapaxes(b, -1, -2), precision="highest")
        return jnp.maximum(1.0 - sim, 0.0)

    def pairwise_sq(self, a, b):
        d = self.pairwise(a, b)
        return d * d

    def one_to_many(self, x, b):
        x = self._maybe_normalize(x)
        b = self._maybe_normalize(b)
        sim = jnp.sum(x[..., None, :] * b, axis=-1)
        return jnp.maximum(1.0 - sim, 0.0)

    def _normalize_np(self, x):
        if not self.normalize:
            return x
        nrm = np.linalg.norm(x, axis=-1, keepdims=True)
        return x / np.maximum(nrm, self.eps)

    def pairwise_np(self, a, b):
        a = self._normalize_np(np.asarray(a, np.float64))
        b = self._normalize_np(np.asarray(b, np.float64))
        sim = np.einsum("...pd,...qd->...pq", a, b)
        return np.maximum(1.0 - sim, 0.0)

    def one_to_many_np(self, x, b):
        x = self._normalize_np(np.asarray(x, np.float64))
        b = self._normalize_np(np.asarray(b, np.float64))
        sim = (x[..., None, :] * b).sum(-1)
        return np.maximum(1.0 - sim, 0.0)


_REGISTRY = {
    "euclidean": Euclidean,
    "dotproduct": DotProduct,
}


def get_distance(name_or_obj):
    """Resolve a distance function from a name or pass an instance through."""
    if isinstance(name_or_obj, str):
        return _REGISTRY[name_or_obj.lower()]()
    return name_or_obj
