"""Pairwise Euclidean distance as one MXU matmul.

Replaces ``scipy.spatial.distance.cdist`` (C loop; reference
`/root/reference/src/nomad_audio/nomad.py:108`,
`src/training/train_triplet.py:267,322,374,438`) with the stable matmul
formulation d(a,b) = sqrt(max(0, |a|^2 + |b|^2 - 2 a.b)). The reference
validates cdist against a naive norm (`train_triplet.py:487-489`); our test
suite does the same cross-check.

For the large-scale scoring config (10k x 100 on a v5e-8 mesh) the matrix is
2-D sharded: rows (degraded) on one mesh axis, columns (NMR) on the other —
see :mod:`nomad_tpu.parallel.mesh`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("precision",))
def cdist(a, b, precision="highest"):
    """Euclidean distance matrix between rows of a [N, D] and b [M, D].

    Error model: the Gram formulation cancels catastrophically when
    ||a-b|| << ||a||. Both inputs are first centered on the pooled mean
    (translation leaves distances invariant), which bounds the norms by the
    point-cloud spread; for NOMAD's unit-norm embeddings the absolute error
    vs exact is < 5e-4 even at d=0, well inside the 1e-3 parity budget
    (validated against scipy in tests/test_distance.py).
    """
    # precision 'highest': on TPU the default matmul precision is bf16,
    # and the Gram term then disagrees with the f32 elementwise norms by
    # ~1e-3 — sqrt turns that into a PHANTOM 0.001 distance between
    # IDENTICAL embeddings (caught by the round-3 CLI drive; the [N,256]
    # x [M,256] matmul is microscopic, full f32 costs nothing)
    a = jnp.asarray(a, dtype=jnp.float32)
    b = jnp.asarray(b, dtype=jnp.float32)
    center = (jnp.mean(a, axis=0) + jnp.mean(b, axis=0)) * 0.5
    a = a - center
    b = b - center
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)  # [N, 1]
    b2 = jnp.sum(b * b, axis=-1, keepdims=True).T  # [1, M]
    ab = jnp.dot(a, b.T, preferred_element_type=jnp.float32, precision=precision)
    sq = jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)
    return jnp.sqrt(sq)


@jax.jit
def cdist_diag(a, b):
    """Paired distances ||a_i - b_i|| — the reference's full-reference mode
    (np.diag(cdist(...)), `train_triplet.py:438-439`) without the O(N^2) waste."""
    d = jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32)
    return jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 0.0))
