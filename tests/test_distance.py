"""Distance ops vs scipy (the reference's own cross-check pattern,
`/root/reference/src/training/train_triplet.py:486-489`)."""

import numpy as np
from scipy.spatial.distance import cdist as scipy_cdist

from nomad_tpu.ops import cdist, cdist_diag


def test_cdist_matches_scipy(rng):
    a = rng.standard_normal((17, 256)).astype(np.float32)
    b = rng.standard_normal((9, 256)).astype(np.float32)
    ours = np.asarray(cdist(a, b))
    ref = scipy_cdist(a, b)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_cdist_normalized_embeddings(rng):
    """Quirk Q5: L2-normalized rows -> distances in [0, 2]."""
    a = rng.standard_normal((8, 256)).astype(np.float32)
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    b = rng.standard_normal((5, 256)).astype(np.float32)
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    d = np.asarray(cdist(a, b))
    assert d.min() >= 0.0 and d.max() <= 2.0 + 1e-6
    np.testing.assert_allclose(d, scipy_cdist(a, b), atol=1e-5)


def test_cdist_zero_self_distance(rng):
    """Unit-norm rows (the NOMAD regime, Q5): self-distance error must sit
    well inside the 1e-3 parity budget despite the Gram cancellation."""
    a = rng.standard_normal((6, 64)).astype(np.float32)
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    d = np.asarray(cdist(a, a))
    assert np.max(np.abs(np.diag(d))) < 1e-3


def test_cdist_diag_matches_full(rng):
    a = rng.standard_normal((7, 128)).astype(np.float32)
    b = rng.standard_normal((7, 128)).astype(np.float32)
    full = np.asarray(cdist(a, b))
    diag = np.asarray(cdist_diag(a, b))
    np.testing.assert_allclose(diag, np.diag(full), atol=1e-5)


def test_naive_euclidean_crosscheck(rng):
    """Mirror of the reference's euclidean_dist sanity check."""
    a = rng.standard_normal((256,)).astype(np.float32)
    b = rng.standard_normal((256,)).astype(np.float32)
    naive = np.sqrt(np.dot(a - b, a - b))
    ours = float(np.asarray(cdist(a[None], b[None]))[0, 0])
    assert abs(naive - ours) < 1e-4
