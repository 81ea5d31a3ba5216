"""Large-scale sharded scoring — BASELINE config 4: ~10k degraded
utterances x ~100 NMRs on a v5e-8 mesh.

The reference scores 10k files with a batch-1 python loop + scipy cdist
(`/root/reference/src/nomad_audio/nomad.py:172-183, 108`); here the same
job is one streaming pipeline:

  1. embeddings: the bucketed engine with the batch dim sharded over the
     full ('data') mesh — each chip embeds 1/N of every batch, no
     collectives (embeddings gather at the host boundary, 256 floats/file).
  2. distance matrix: rows (degraded) x cols (NMR) on a 2-D ('row','col')
     view of the same chips; the Gram matmul contracts the replicated
     feature axis locally so the [N, M] product is born sharded.
  3. averages: per-row means reduce over the 'col' axis (XLA inserts the
     ICI all-reduce), giving the avg-NOMAD vector row-sharded.

Memory: 10k x 100 f32 = 4 MB — trivially fits; the sharding exists so the
same code path scales to 1M x 10k (40 GB sharded) without change.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import data_mesh, grid_mesh, pad_to_multiple
from .engine import EmbeddingEngine


from functools import lru_cache


@lru_cache(maxsize=8)
def _score_fn(mesh: Mesh):
    """Per-mesh cached jit (a fresh closure per call would recompile)."""
    from ..ops.distance import cdist

    @jax.jit
    def f(a, b, m):
        d = cdist(a, b)
        d = jax.lax.with_sharding_constraint(
            d, NamedSharding(mesh, P("row", "col"))
        )
        # padded NMR columns are excluded from the mean
        valid = (jnp.arange(d.shape[1]) < m).astype(jnp.float32)
        avg = jnp.sum(d * valid[None, :], axis=1) / m.astype(jnp.float32)
        avg = jax.lax.with_sharding_constraint(avg, NamedSharding(mesh, P("row")))
        return avg, d

    return f


@dataclass
class LargeScaleScorer:
    engine: EmbeddingEngine
    rows: int = 0  # grid rows; 0 -> auto (2 x N/2 when N >= 4, else 1 x N)

    def _grid(self) -> Optional[Mesh]:
        devs = jax.devices()
        n = len(devs)
        if n == 1:
            return None
        r = self.rows or (2 if n >= 4 and n % 2 == 0 else 1)
        return grid_mesh(r, n // r)

    def score(
        self,
        deg_paths: Sequence[str],
        nmr_paths: Sequence[str],
        progress: bool = True,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Returns (avg [N_deg], distance_matrix [N_deg, N_nmr])."""
        deg_emb = self.engine.embed_files(deg_paths, progress=progress)
        nmr_emb = self.engine.embed_files(nmr_paths, progress=progress)
        return self.score_embeddings(deg_emb, nmr_emb)

    def score_embeddings(self, deg_emb: np.ndarray, nmr_emb: np.ndarray):
        mesh = self._grid()
        n, m = deg_emb.shape[0], nmr_emb.shape[0]
        if mesh is None:
            from ..ops.distance import cdist

            dm = np.asarray(cdist(deg_emb, nmr_emb))
            return dm.mean(axis=1), dm

        rmesh, cmesh = mesh.shape["row"], mesh.shape["col"]
        n_pad = pad_to_multiple(n, rmesh)
        m_pad = pad_to_multiple(m, cmesh)
        a = np.zeros((n_pad, deg_emb.shape[1]), np.float32)
        a[:n] = deg_emb
        b = np.zeros((m_pad, nmr_emb.shape[1]), np.float32)
        b[:m] = nmr_emb

        a_dev = jax.device_put(a, NamedSharding(mesh, P("row", None)))
        b_dev = jax.device_put(b, NamedSharding(mesh, P("col", None)))
        avg, dm = _score_fn(mesh)(a_dev, b_dev, m)
        return np.asarray(avg)[:n], np.asarray(dm)[:n, :m]


def make_large_scale_scorer(model, params, mesh: Optional[Mesh] = None):
    """Engine over the full device set (DP) + 2-D distance grid."""
    mesh = mesh if mesh is not None else (
        data_mesh() if len(jax.devices()) > 1 else None
    )
    return LargeScaleScorer(EmbeddingEngine(model, params, mesh=mesh))
