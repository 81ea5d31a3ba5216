"""Device mesh + sharding layer.

The reference has NO parallelism of any kind (SURVEY §2.4: single process,
single device, batch-1). On TPU this becomes a first-class subsystem:

  * ``data`` axis  — batch data-parallel embedding extraction and training
    (gradient psum rides the ICI).
  * ``row``/``col`` axes — 2-D sharding of the [N_deg, N_nmr] distance
    matrix for large-scale scoring (BASELINE config 4: 10k x 100 on v5e-8).

All collectives are XLA-inserted via NamedSharding/pjit — no hand-rolled
NCCL/MPI analogue, per the scaling-book recipe: pick a mesh, annotate
shardings, let the compiler place all-gathers/reduce-scatters.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over all (or the first n) local devices: axis 'data'."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("data",))


def grid_mesh(rows: int, cols: int, devices=None) -> Mesh:
    """2-D mesh for distance-matrix sharding: axes ('row', 'col')."""
    devs = np.array(list(devices if devices is not None else jax.devices()))
    if devs.size < rows * cols:
        raise ValueError(f"need {rows * cols} devices, have {devs.size}")
    return Mesh(devs[: rows * cols].reshape(rows, cols), axis_names=("row", "col"))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) over the given mesh axis, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Optional[Mesh], axis: str = "data"):
    """Device-put a host batch with dim-0 sharded over the mesh."""
    if mesh is None:
        return x
    return jax.device_put(x, batch_sharding(mesh, axis))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


from functools import lru_cache


@lru_cache(maxsize=8)
def _sharded_cdist_fn(mesh: Mesh):
    from ..ops.distance import cdist

    @jax.jit
    def f(a, b):
        d = cdist(a, b)
        return jax.lax.with_sharding_constraint(
            d, NamedSharding(mesh, P("row", "col"))
        )

    return f


def sharded_cdist(a, b, mesh: Mesh):
    """Distance matrix with rows sharded over 'row' and cols over 'col'.

    a [N, D] row-sharded, b [M, D] col-sharded; the Gram matmul contracts the
    replicated feature axis locally, so the [N, M] output lands already
    2-D-sharded with zero collectives (N, M padded to multiples of the mesh
    by the caller). The jitted function is cached per mesh (a fresh closure
    per call would recompile every time).
    """
    a = jax.device_put(a, NamedSharding(mesh, P("row", None)))
    b = jax.device_put(b, NamedSharding(mesh, P("col", None)))
    return _sharded_cdist_fn(mesh)(a, b)
