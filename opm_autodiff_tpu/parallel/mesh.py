"""Distributed execution: spatial domain decomposition over a device mesh.

The reference's only distributed strategy is MPI spatial domain
decomposition with 1-cell halos (Zoltan partitioning + Dune overlap
communication, SURVEY.md §2.9#1, eclgenericcpgridvanguard.cc:76). The
TPU-native equivalent: shard the cell arrays over a 1-D
``jax.sharding.Mesh`` and jit the full Newton step with those shardings.

With the structured (banded) layout the decomposition is a Z-slab split:
cell arrays ordered k-major shard evenly along the mesh, and every
neighbor access in the banded assembly/SpMV is a *static shift along z* —
exactly the pattern GSPMD lowers to nearest-neighbor collective-permute
halo exchanges over ICI (the same communication shape as the reference's
MPI halo swap, without any serialization layer; SURVEY.md §5
"Distributed communication backend").

Krylov dot products become ``psum`` automatically. Wells are replicated
by default (the reference likewise pins wells to one rank by default);
for pod-scale runs parallel/shard_wells.py provides the owner-distributed
assembly (the ParallelWellInfo / CommunicateAboveBelow analog: per-
perforation work on the cell's owner, one well-sized psum).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "z") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=(axis,))


def make_mesh2(nz_dev: int, ny_dev: int, axes=("z", "y")) -> Mesh:
    """2-D (z, y) device mesh for pod-scale areal+vertical domain
    decomposition: the banded arrays shard over BOTH the z and y
    dimensions, so halo exchanges ride two ICI rings (the reference's
    Zoltan partitions are unconstrained graphs; on TPU the structured
    2-D split is the shape XLA lowers to nearest-neighbor
    collective-permutes on both axes). Groundwork for scaling beyond
    1-D z-slabs (the z extent bounds the 1-D mesh at nz devices)."""
    devices = jax.devices()
    need = nz_dev * ny_dev
    assert len(devices) >= need, (len(devices), need)
    return Mesh(np.asarray(devices[:need]).reshape(nz_dev, ny_dev),
                axis_names=axes)


def banded_sharding2(mesh: Mesh, extra_dims: int = 0) -> NamedSharding:
    """Sharding for [nz, ny, nx, ...] banded arrays on a (z, y) mesh."""
    zax, yax = mesh.axis_names
    return NamedSharding(mesh, P(zax, yax, None,
                                 *([None] * extra_dims)))


# --- active-mesh context -----------------------------------------------------
# The sharded Pallas fast paths (parallel/shard_kernels.py) need the Mesh
# at TRACE time to build shard_map regions inside the jitted Newton step;
# GSPMD alone cannot partition pallas_call. Callers that jit over a mesh
# (driver dryrun, parallel tests, future multi-chip CLI) register it here.
_ACTIVE_MESH: list = [None]


def set_active_mesh(mesh: Mesh | None) -> None:
    _ACTIVE_MESH[0] = mesh


def get_active_mesh() -> Mesh | None:
    return _ACTIVE_MESH[0]


class use_mesh:
    """Context manager: ``with use_mesh(mesh): step = jax.jit(fn)(...)``."""

    def __init__(self, mesh: Mesh | None):
        self.mesh = mesh

    def __enter__(self):
        self.prev = _ACTIVE_MESH[0]
        _ACTIVE_MESH[0] = self.mesh
        return self.mesh

    def __exit__(self, *exc):
        _ACTIVE_MESH[0] = self.prev
        return False


def cell_sharding(mesh: Mesh, ndim_extra: int = 0) -> NamedSharding:
    """Sharding for a [N, ...] cell array: N split over the mesh axis.

    With k-major cell ordering and an (nz % n_devices == 0) grid this is
    a Z-slab decomposition.
    """
    axis = mesh.axis_names[0]
    return NamedSharding(mesh, P(axis, *([None] * ndim_extra)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def partition_report(mesh: Mesh, active_mask) -> str:
    """Per-slab balance report.

    Two numbers, because the TPU design changes which one matters:

    * ``active/slab`` — the objective Zoltan's weighted hypergraph
      partition optimizes in the reference
      (eclgenericcpgridvanguard.cc:76 doLoadBalance_), where per-rank
      WORK is proportional to owned active cells.
    * ``compute/slab`` — the dense-banded layout keeps every cell of
      the full cartesian box (inactive cells are identity rows), so
      per-device work is the full-box slab size: equal by construction
      (imbalance exactly 1.0). Zoltan-grade weighted partitioning is
      subsumed — an active-cell imbalance costs nothing on this layout;
      what it measures instead is padding overhead (inactive fraction).
    """
    import numpy as np

    m = np.asarray(active_mask).reshape(mesh.devices.size, -1)
    counts = m.sum(axis=1)
    mean = max(counts.mean(), 1e-300)
    per_slab = m.shape[1]
    return (f"partition balance over {mesh.devices.size} slabs: "
            f"active/slab min={int(counts.min())} max={int(counts.max())} "
            f"imbalance={counts.max() / mean:.3f}; "
            f"compute/slab={per_slab} (dense layout, imbalance=1.000, "
            f"padding={1.0 - counts.sum() / m.size:.1%})")


def shard_problem(mesh: Mesh, cells, topo, u, flag, acc0):
    """Place the per-cell state/statics on the mesh (Z-slab decomposition).

    ``topo`` may be a StructuredTopology (bands shard along their leading
    z dimension) or a FaceStatic list (left replicated — GSPMD then moves
    data per gather, correct but slower; prefer structured grids for
    multi-chip runs).
    """
    from opm_autodiff_tpu.models.structured import (EmbeddedTopology,
                                                    StructuredTopology)

    r = replicated(mesh)
    axis = mesh.axis_names[0]
    nshards = mesh.devices.size

    def put(a):
        # shard the leading dim over the mesh when it divides evenly,
        # else replicate (e.g. an ACTNUM-compressed active count, or the
        # z bands' nz-1 planes). With k-major ordering the divisible
        # arrays split into z-slabs; GSPMD resolves any mixed layouts.
        a = jnp.asarray(a) if not hasattr(a, "ndim") else a
        if a.ndim >= 1 and a.shape[0] % nshards == 0:
            spec = P(axis, *([None] * (a.ndim - 1)))
            return jax.device_put(a, NamedSharding(mesh, spec))
        return jax.device_put(a, r)

    cells_sh = jax.tree.map(put, cells)
    u_sh = put(u)
    flag_sh = put(flag)
    acc0_sh = put(acc0)

    if isinstance(topo, (StructuredTopology, EmbeddedTopology)):
        topo_sh = jax.tree.map(put, topo)
    else:
        topo_sh = jax.tree.map(lambda a: jax.device_put(a, r), topo)
    return cells_sh, topo_sh, u_sh, flag_sh, acc0_sh
