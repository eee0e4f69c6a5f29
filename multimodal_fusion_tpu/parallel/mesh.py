"""Device mesh + sharding helpers.

The parity workloads are data-parallel: a ``Mesh`` with a ``data`` axis;
case-window batches shard their leading (window) axis across ICI, parameters
replicate.  XLA inserts the psum for the gradient all-reduce — this is the
NCCL-replacement comm backend (SURVEY.md §2.6).

Multi-host / multi-slice (DCN) story: ``make_mesh_2d`` builds a
``(replica, data)`` mesh where ``replica`` is the SLOW axis (DCN across
slices/hosts — the leading axis of ``create_device_mesh``'s device order,
which keeps each slice's devices contiguous along the trailing axis) and
``data`` is the FAST axis (ICI within a slice).  Batches shard over BOTH
axes (``P(("replica", "data"))`` — replica*data-way DP) while parameters
replicate; XLA then lowers the gradient all-reduce hierarchically:
reduce-scatter/all-gather ride ICI within each slice and only the small
partial-sum crosses DCN.  That is the standard multi-slice recipe (see the
scaling-book data-parallelism chapter); no NCCL/MPI process groups to manage
— the mesh axis order IS the topology statement.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]).reshape(n), (axis,))


def make_mesh_2d(
    replica: int,
    data: int,
    axis_names: Tuple[str, str] = ("replica", "data"),
) -> Mesh:
    """``(replica, data)`` mesh: replica = slow/DCN axis, data = fast/ICI.

    Uses ``mesh_utils.create_device_mesh`` so the physical ICI topology maps
    onto the trailing (fast) axis when running on real slices; falls back to
    a plain reshape for virtual/CPU device sets."""
    devs = jax.devices()
    n = replica * data
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_device_mesh((replica, data), devices=devs[:n])
    except Exception:
        arr = np.asarray(devs[:n]).reshape(replica, data)
    return Mesh(arr, axis_names)


def mesh_from_shape(mesh_shape) -> Optional[Mesh]:
    """Build a mesh from a ``{"replica": R, "data": N}`` config dict.

    Shared by the survival/alignment/VAE trainers.  Returns ``None`` (with a
    warning) when the host has fewer devices than the shape needs — persisted
    configs from larger hosts must stay loadable for eval/viz on small hosts,
    so the trainers fall back to running unsharded instead of refusing to
    construct."""
    if not mesh_shape:
        return None
    n = int(mesh_shape.get("data", 0))
    r = int(mesh_shape.get("replica", 0))
    need = max(r, 1) * max(n, 1)
    if need > len(jax.devices()):
        print(
            f"mesh_shape {mesh_shape} needs {need} devices, "
            f"have {len(jax.devices())}; running unsharded"
        )
        return None
    if r > 1:
        # replica-only configs ({"replica": R} or data<=1) still get an
        # R-way mesh: an (R, 1) grid shards the batch R ways
        return make_mesh_2d(r, max(n, 1))
    if n > 1:
        return make_mesh(n)
    return None


def batch_sharding(mesh: Mesh, axis: Optional[str] = None) -> NamedSharding:
    """Shard the leading axis over ALL mesh axes (or one named axis):
    on a 1-axis mesh this is plain DP; on a (replica, data) mesh the batch
    splits replica*data ways and gradient reduction is hierarchical."""
    spec = P(axis) if axis is not None else P(tuple(mesh.axis_names))
    return NamedSharding(mesh, spec)

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: Optional[str] = None):
    """Place every leaf of a window batch with its leading dim sharded over
    ALL mesh axes by default (replica*data-way on a 2-axis mesh)."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def place_batch(mesh: Optional[Mesh], tree, scan: bool = False,
                batch_size: Optional[int] = None):
    """The ONE batch-placement rule every trainer uses (it used to live in
    three per-trainer copies — review finding r3).

    Shards each leaf's batch axis — axis 0, or axis 1 for stacked [S, B,
    ...] scan groups (``scan=True``; the scan axis is sequential and stays
    unsharded) — over ALL mesh axes.  Fallback to the leaf's existing
    (replicated) placement whenever the batch dim doesn't divide the device
    count: per leaf by default (e.g. alignment's small negative pool), or
    for the WHOLE tree when ``batch_size`` is given (the survival window
    rule: a leftover window stays fully replicated).  ``mesh=None`` is a
    no-op so call sites need no guard."""
    if mesh is None:
        return tree
    n_dev = mesh.devices.size
    if batch_size is not None and batch_size % n_dev:
        return tree
    axes = tuple(mesh.axis_names)
    sh = NamedSharding(mesh, P(None, axes) if scan else P(axes))
    b_axis = 1 if scan else 0

    def place(x):
        if x.ndim <= b_axis or x.shape[b_axis] % n_dev:
            return x
        return jax.device_put(x, sh)

    return jax.tree.map(place, tree)
