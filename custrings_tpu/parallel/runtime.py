"""Multi-host runtime: process bootstrap + global meshes + global columns.

VERDICT r1 missing item 4.  The reference is a single-process single-GPU
library (SURVEY §2.8 — CUDA IPC is its only cross-process story); a TPU
deployment is a *job*: one JAX process per host, chips joined by ICI
inside a slice and DCN across slices.  This module is the bootstrap:

    runtime.init_runtime()                     # one call per process
    mesh = runtime.global_mesh()               # every chip in the job
    sc   = runtime.shard_global(rows, mesh)    # rows -> global sharded col
    values, n = sc.categorize()                # SPMD collective ops

Design notes
- `init_runtime` wraps jax.distributed.initialize and reads the standard
  env (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID) so launchers can
  stay generic; single-process callers may skip it entirely.
- `hybrid_mesh` orders axes (dcn, ici): mesh dims are laid out so that
  the *inner* axis maps to chips of one process/slice — collectives along
  it ride ICI; only reductions over the outer axis cross DCN (the
  scaling-book mesh recipe).
- On CPU (tests / the multi-process simulation harness in
  tests/multihost/) collectives use the gloo backend; the same program
  text runs unchanged on a TPU pod.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_initialized = False


def init_runtime(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Join (or create) the distributed job.  No-op when single-process.

    Resolution order: explicit args > COORDINATOR_ADDRESS /
    NUM_PROCESSES / PROCESS_ID env > single-process (returns False).
    Safe to call twice (idempotent)."""
    global _initialized
    if _initialized:
        return True
    # already joined (e.g. the launcher initialized before importing this
    # package — required, since importing custrings_tpu touches the
    # backend): adopt the existing client
    from jax._src import distributed as _dist_state

    if getattr(_dist_state.global_state, "client", None) is not None:
        _initialized = True
        return True
    coordinator = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    if not coordinator or not num_processes:
        return False
    # NB: must not touch the backend (jax.devices()/default_backend())
    # before initialize(); read the *configured* platform instead
    if "cpu" in (jax.config.jax_platforms or ""):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator, num_processes=num_processes, process_id=process_id
    )
    _initialized = True
    return True


def is_initialized() -> bool:
    return _initialized


def shutdown():
    global _initialized
    if _initialized:
        jax.distributed.shutdown()
        _initialized = False


def global_mesh(axis: str = "data") -> Mesh:
    """One flat mesh axis over every chip in the job."""
    return Mesh(np.array(jax.devices()), (axis,))


def hybrid_mesh(dcn_axis: str = "hosts", ici_axis: str = "data") -> Mesh:
    """[processes, chips-per-process] mesh: the inner axis is ICI-local.

    Shardings that keep their collectives on `ici_axis` never touch DCN;
    put the all_to_all/all_gather-heavy dimension there."""
    local = len(jax.local_devices())
    n_proc = jax.process_count()
    devs = np.empty((n_proc, local), dtype=object)
    for d in jax.devices():
        devs[d.process_index][_local_index(d)] = d
    return Mesh(devs, (dcn_axis, ici_axis))


def _local_index(d) -> int:
    locs = jax.local_devices(process_index=d.process_index)
    for i, ld in enumerate(locs):
        if ld.id == d.id:
            return i
    raise ValueError(f"device {d} not in its process's local list")


def shard_global(strs, mesh: Mesh, axis: str = "data"):
    """Build a globally-sharded column from host rows (replicated input).

    Every process passes the SAME full row list; each contributes the
    stacked-shard slice its local devices own via
    jax.make_array_from_process_local_data.  Returns a
    ShardedStringColumn whose ops run SPMD across the whole job."""
    from ..column import from_host_strings
    from . import dist
    from .sharded import ShardedStringColumn

    S = int(np.prod(mesh.devices.shape))
    col = from_host_strings(strs)
    d, o, v, a = dist.shard_column(col, S)
    d, o, v, a = (np.asarray(jax.device_get(x)) for x in (d, o, v, a))
    if jax.process_count() == 1:
        import jax.numpy as jnp

        arrs = tuple(jnp.asarray(x) for x in (d, o, v, a))
    else:
        per = S // jax.process_count()
        lo = jax.process_index() * per
        arrs = tuple(
            jax.make_array_from_process_local_data(
                NamedSharding(mesh, P(mesh.axis_names[0])),
                x[lo : lo + per],
            )
            for x in (d, o, v, a)
        )
    return ShardedStringColumn(
        *arrs, mesh, mesh.axis_names[0], nrows=col.size
    )
