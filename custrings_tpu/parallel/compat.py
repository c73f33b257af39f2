"""Version-tolerant imports for sharding primitives."""

import functools


def _wrap(raw, vma_kw: bool):
    if not vma_kw:
        return raw

    @functools.wraps(raw)
    def shard_map(*args, **kwargs):
        # Pallas kernels inside the shard body (the ragged-window key
        # packer on real TPU meshes) declare plain ShapeDtypeStructs,
        # which jax >= 0.8's varying-manual-axes check rejects outright.
        # The bodies here prove replication explicitly where it matters
        # (scalar pmax on merged outputs), so run with the check off.
        kwargs.setdefault("check_vma", False)
        return raw(*args, **kwargs)

    return shard_map


try:
    from jax import shard_map as _raw  # jax >= 0.7 style

    _HAS_VMA = True
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _raw  # noqa: F401

    _HAS_VMA = False

shard_map = _wrap(_raw, _HAS_VMA)
