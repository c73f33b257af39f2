"""Version-tolerant imports for sharding primitives."""

try:
    from jax import shard_map  # jax >= 0.7 style
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # noqa: F401
