"""Device-mesh parallelism (SPMD over ICI via jax.sharding + jit)."""

from master_thesis_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
