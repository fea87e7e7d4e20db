"""Device mesh / sharding helpers and multihost bootstrap."""
from .mesh import (  # noqa: F401
    data_sharding,
    initialize_distributed,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
