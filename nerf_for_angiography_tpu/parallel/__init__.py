from .mesh import (
    create_mesh,
    data_sharding,
    pad_to_multiple,
    replicate,
    replicated,
    shard_leading_axis,
)

__all__ = [
    "create_mesh",
    "data_sharding",
    "pad_to_multiple",
    "replicate",
    "replicated",
    "shard_leading_axis",
]
