from .join import join_count_and_index, join_unique_impl, bucket_size
from .hashing import murmur64, fnv1a64
from .radix import partitioned_join, partitioned_join_indices, choose_num_partitions

__all__ = [
    "join_count_and_index",
    "join_unique_impl",
    "bucket_size",
    "murmur64",
    "fnv1a64",
    "partitioned_join",
    "partitioned_join_indices",
    "choose_num_partitions",
]
