from .join import join_count_and_index, bucket_size
from .hashing import murmur64, fnv1a64

__all__ = ["join_count_and_index", "bucket_size", "murmur64", "fnv1a64"]
