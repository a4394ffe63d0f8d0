from crypto_price_tracker_with_etl_dashboard_spark.functions import (
    dedup,
    sampling,
    similarity,
    text,
)
from crypto_price_tracker_with_etl_dashboard_spark.functions.sampling import (
    hash_split,
    lcg_bucket,
    pack_chunks,
    per_group_cap,
    stratified_sample,
    xxhash_bucket,
)

__all__ = [
    "text",
    "dedup",
    "similarity",
    "sampling",
    "hash_split",
    "stratified_sample",
    "per_group_cap",
    "pack_chunks",
    "lcg_bucket",
    "xxhash_bucket",
]
