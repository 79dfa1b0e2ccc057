from .buckets import segment_bucket, capacity_for_segment, segment_capacity_df  # noqa: F401
