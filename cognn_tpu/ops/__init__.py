from cognn_tpu.ops.aggregate import segment_sum_rows  # noqa: F401
