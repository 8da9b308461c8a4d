from cobs_tpu.ops.query_kernel import gather_and_count_pallas  # noqa: F401
