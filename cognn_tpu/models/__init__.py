from cognn_tpu.models.oracle import GasOracle, Metrics  # noqa: F401
