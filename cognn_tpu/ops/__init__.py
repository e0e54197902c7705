from cognn_tpu.ops.aggregate import segment_sum_rows  # noqa: F401
from cognn_tpu.ops.intmatmul import ring_matmul, ring_matmul_np  # noqa: F401


def __getattr__(name):
    # lazy kernel exports (pallas imports are deferred)
    if name in ("PallasSpmm",):
        from cognn_tpu.ops.pallas_spmm import PallasSpmm

        return PallasSpmm
    if name in ("PallasSddmm",):
        from cognn_tpu.ops.pallas_sddmm import PallasSddmm

        return PallasSddmm
    if name in ("build_bcsr", "BcsrMatrix", "reorder_for_locality"):
        import cognn_tpu.ops.bcsr as bcsr

        return getattr(bcsr, name)
    raise AttributeError(name)
