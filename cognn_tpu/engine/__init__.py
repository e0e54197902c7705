from cognn_tpu.engine.plan import DevicePlan, build_device_plan  # noqa: F401
from cognn_tpu.engine.gas import GasEngine  # noqa: F401
from cognn_tpu.engine.analytics import (  # noqa: F401
    AnalyticsEngine,
    VertexProgram,
    bfs_program,
    cc_program,
    pagerank_program,
    sssp_program,
)
