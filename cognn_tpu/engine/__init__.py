from cognn_tpu.engine.plan import DevicePlan, build_device_plan  # noqa: F401
from cognn_tpu.engine.gas import GasEngine  # noqa: F401
