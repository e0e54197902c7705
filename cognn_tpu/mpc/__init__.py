from cognn_tpu.mpc.protocol import Protocol  # noqa: F401
from cognn_tpu.mpc.engine import MpcGasEngine  # noqa: F401
