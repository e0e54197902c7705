from cognn_tpu.utils.glibc_rand import GlibcRand, glorot_init  # noqa: F401
from cognn_tpu.utils.logging_utils import duration_span, log  # noqa: F401
