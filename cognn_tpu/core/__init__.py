from cognn_tpu.core.ring import (  # noqa: F401
    RingSpec,
    RING64,
    RING32,
    ring_add,
    ring_sub,
    ring_neg,
    ring_mul,
    ring_from_u64,
    ring_to_u64,
    ring_zeros,
)
from cognn_tpu.core.fixedpoint import (  # noqa: F401
    FixedPointSpec,
    fp_encode,
    fp_decode,
    fp_encode_ring,
    fp_decode_ring,
)
from cognn_tpu.core.shares import (  # noqa: F401
    share_split,
    share_merge,
    share_split_np,
    share_merge_np,
)
