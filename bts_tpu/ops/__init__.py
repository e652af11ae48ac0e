"""TPU-native op layer: Local Planar Guidance and friends."""

from bts_tpu.ops.lpg import (  # noqa: F401
    local_planar_guidance,
    lpg_reference,
    decode_plane_eq,
    normalize_plane,
)
