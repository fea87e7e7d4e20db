"""Data layer: BOP readers, transform pipeline, synthetic scenes."""
from .masks import InstanceMasks  # noqa: F401
from .synthetic import default_intrinsics, jitter_pose, synthetic_batch  # noqa: F401
