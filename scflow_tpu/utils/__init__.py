"""Utilities: flow visualization, warping, profiling, logging."""
from .flow_vis import flow_to_rgb  # noqa: F401
from .warp import backward_warp, forward_warp_splat  # noqa: F401
from .profiling import PhaseTimer, trace  # noqa: F401
