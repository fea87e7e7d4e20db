"""Training: config tree, optimizer, train/eval steps, checkpointing."""
from .config import (  # noqa: F401
    Config,
    DataConfig,
    JitterConfig,
    LossConfig,
    ModelConfig,
    OptimConfig,
    RenderConfig,
    YCBV_CLASS_NAMES,
    YCBV_MESH_DIAMETERS,
    YCBV_SYMMETRIC_CLASSES,
)
from .points_bank import PointsBank, build_points_bank  # noqa: F401
from .steps import (  # noqa: F401
    TrainState,
    build_model,
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    render_at_pose,
    scflow_loss,
)
