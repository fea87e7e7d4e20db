"""Evaluation metrics: ADD(-S), AUC, reprojection, BOP writer."""
from .add import ADDMetric, add_auc, eval_pose_errors, match_results  # noqa: F401
from .bop_writer import write_bop_results  # noqa: F401
