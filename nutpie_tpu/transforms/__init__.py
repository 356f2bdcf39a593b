from .flow import (
    FlowConfig,
    fisher_distance,
    flow_forward,
    flow_inverse,
    init_flow_params,
    refit_diag,
    train_flow,
)

__all__ = [
    "FlowConfig",
    "init_flow_params",
    "flow_forward",
    "flow_inverse",
    "fisher_distance",
    "refit_diag",
    "train_flow",
]
