from .trainer import (
    OrbaxManager,
    TrainState,
    create_train_state,
    load_checkpoint,
    make_aif_eval_step,
    make_aif_train_step,
    render_focal_stack,
    save_checkpoint,
    validate,
)

__all__ = [
    "OrbaxManager", "TrainState", "create_train_state", "load_checkpoint",
    "make_aif_eval_step", "make_aif_train_step", "render_focal_stack",
    "save_checkpoint", "validate",
]
