from .checkpoint import (
    CheckpointManager,
    load_grid_vtk,
    load_model,
    save_grid_vtk,
    save_model,
)
from .config import TrainConfig, categories_for, parse_train_args
from .logging import ExperimentLogger
from .loop import TrainResult, build_page_data, train
from .train import (
    TestView,
    TrainState,
    create_train_state,
    drop_test_view,
    make_eval_step,
    make_optimizer,
    make_test_view,
    make_train_step,
    render_rays,
)

__all__ = [
    "CheckpointManager",
    "ExperimentLogger",
    "TestView",
    "TrainConfig",
    "TrainResult",
    "TrainState",
    "build_page_data",
    "categories_for",
    "create_train_state",
    "drop_test_view",
    "load_grid_vtk",
    "load_model",
    "make_eval_step",
    "make_optimizer",
    "make_test_view",
    "make_train_step",
    "parse_train_args",
    "render_rays",
    "save_grid_vtk",
    "save_model",
    "train",
]
