"""Training engine: optimizers, LR schedules, SPMD train step, checkpoints."""

from .checkpoint import load_checkpoint, load_transfer, save_checkpoint
from .lr_scheduler import (
    ReduceOnPlateau,
    constant,
    cyclic,
    get_lr_schedule,
    noam,
    one_cycle,
    warm_restarts,
)
from .lr_finder import run_lr_finder
from .optim import adamod, eve, get_optimizer, gradient_centralization, novograd, ralamb
from .reporter import Reporter, grab_metric, read_report_csv
from .trainer import (
    Trainer,
    TrainState,
    TrainStepConfig,
    init_train_state,
    make_eval_step,
    make_train_step,
)
