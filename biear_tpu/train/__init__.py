from .losses import unpack_targets, task_loss, q_regularizers, sanitize_x3, sanitize_wav
from .optim import make_optimizer, PlateauScheduler, TrainHyper
from .loop import make_train_step, make_eval_step, is_better_tuple
