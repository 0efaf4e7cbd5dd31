from sdumc_tpu.train.schedule import warmup_step_decay_factor, make_lr_schedule  # noqa: F401
from sdumc_tpu.train.state import create_train_state  # noqa: F401
from sdumc_tpu.train.step import make_eval_step, make_train_step  # noqa: F401
