"""Training runtime: loss, schedules, sharded train step, checkpointing,
recorder, trainer loop (rebuild of /root/reference/lib/train/*)."""

from enerf_tpu.train.loss import compute_loss, mse2psnr
from enerf_tpu.train.schedule import make_lr_schedule
from enerf_tpu.train.state import TrainState, create_train_state
from enerf_tpu.train.step import make_train_step, make_eval_step
