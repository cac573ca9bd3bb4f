from parrot_tpu.train.optim import adam_init, adam_update  # noqa: F401
from parrot_tpu.train.checkpoint import CheckpointManager  # noqa: F401
from parrot_tpu.train.loop import Trainer  # noqa: F401
