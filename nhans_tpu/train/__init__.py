from nhans_tpu.train.optim import make_optimizer  # noqa: F401
from nhans_tpu.train.checkpoint import Checkpointer  # noqa: F401
