from .engine import Engine  # noqa: F401
from .steps import make_eval_step, make_train_step  # noqa: F401
