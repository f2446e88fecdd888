from .amp import GradScaler, Policy, ScalerState, resolve_dtype  # noqa: F401
from .grad_clip import ClipGradByGlobalNorm, clip_grad_norm, global_norm  # noqa: F401
from .train_state import TrainState, tree_where  # noqa: F401
