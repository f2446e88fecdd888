from . import init  # noqa: F401
from . import tp_layers  # noqa: F401
from .layers import Attention, Block, DropPath, Identity, Mlp, PatchEmbed  # noqa: F401
from .norm import SplitBatchNorm, l2_normalize  # noqa: F401
