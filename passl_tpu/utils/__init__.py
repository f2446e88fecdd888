from . import config as cfg_util  # noqa: F401
from . import logger  # noqa: F401
from .infohub import runtime_info_hub  # noqa: F401
from .misc import AttrDict, AverageMeter, SmoothedValue, create_attr_dict  # noqa: F401
from .registry import Registry, build_from_config  # noqa: F401
