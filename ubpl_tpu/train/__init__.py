from . import losses, schedules  # noqa: F401
from .supervised import SupervisedTrainer          # noqa: F401
from .mean_teacher import MeanTeacherTrainer       # noqa: F401
from .mt_ubpl import MTUBPLTrainer                 # noqa: F401
from .dualpose_ubpl import DualPoseUBPLTrainer     # noqa: F401
