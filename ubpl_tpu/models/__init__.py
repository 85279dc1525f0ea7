from .hourglass import StackedHourglass        # noqa: F401
from .litepose import LitePose                 # noqa: F401
from .classification import VGG, ResNet, MobileNet  # noqa: F401
from .factory import (create_pose_model, create_class_model, init_model,
                      init_model_stacked, param_count)  # noqa: F401
from .init_strategies import parameters_initialize  # noqa: F401
from .torch_import import (import_hourglass,
                           load_reference_checkpoint)  # noqa: F401
