from .base import PoseDataSource, SemiData                    # noqa: F401
from .sources import (MouseData, FLICData, LSPData, AP10KData,  # noqa: F401
                      FLYData, PranavData, DATASOURCES, get_datasource)
from .arrays import materialize, PoseArrays, load_images_bgr  # noqa: F401
from .sampler import (TwoStreamBatchSampler,                  # noqa: F401
                      supervised_epoch_batches, valid_batches)
from .cifar import CIFAR10Data, CIFAR100Data, ClassArrays     # noqa: F401
