from .vgg import VGG            # noqa: F401
from .resnet import ResNet      # noqa: F401
from .mobilenet import MobileNet  # noqa: F401
