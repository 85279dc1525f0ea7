from .logger import Logger                      # noqa: F401
from .jsonlog import json_save, json_load       # noqa: F401
from .report import RunReport                   # noqa: F401
from . import comm, draw, profiling             # noqa: F401
