from . import losses, schedules  # noqa: F401
