from . import io_lib  # noqa: F401
