from . import timing, viz  # noqa: F401
