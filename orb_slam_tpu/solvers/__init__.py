from . import initializer  # noqa: F401
