from . import frame, track_kernels, mapping_kernels, tracker, local_mapper  # noqa: F401
