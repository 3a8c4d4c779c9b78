from . import dist_ba  # noqa: F401
from . import hostmesh  # noqa: F401
