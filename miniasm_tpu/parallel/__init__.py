from .mesh import make_mesh  # noqa: F401
from .sharded import sharded_select_step, mirror_exchange  # noqa: F401
