from .unitig import Unitig, UnitigGraph, ug_gen  # noqa: F401
from .seq import ug_seq  # noqa: F401
