from .subregion import hit_sub  # noqa: F401
from .cut import hit_cut  # noqa: F401
from .filter import hit_flt  # noqa: F401
from .contained import hit_contained  # noqa: F401
