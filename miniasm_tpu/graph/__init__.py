from .asg import Graph, graph_from_hits, cleanup, arc_index  # noqa: F401
from .clean import symm, del_multi, del_asymm, del_trans, del_short  # noqa: F401
