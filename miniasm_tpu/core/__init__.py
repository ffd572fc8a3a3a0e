from .hits import Hits, build_hits, mark_unused  # noqa: F401
from .hit2arc import hit2arc, MA_HT_INT, MA_HT_QCONT, MA_HT_TCONT, MA_HT_SHORT_OVLP  # noqa: F401
