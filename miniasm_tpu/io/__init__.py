from .seqdict import SeqDict  # noqa: F401
from .paf import PafLoad, load_paf, open_text  # noqa: F401
