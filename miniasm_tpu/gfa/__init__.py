from .writer import ug_print, sg_print, print_subs, print_hits  # noqa: F401
