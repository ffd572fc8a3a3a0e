from .timers import timestamp, log, realtime, cputime  # noqa: F401
