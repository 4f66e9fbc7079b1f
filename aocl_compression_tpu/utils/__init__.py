from . import config, dispatch, logging, timers  # noqa: F401
