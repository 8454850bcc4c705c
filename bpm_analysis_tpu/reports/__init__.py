from . import csvout, debug_log, plot, settings, summary, trace  # noqa: F401
