from . import find_peaks, quantile, rolling, series  # noqa: F401
