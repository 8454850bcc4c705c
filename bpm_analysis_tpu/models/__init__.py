from . import envelope, noise_floor  # noqa: F401
