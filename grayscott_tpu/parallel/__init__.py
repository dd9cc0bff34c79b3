from . import halo  # noqa: F401
