from . import hdf5  # noqa: F401
