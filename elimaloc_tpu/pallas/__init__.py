from . import corr_kernels  # noqa: F401
