from . import frames, geo, lie  # noqa: F401
