from . import quadcell, s2cell  # noqa: F401
