from . import expressions, geoparse, text  # noqa: F401
