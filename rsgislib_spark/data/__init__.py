from . import derived, fixtures, pages  # noqa: F401
