from . import predicates, wkb  # noqa: F401
