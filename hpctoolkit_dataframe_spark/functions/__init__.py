from . import callpath, formulas  # noqa: F401
