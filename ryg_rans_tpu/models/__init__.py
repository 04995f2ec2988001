from . import stats, tables, alias  # noqa: F401
