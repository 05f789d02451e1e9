"""Operator inventory (SURVEY.md §2). Modules register queries via
``fits2db_spark.registry.register`` at import time; ``registry._load_all_modules``
imports everything listed in ``_OPERATOR_MODULES``."""
