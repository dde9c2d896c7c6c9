from .catalog import load_table, TABLES  # noqa: F401
