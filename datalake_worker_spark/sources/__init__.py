from .readers import TABLES, load_table, load_tables, spread_scan  # noqa: F401
