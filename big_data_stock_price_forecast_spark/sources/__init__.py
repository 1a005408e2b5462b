from .tables import TABLE_NAMES, events_series, load_table, load_tables, register_views

__all__ = [
    "TABLE_NAMES",
    "events_series",
    "load_table",
    "load_tables",
    "register_views",
]
