from .tables import load_table, load_tables, register_views
from .raw_events import parse_raw_events

__all__ = ["load_table", "load_tables", "register_views", "parse_raw_events"]
