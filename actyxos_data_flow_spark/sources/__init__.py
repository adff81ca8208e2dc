from .envelopes import read_envelopes, stream_envelopes, subscription_filter
from .tables import TABLES, ensure_parallelism, load_table, load_tables, register_views

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "read_envelopes",
    "stream_envelopes",
    "subscription_filter",
]
