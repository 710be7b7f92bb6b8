from .formats import (
    broadcast_dim,
    explode_nested,
    parse_template_text,
    read_json,
    read_tsv,
)
from .tables import TABLES, load_table, load_tables, register_views

__all__ = [
    "TABLES",
    "broadcast_dim",
    "explode_nested",
    "load_table",
    "load_tables",
    "parse_template_text",
    "read_json",
    "read_tsv",
    "register_views",
]
