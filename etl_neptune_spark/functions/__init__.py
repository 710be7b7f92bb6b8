from .scalar import (
    dec_avg,
    dec_sum,
    ipv4_to_string,
    register_sql_functions,
    safe_div,
    sanitize_str,
    split_part,
)

__all__ = [
    "dec_avg",
    "dec_sum",
    "ipv4_to_string",
    "register_sql_functions",
    "safe_div",
    "sanitize_str",
    "split_part",
]
