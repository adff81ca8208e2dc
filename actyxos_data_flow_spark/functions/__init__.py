from .scalar import (
    ns_micros,
    cents,
    cents_sum,
    dec,
    dec_mul_sum,
    dec_sum,
    safe_avg,
    ts_micros,
)

__all__ = [
    "cents", "cents_sum", "dec", "dec_sum", "dec_mul_sum",
    "ns_micros", "safe_avg", "ts_micros",
]
