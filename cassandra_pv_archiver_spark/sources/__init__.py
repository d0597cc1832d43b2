from .testdata import (
    NS,
    SAMPLES_CTE,
    load_samples,
    load_string_samples,
    load_table,
)

__all__ = ["NS", "SAMPLES_CTE", "load_samples", "load_string_samples", "load_table"]
