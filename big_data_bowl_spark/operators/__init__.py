from .mode import grouped_mode
from .pivot import pivot_wide_multi
from .sample import deterministic_sample, deterministic_split

__all__ = [
    "grouped_mode",
    "pivot_wide_multi",
    "deterministic_sample",
    "deterministic_split",
]
