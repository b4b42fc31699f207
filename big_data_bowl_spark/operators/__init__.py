from .asof import asof_join
from .components import connected_components, release_local_checkpoint
from .kmeans import assign_cells, broadcast_cells, kmeans_fit
from .mode import grouped_mode
from .pivot import pivot_wide_multi
from .sample import deterministic_sample, deterministic_split

__all__ = [
    "asof_join",
    "connected_components",
    "release_local_checkpoint",
    "assign_cells",
    "broadcast_cells",
    "kmeans_fit",
    "grouped_mode",
    "pivot_wide_multi",
    "deterministic_sample",
    "deterministic_split",
]
