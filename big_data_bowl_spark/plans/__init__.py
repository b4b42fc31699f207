"""Composable end-to-end pipelines (SURVEY.md §3, §2.9 U2).

Each pipeline is a chain of plain ``DataFrame -> DataFrame`` functions
(the Spark-native form of the reference's composable table functions,
Field Control.R:226-292), composed with ``df.transform``.
"""

from .e2_control import (  # noqa: F401
    attach_kinematics,
    field_control_surface,
    player_influence,
)
from .tracking import (  # noqa: F401
    attach_ball_position,
    derive_side_of_ball,
    distance_to_football_pipeline,
    line_of_scrimmage_features,
    personnel_features,
    standardize_coordinates,
)
