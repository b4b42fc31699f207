"""Football-domain composable transforms (the reference's actual
pipelines, on the real BDB tracking schema).

A user of the reference switches to these functions directly: each is
a ``DataFrame -> DataFrame`` transform chainable with ``df.transform``,
re-expressing the dplyr chains with Catalyst-friendly plans. Column
names match the reference exactly (gameId, playId, frameId,
displayName, playDirection, x, y, event, team, possessionTeam,
homeTeamAbbr, visitorTeamAbbr, personnelD, ...).

Key plan choices vs the reference:
- Coordinate standardization applied EXACTLY ONCE (the reference
  applies it twice and un-flips left plays — SURVEY §2.13; not
  reproduced).
- Ball position attach is the WINDOW form (one shuffle on the frame
  key), not the self-join (J3) — same result, half the scans
  (Tutorial.R:182-183 vs Field Control.R:227-233).
- Line-of-scrimmage features are a window over (gameId, playId), not
  a build-table-then-left-join (all coverages.R:118-123) — again one
  shuffle, no extra scan, and immune to the reference's
  join-the-wrong-table bug (§2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.geometry import euclidean

FIELD_LENGTH = 120.0
FIELD_WIDTH = 160.0 / 3.0
FIELD_MID_Y = 26.65  # the reference's constant (all coverages.R:127)

PASS_ARRIVAL_EVENTS = (
    "pass_outcome_caught",
    "pass_arrived",
    "pass_outcome_incomplete",
    "pass_outcome_interception",
    "pass_outcome_touchdown",
)  # Tutorial.R:138-142

FRAME_KEYS = ["gameId", "playId", "frameId"]
PLAY_KEYS = ["gameId", "playId"]


def standardize_coordinates(df: DataFrame) -> DataFrame:
    """P4: flip left-direction plays so offense always moves right
    (Tutorial.R:24-26). Apply exactly once."""
    left = F.col("playDirection") == "left"
    return df.withColumns(
        {
            "x": F.when(left, F.lit(FIELD_LENGTH) - F.col("x")).otherwise(
                F.col("x")
            ),
            "y": F.when(left, F.lit(FIELD_WIDTH) - F.col("y")).otherwise(
                F.col("y")
            ),
        }
    )


def derive_side_of_ball(df: DataFrame) -> DataFrame:
    """P13: offense/defense per tracked row + the defensive team
    (Tutorial.R:148-166)."""
    on_offense = (
        (F.col("team") == "home")
        & (F.col("possessionTeam") == F.col("homeTeamAbbr"))
    ) | (
        (F.col("team") == "away")
        & (F.col("possessionTeam") == F.col("visitorTeamAbbr"))
    )
    return df.withColumns(
        {
            "sideOfBall": F.when(on_offense, "offense").otherwise("defense"),
            "defensiveTeam": F.when(
                F.col("possessionTeam") == F.col("homeTeamAbbr"),
                F.col("visitorTeamAbbr"),
            ).otherwise(F.col("homeTeamAbbr")),
        }
    )


def attach_ball_position(df: DataFrame) -> DataFrame:
    """W1+W2: flag frames containing the ball, broadcast its (x, y) to
    every row of the frame, drop ball-less frames
    (Tutorial.R:173-183). One window shuffle — the scalable form of
    the ball self-join J3."""
    w = Window.partitionBy(*FRAME_KEYS)
    is_ball = F.col("displayName") == "Football"
    return (
        df.withColumns(
            {
                "footballInPlay": F.sum(
                    is_ball.cast("int")
                ).over(w) > 0,
                "xFootball": F.max(F.when(is_ball, F.col("x"))).over(w),
                "yFootball": F.max(F.when(is_ball, F.col("y"))).over(w),
            }
        )
        .filter(F.col("footballInPlay"))
    )


def distance_to_ball_at_arrival(df: DataFrame) -> DataFrame:
    """P6+F5: keep pass-arrival frames, compute each row's distance to
    the football (Tutorial.R:189-203). Expects attach_ball_position
    upstream."""
    return df.filter(F.col("event").isin(*PASS_ARRIVAL_EVENTS)).withColumn(
        "distToFootballAtBallArrival",
        euclidean(
            F.col("x"), F.col("y"), F.col("xFootball"), F.col("yFootball")
        ),
    )


def line_of_scrimmage_features(df: DataFrame) -> DataFrame:
    """LOS features (all coverages.R:118-127): los = ball x at frame 1
    of the play, broadcast per play; dist_from_los / dist_from_mid.

    Window form of the reference's build-table-then-left-join — one
    shuffle on the play key, and structurally immune to its
    joined-the-wrong-table bug (§2.13)."""
    w = Window.partitionBy(*PLAY_KEYS)
    los = F.max(
        F.when(
            (F.col("displayName") == "Football") & (F.col("frameId") == 1),
            F.col("x"),
        )
    ).over(w)
    return df.withColumn("los", los).withColumns(
        {
            "dist_from_los": F.col("x") - F.col("los"),
            "dist_from_mid": F.col("y") - F.lit(FIELD_MID_Y),
        }
    )


def personnel_features(plays: DataFrame) -> DataFrame:
    """F1: parse defensive personnel strings like '4 DL, 2 LB, 5 DB'
    into counts via fixed-offset substrings, exactly as the reference
    does (all coverages.R:141-148)."""
    return plays.withColumns(
        {
            "num_dl": F.substring("personnelD", 1, 1).cast("int"),
            "num_lb": F.substring("personnelD", 7, 1).cast("int"),
            "num_cb": F.substring("personnelD", 13, 1).cast("int"),
        }
    )


def distance_to_football_pipeline(
    tracking: DataFrame,
    games: DataFrame,
    plays: DataFrame,
    defensive_team: str | None = None,
) -> DataFrame:
    """E1 end-to-end (Tutorial.R:125-203): standardize -> join dims
    (broadcast) -> side-of-ball -> (optional) defense filter -> ball
    attach -> arrival frames -> distance.

    Output grain: one row per tracked player per arrival frame."""
    merged = (
        tracking.transform(standardize_coordinates)
        .join(F.broadcast(games), "gameId", "inner")
        .join(
            F.broadcast(plays.select(*PLAY_KEYS, "possessionTeam")),
            PLAY_KEYS,
            "inner",
        )
        .transform(derive_side_of_ball)
    )
    if defensive_team is not None:
        merged = merged.filter(
            (F.col("defensiveTeam") == defensive_team)
            & (F.col("sideOfBall") == "defense")
        )
    return merged.transform(attach_ball_position).transform(
        distance_to_ball_at_arrival
    )
