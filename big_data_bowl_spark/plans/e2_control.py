"""Pipeline E2: field-control surface (Field Control.R:226-378).

The reference computes, for one play frame, each player's "zone of
influence" (a bivariate Gaussian centred on the player's projected
location, shaped by speed and heading) over a 120x54 field grid, then
sums signed per-team influence per cell and squashes with a sigmoid.
It does this with two nested ``group_split -> map_dfr`` R loops
(Field Control.R:357-361, 375-378) — per-player, per-frame, one R
process.

The Spark-first formulation collapses both loops into ONE declarative
plan:

    players x broadcast(grid)             (J5 — grid is ~6.5k rows)
      -> closed-form Gaussian (F12)       (pure codegen, no stats lib)
      -> per-player max-normalize (W6)    (window over the grid cells)
      -> signed team sum per cell (A1)    (single shuffle)
      -> sigmoid (F7)

At 100 TB this is the scale showcase: the cross join is
embarrassingly parallel (players partition freely; the grid is
broadcast so no shuffle), the only shuffle is the final per-cell
aggregation, and every expression stays inside whole-stage codegen.
The reference can only ever do one play at a time in RAM.

Float-determinism: per-player normalized influence is rounded to 9
decimals and decimal-summed (order-independent) so the DuckDB oracle
reproduces the surface bit-for-bit (see queries/base.py policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.geometry import (
    bivariate_gaussian_pdf,
    euclidean,
    next_location,
    radius_of_influence,
    sigmoid,
    speed_ratio,
    velocity_components,
)
from ..functions.rounding import rhu

BALL_X = 60.0
BALL_Y = 26.65  # field mid (160/3 / 2), Field Control.R / all coverages.R


def attach_kinematics(players: DataFrame) -> DataFrame:
    """U2 chain: velocity (F6) -> ball distance (F5) -> influence radius
    (F8/F9) -> speed ratio -> projected location (F11).

    Expects columns: px, py, s, dir_deg. Adds v_x, v_y, v_theta,
    dist_from_ball, radius, s_ratio, mu_x, mu_y. All narrow
    projections — no shuffle (Field Control.R:226-292).
    """
    v_x, v_y, v_theta = velocity_components(F.col("s"), F.col("dir_deg"))
    players = players.withColumns(
        {"v_x": v_x, "v_y": v_y, "v_theta": v_theta}
    )
    players = players.withColumn(
        "dist_from_ball",
        euclidean(F.col("px"), F.col("py"), F.lit(BALL_X), F.lit(BALL_Y)),
    )
    players = players.withColumns(
        {
            "radius": radius_of_influence(F.col("dist_from_ball")),
            "s_ratio": speed_ratio(F.col("s")),
        }
    )
    mu_x, mu_y = next_location(
        F.col("px"), F.col("py"), F.col("v_x"), F.col("v_y")
    )
    return players.withColumns({"mu_x": mu_x, "mu_y": mu_y})


def player_influence(
    players: DataFrame, grid: DataFrame, player_key: str = "player_id"
) -> DataFrame:
    """ZOI per player: cross join the (broadcast) grid, evaluate the
    closed-form Gaussian, normalize each player's surface to max 1
    (Field Control.R:344-347).

    The normalize is a window over the grid cells of one player — the
    partition is exactly grid-size rows (~6.5k), so it never skews
    regardless of player count.

    The PLAYERS side is hash-repartitioned on the window key BEFORE
    the grid expansion: a BroadcastNestedLoopJoin preserves its
    streamed side's partitioning, so the normalize window's required
    clustering is already satisfied and Catalyst elides the exchange
    of the expanded cells table (player-count rows shuffle instead of
    players x grid rows — at season scale, 3.4k vs 22M; at 100 TB the
    difference is the whole surface crossing the network or not).
    Verified in the plan: cells go through a local Sort only.

    The repartition carries an EXPLICIT partition count (r17, guide
    §2.5): the column-only spelling is AQE-coalescible, and AQE's
    byte-targeted coalescing sees only the pre-expansion players
    table (3.4k rows ≈ 100 KB at sf0.1), collapses the exchange to
    ONE partition, and the entire grid-expansion + Gaussian + window
    sort — 22M rows of CPU work downstream of the exchange — runs in
    a single task. Partitioning must be sized for the work AFTER the
    exchange, which AQE's byte heuristic cannot see through a 6480x
    expansion. The count is the session's shuffle-partition target
    (shuffle_partition_target — the same count the coalescible form
    starts from; cluster-tuned at scale, never a local constant).
    Measured at sf0.1: e03 3.29 s -> 0.85 s.

    e02 adjudication (r18, VERDICT r17 item 7): the single-play
    caller pays ~+0.5 s at bench scale for this shared pin (its
    22-row players table rides a 32-task shuffle). ACCEPTED as the
    price of the shared path: e02's players input is a 1/997 slice
    of events — data-proportional, not construction-bounded — so at
    100 TB e02 needs the pin for exactly the same reason e03 does,
    and the only conditional that could skip it at bench scale is a
    row-count collect or a local-mode constant, both prohibited
    classes. Recorded in PLANS.md.
    """
    from ..sources.io import shuffle_partition_target

    n_parts = shuffle_partition_target(players.sparkSession)
    cells = players.repartition(n_parts, player_key).crossJoin(
        F.broadcast(grid)
    )
    pdf = bivariate_gaussian_pdf(
        px=F.col("grid_x"),
        py=F.col("grid_y"),
        mu_x=F.col("mu_x"),
        mu_y=F.col("mu_y"),
        v_theta=F.col("v_theta"),
        radius=F.col("radius"),
        s_ratio=F.col("s_ratio"),
    )
    cells = cells.withColumn("influence_raw", pdf)
    w = Window.partitionBy(player_key)
    return cells.withColumn(
        "influence",
        rhu(F.col("influence_raw") / F.max("influence_raw").over(w)),
    )


def field_control_surface(
    influence: DataFrame,
    team_col: str = "team",
    home: str = "home",
    group_cols: "tuple[str, ...]" = ("grid_x", "grid_y"),
) -> DataFrame:
    """Team control per cell: sign-flip away influence (P12), exact
    decimal sum per ``group_cols`` (A1), sigmoid squash (F7)
    (Field Control.R:362-370).

    Note the reference's sigmoid is 1/(1+exp(x)) — DECREASING in x —
    and it negates HOME influence, so control ~ 1 means home-dominated.
    Both quirks are reproduced here deliberately, and ONLY here: e03
    passes ("frame_id", "grid_x", "grid_y") for the per-frame season
    surface instead of re-implementing the sign/sum/sigmoid chain
    (review r7 dedup — the quirk documentation stays authoritative in
    one place).
    """
    signed = influence.withColumn(
        "signed_influence",
        F.when(F.col(team_col) == home, -F.col("influence")).otherwise(
            F.col("influence")
        ),
    )
    per_cell = signed.groupBy(*group_cols).agg(
        F.sum(F.col("signed_influence").cast("decimal(28,9)"))
        .cast("double")
        .alias("control_sum")
    )
    return per_cell.select(
        *group_cols,
        rhu(sigmoid(F.col("control_sum"))).alias("control"),
    )
