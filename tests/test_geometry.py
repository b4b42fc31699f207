"""Unit tests for functions/geometry.py (SURVEY.md §2.7 F5-F12).

The bivariate Gaussian is validated against an INDEPENDENT numpy
matrix-algebra oracle — Sigma built literally as R @ S @ S @ R^T and
inverted with np.linalg.inv, the derivation path the reference takes
(Field Control.R:294-319) — not against the closed-form expansion the
engine uses.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_bowl_spark.functions.geometry import (
    bivariate_gaussian_pdf,
    euclidean,
    next_location,
    radius_of_influence,
    sigmoid,
    speed_ratio,
    velocity_components,
)


def one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_euclidean_345(spark):
    df = spark.range(1).select(
        euclidean(F.lit(0.0), F.lit(0.0), F.lit(3.0), F.lit(4.0)).alias("d")
    )
    assert one(df).d == 5.0


def test_euclidean_zero_for_same_point(spark):
    df = spark.range(1).select(
        euclidean(F.lit(7.5), F.lit(-2.0), F.lit(7.5), F.lit(-2.0)).alias("d")
    )
    assert one(df).d == 0.0


@pytest.mark.parametrize(
    "s,deg,vx,vy,theta",
    [
        # due east (dir=90): v_x=s, v_y~0, theta~0
        (10.0, 90.0, 10.0, 0.0, 0.0),
        # due north (dir=0): v_x=0 exactly? sin(0)=0 -> theta=+pi/2
        (10.0, 0.0, 0.0, 10.0, math.pi / 2),
        # stationary: 0/0 -> theta=0 (the reference's is.nan guard)
        (0.0, 0.0, 0.0, 0.0, 0.0),
    ],
)
def test_velocity_components_edges(spark, s, deg, vx, vy, theta):
    v_x, v_y, v_theta = velocity_components(F.lit(s), F.lit(deg))
    r = one(
        spark.range(1).select(
            v_x.alias("vx"), v_y.alias("vy"), v_theta.alias("t")
        )
    )
    assert r.vx == pytest.approx(vx, abs=1e-12)
    assert r.vy == pytest.approx(vy, abs=1e-12)
    assert r.t == pytest.approx(theta, abs=1e-12)


def test_velocity_due_south_negative_half_pi(spark):
    # dir=180: v_y = cos(pi)*s = -s, v_x = sin(pi)*s ~ 1e-15 (not
    # exactly 0 in floating point) -> atan(large negative) ~ -pi/2
    v_x, v_y, v_theta = velocity_components(F.lit(10.0), F.lit(180.0))
    r = one(spark.range(1).select(v_theta.alias("t")))
    assert r.t == pytest.approx(-math.pi / 2, abs=1e-6)


def test_radius_bounds(spark):
    # reference invariant: radius in [4, 10] (Field Control.R:277-287)
    df = spark.range(100).select(
        radius_of_influence(F.col("id").cast("double") / 2.0).alias("r")
    )
    rows = df.collect()
    assert all(4.0 <= r.r <= 10.0 for r in rows)
    # near the ball: min radius; far: clamped to max
    assert rows[0].r == 4.0
    assert rows[99].r == 10.0


def test_speed_ratio_max(spark):
    assert one(spark.range(1).select(speed_ratio(F.lit(13.0)).alias("r"))).r == 1.0


def test_next_location(spark):
    nx, ny = next_location(F.lit(10.0), F.lit(20.0), F.lit(4.0), F.lit(-2.0))
    r = one(spark.range(1).select(nx.alias("x"), ny.alias("y")))
    assert (r.x, r.y) == (12.0, 19.0)


def test_sigmoid_reference_sign_convention(spark):
    # 1/(1+exp(x)) DECREASES with x (Field Control.R:370) — a flipped
    # sign would silently invert the whole control surface.
    r = one(
        spark.range(1).select(
            sigmoid(F.lit(-3.0)).alias("lo"),
            sigmoid(F.lit(0.0)).alias("mid"),
            sigmoid(F.lit(3.0)).alias("hi"),
        )
    )
    assert r.lo > 0.9 and r.hi < 0.1
    assert r.mid == pytest.approx(0.5)
    assert r.lo > r.mid > r.hi


def numpy_gaussian(px, py, mu, theta, radius, s_ratio):
    """Independent oracle: the reference's matrix construction
    (Field Control.R:294-319) evaluated with numpy linalg."""
    R = np.array(
        [[math.cos(theta), -math.sin(theta)], [math.sin(theta), math.cos(theta)]]
    )
    S = np.diag([radius * (1 + s_ratio), radius * (1 - s_ratio)])
    sigma = R @ S @ S @ R.T
    d = np.array([px, py]) - mu
    inv = np.linalg.inv(sigma)
    det = np.linalg.det(sigma)
    return float(
        math.exp(-0.5 * d @ inv @ d) / (2 * math.pi * math.sqrt(det))
    )


@pytest.mark.parametrize(
    "px,py,mux,muy,theta,radius,s_ratio",
    [
        (0.0, 0.0, 0.0, 0.0, 0.0, 5.0, 0.3),
        (2.0, -1.0, 0.5, 0.5, 0.7, 4.0, 0.0),
        (10.0, 10.0, 8.0, 12.0, -1.2, 9.5, 0.8),
        (60.0, 26.0, 58.0, 25.0, 2.9, 6.0, 0.55),
        (1.0, 2.0, 1.5, 2.5, math.pi / 2, 7.0, 0.99),
    ],
)
def test_bivariate_gaussian_matches_numpy(
    spark, px, py, mux, muy, theta, radius, s_ratio
):
    df = spark.range(1).select(
        bivariate_gaussian_pdf(
            F.lit(px),
            F.lit(py),
            F.lit(mux),
            F.lit(muy),
            F.lit(theta),
            F.lit(radius),
            F.lit(s_ratio),
        ).alias("pdf")
    )
    expected = numpy_gaussian(
        px, py, np.array([mux, muy]), theta, radius, s_ratio
    )
    assert one(df).pdf == pytest.approx(expected, rel=1e-9)
