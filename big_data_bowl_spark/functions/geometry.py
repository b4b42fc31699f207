"""Geometry / math column builders (SURVEY.md §2.7).

All of these are pure Column expressions — they compile into
whole-stage codegen and never leave the JVM. The reference computes
the same quantities with R vector math (file:line cited per function);
no UDF is needed anywhere, including the bivariate Gaussian (F12).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

TWO_PI = 2.0 * math.pi


def euclidean(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """F5: sqrt((x1-x2)^2 + (y1-y2)^2).

    Reference: Tutorial.R:200-201, Field Control.R:235,
    all coverages.R:112-113.
    """
    dx = x1 - x2
    dy = y1 - y2
    # dx*dx (not pow(dx,2)): elementary * and sqrt are IEEE-exact and
    # reproduce bit-identically in any engine; pow() may not.
    return F.sqrt(dx * dx + dy * dy)


def velocity_components(s: Column, direction_deg: Column) -> tuple[Column, Column, Column]:
    """F6: decompose speed along a compass direction (degrees).

    v_x = sin(dir_rad) * s ; v_y = cos(dir_rad) * s ;
    v_theta = atan(v_y / v_x) (Field Control.R:31-44).

    R semantics for the v_x == 0 edge: atan(v_y/0) = atan(+-Inf) =
    +-pi/2, and only the 0/0 NaN case is zeroed by the is.nan guard
    (Field Control.R:36-37). Spark's `/` returns NULL on zero
    division, so the +-pi/2 and 0 cases are spelled explicitly here.
    """
    rad = F.radians(direction_deg)
    v_x = F.sin(rad) * s
    v_y = F.cos(rad) * s
    half_pi = math.pi / 2.0
    v_theta = (
        F.when((v_x == 0) & (v_y > 0), F.lit(half_pi))
        .when((v_x == 0) & (v_y < 0), F.lit(-half_pi))
        .when((v_x == 0) & (v_y == 0), F.lit(0.0))
        .otherwise(F.atan(v_y / v_x))
    )
    return v_x, v_y, v_theta


def speed_ratio(s: Column, s_max: float = 13.0) -> Column:
    """Plain speed ratio s / s_max (Field Control.R:247-255).

    The reference uses the unsquared ratio (s_max = 13 yds/s from the
    NGS fastest-ballcarrier tables); the Fernandez-Bornn paper squares
    it, but parity here follows the reference.
    """
    return s / F.lit(s_max)


def next_location(x: Column, y: Column, v_x: Column, v_y: Column, dt: float = 0.5) -> tuple[Column, Column]:
    """Projected location after dt seconds (Field Control.R:258-267)."""
    return x + v_x * F.lit(dt), y + v_y * F.lit(dt)


def radius_of_influence(
    dist_from_ball: Column,
    min_radius: float = 4.0,
    max_radius: float = 10.0,
    max_distance_from_ball: float = 20.0,
) -> Column:
    """Cubic ramp clamped to [min, max] (Field Control.R:276-292).

    radius = min + d^3 * (max - min) / max_dist  (= 4 + 0.3 * d^3 at
    defaults), clamped at max via case_when -> F.least (F9).
    """
    d = dist_from_ball
    r = F.lit(min_radius) + d * d * d * F.lit(
        (max_radius - min_radius) / max_distance_from_ball
    )
    return F.least(r, F.lit(max_radius))


def bivariate_gaussian_pdf(
    px: Column,
    py: Column,
    mu_x: Column,
    mu_y: Column,
    v_theta: Column,
    radius: Column,
    s_ratio: Column,
    eps: float = 1e-8,
) -> Column:
    """F12: closed-form bivariate normal density at (px, py).

    The reference builds Sigma = R * S * S * R^-1 from a rotation
    matrix R(v_theta) and scaling S(radius, s_ratio)
    (Field Control.R:294-319) and evaluates mvtnorm::dmvnorm over the
    field grid (:344-346). For a 2x2 covariance the pdf is a scalar
    expression — determinant, inverse and the quadratic form all
    expand in closed form, so the whole thing stays in codegen instead
    of calling into a stats library per (player, cell).

    With R = [[cos t, -sin t],[sin t, cos t]] and
    S = diag(sx, sy), Sigma = R diag(sx^2, sy^2) R^T, giving:
      a = cos^2 t * sx^2 + sin^2 t * sy^2
      b = sin t cos t * (sx^2 - sy^2)
      c = sin^2 t * sx^2 + cos^2 t * sy^2
      det = sx^2 sy^2
      pdf = exp(-(c*dx^2 - 2b*dx*dy + a*dy^2) / (2 det)) / (2 pi sqrt(det))

    sx = radius * (1 + s_ratio), sy = radius * (1 - s_ratio) — the
    reference's scaling matrix verbatim (Field Control.R:305-312, no
    halving); sy is clamped to eps to survive the s_ratio -> 1
    singularity the reference inherits from solve(R) (SURVEY.md §7
    risk 4).
    """
    ct = F.cos(v_theta)
    st = F.sin(v_theta)
    sx = radius * (F.lit(1.0) + s_ratio)
    sy = F.greatest(radius * (F.lit(1.0) - s_ratio), F.lit(eps))
    sx2 = sx * sx
    sy2 = sy * sy
    a = ct * ct * sx2 + st * st * sy2
    b = st * ct * (sx2 - sy2)
    c = st * st * sx2 + ct * ct * sy2
    det = sx2 * sy2
    dx = px - mu_x
    dy = py - mu_y
    quad = (c * dx * dx - F.lit(2.0) * b * dx * dy + a * dy * dy) / det
    return F.exp(F.lit(-0.5) * quad) / (F.lit(TWO_PI) * F.sqrt(det))


def sigmoid(x: Column) -> Column:
    """F7: 1 / (1 + exp(x)) — the reference's control squash
    (Field Control.R:370; note the reference's sign convention)."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(x))
