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
    return F.sqrt(F.pow(x1 - x2, F.lit(2.0)) + F.pow(y1 - y2, F.lit(2.0)))


def velocity_components(s: Column, direction_deg: Column) -> tuple[Column, Column, Column]:
    """F6: decompose speed along a compass direction (degrees).

    v_x = sin(dir_rad) * s ; v_y = cos(dir_rad) * s ;
    v_theta = atan(v_y / v_x), with the NaN (v_x == 0) case zeroed the
    way the reference does (Field Control.R:31-44, including the
    is.nan guard at :36-37).
    """
    rad = F.radians(direction_deg)
    v_x = F.sin(rad) * s
    v_y = F.cos(rad) * s
    v_theta_raw = F.atan(v_y / v_x)
    v_theta = F.when(F.isnan(v_theta_raw) | v_theta_raw.isNull(), F.lit(0.0)).otherwise(
        v_theta_raw
    )
    return v_x, v_y, v_theta


def speed_ratio(s: Column, s_max: float = 13.0) -> Column:
    """Speed ratio vs. a max speed, squared (Field Control.R:247-255)."""
    return F.pow(s / F.lit(s_max), F.lit(2.0))


def next_location(x: Column, y: Column, v_x: Column, v_y: Column, dt: float = 0.5) -> tuple[Column, Column]:
    """Projected location after dt seconds (Field Control.R:258-267)."""
    return x + v_x * F.lit(dt), y + v_y * F.lit(dt)


def radius_of_influence(dist_from_ball: Column, max_radius: float = 10.0, min_radius: float = 4.0) -> Column:
    """Cubic ramp clamped to [min, max] (Field Control.R:277-292).

    radius = min + dist^3 / 560, clamped at max (F9's clamp via least).
    """
    r = F.lit(min_radius) + F.pow(dist_from_ball, F.lit(3.0)) / F.lit(560.0)
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

    sx = (radius + radius*s_ratio) / 2, sy = (radius - radius*s_ratio) / 2
    (Field Control.R:304-312); sy is clamped to eps to survive the
    s_ratio -> 1 singularity the reference inherits from solve(R)
    (SURVEY.md §7 risk 4).
    """
    ct = F.cos(v_theta)
    st = F.sin(v_theta)
    sx = (radius + radius * s_ratio) / F.lit(2.0)
    sy = F.greatest((radius - radius * s_ratio) / F.lit(2.0), F.lit(eps))
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
