"""Cross-engine-deterministic rounding.

Engine round() builtins disagree on decimal TIES: Spark rounds the
double's shortest decimal repr (``BigDecimal.valueOf``) with HALF_UP,
while DuckDB rounds the true binary value — e.g. the double nearest
0.5000000625 rounds to ...63 in Spark but ...62 in DuckDB. Any oracle
comparison that rounds a transcendental result can therefore flip on a
tie even when both engines computed the exact same double.

``rhu`` sidesteps the builtin: floor(x * 10^s + 0.5) / 10^s uses only
exact IEEE ops (*, +, floor, /), so identical input doubles give
identical results in ANY engine (the DuckDB spelling lives in
queries/base.py::rhu_sql). Valid while \\|x\\| * 10^s < 2^53; ties round
toward +inf for negatives (consistent in both engines, which is all
that matters).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rhu(col: Column, scale: int = 9) -> Column:
    p = 10.0**scale
    return F.floor(col * F.lit(p) + F.lit(0.5)) / F.lit(p)
