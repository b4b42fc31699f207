"""Driver-facing query registry.

Each named query is a (Spark callable, DuckDB oracle SQL) pair proving
one operator row from SURVEY.md §2 (or a north-star extension) on the
driver's star-schema testdata. `__spark_entry__.py` re-exports this
registry.

Import order populates REGISTRY via the @register decorator.
"""

from .base import REGISTRY, Q, register  # noqa: F401
from . import core  # noqa: F401,E402
from . import nlp  # noqa: F401,E402
from . import vectors  # noqa: F401,E402
from . import temporal  # noqa: F401,E402
from . import pipelines  # noqa: F401,E402
from . import ml  # noqa: F401,E402
from . import multimodal  # noqa: F401,E402
from . import extras  # noqa: F401,E402


def queries():
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql():
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
