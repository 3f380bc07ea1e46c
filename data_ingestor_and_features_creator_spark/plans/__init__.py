"""Query plans: the operator registry consumed by __spark_entry__.py.

Importing this package imports every query module, which registers its
queries (and oracle SQL twins) with the registry.
"""

from .registry import QUERIES, ORACLES, query  # noqa: F401


def load_all() -> None:
    """Import every query module so registrations run."""
    from . import q_flagship  # noqa: F401
    from . import q_relational  # noqa: F401
    from . import q_joins  # noqa: F401
    from . import q_aggregates  # noqa: F401
    from . import q_window  # noqa: F401
    from . import q_scalar  # noqa: F401
    from . import q_hrv  # noqa: F401
    from . import q_llm  # noqa: F401
    from . import q_streaming  # noqa: F401
    from . import q_udf  # noqa: F401


def queries():
    load_all()
    return dict(QUERIES)


def oracles():
    load_all()
    return dict(ORACLES)
