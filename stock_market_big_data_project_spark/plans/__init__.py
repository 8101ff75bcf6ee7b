from .registry import (
    LOCAL_ORACLES,
    LOCAL_QUERIES,
    ORACLES,
    QUERIES,
    get_query,
    load_all_plans,
    register,
    register_local,
)

__all__ = [
    "QUERIES",
    "ORACLES",
    "LOCAL_QUERIES",
    "LOCAL_ORACLES",
    "register",
    "register_local",
    "load_all_plans",
    "get_query",
]
