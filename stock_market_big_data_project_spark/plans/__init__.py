from .registry import (
    LOCAL_ORACLES,
    LOCAL_QUERIES,
    ORACLES,
    QUERIES,
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
]
