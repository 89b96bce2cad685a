from .explain import (  # noqa: F401
    executed_plan,
    formatted_plan,
    has_broadcast_hash_join,
    has_pushed_filters,
    python_eval_nodes,
)
