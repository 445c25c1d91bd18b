"""libmr_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of RedisGears/LibMR (reference analyzed in
SURVEY.md), rebuilt Spark-first: DataFrame/Catalyst for everything
relational, Arrow-batched Python only where semantics demand it.
"""

from .core.builder import (
    ExecutionBuilder,
    ExecutionError,
    ExecutionResult,
    create_builder,
    MAX_IDLE_ERROR,
)
from .core.registry import (
    GLOBAL_REGISTRY,
    PyAccumulator,
    StepImpl,
    StepType,
    accumulator,
    filterer,
    mapper,
    reader,
    remote_task,
)
from .core.rpc import register_builtin_tasks, run_on_all_shards, run_on_key
from .session import get_spark

register_builtin_tasks()

# Importing the package registers every built-in step on this node —
# the analog of the reference's register-at-module-load discipline
# (/root/reference/src/mr.c:1681-1762): correctness there depends on
# every node knowing the same named steps, and here on driver AND
# executors resolving them regardless of which module a user imports
# first.
from .sources import readers as _builtin_readers  # noqa: E402,F401  (registers KeysReader et al.)

__all__ = [
    "ExecutionBuilder",
    "ExecutionError",
    "ExecutionResult",
    "GLOBAL_REGISTRY",
    "MAX_IDLE_ERROR",
    "PyAccumulator",
    "StepImpl",
    "StepType",
    "accumulator",
    "create_builder",
    "filterer",
    "get_spark",
    "mapper",
    "reader",
    "remote_task",
    "run_on_all_shards",
    "run_on_key",
]
