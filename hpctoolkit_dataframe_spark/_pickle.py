"""Ship selected modules to executors by value.

Executor Python workers don't have this package on ``sys.path`` unless
it was installed cluster-wide; any module whose functions run worker-
side (mapInPandas / applyInPandasWithState closures) must be registered
for cloudpickle by-value serialization so the closures are
self-contained.
"""

from __future__ import annotations

import sys

_registered: set[str] = set()


def register_module_by_value(module_name: str) -> None:
    if module_name in _registered:
        return
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[module_name])
        _registered.add(module_name)
    except Exception:  # best effort; repo-root launches work regardless
        pass
