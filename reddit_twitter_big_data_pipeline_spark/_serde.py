"""Executor-side serialization posture.

UDF closures that reference module-level functions are pickled BY REFERENCE
by default, which makes executors `import reddit_twitter_big_data_pipeline_spark` —
and the package is not guaranteed to be on the worker PYTHONPATH (the
harness may launch the SparkSession from any cwd). Registering our
UDF-bearing modules for by-value pickling makes every UDF self-contained:
the closure ships the function bodies inside the serialized task, no import
needed on workers. The cost (a few KB per task broadcast) is irrelevant next
to Arrow batch traffic.
"""

from __future__ import annotations

import sys

from pyspark import cloudpickle


def register_self(module_name: str) -> None:
    """Call at the bottom of any module that defines executor-side code."""
    try:
        cloudpickle.register_pickle_by_value(sys.modules[module_name])
    except Exception:
        pass  # non-cloudpickle pyspark forks: fall back to by-reference
