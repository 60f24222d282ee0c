"""PySpark worker daemon with the engine's hot libraries preloaded.

PySpark's worker daemon forks one process per task slot; each fork
then imports numpy/pandas/pyarrow on its FIRST pandas-UDF /
mapInPandas task (~1.5-2 s per worker, paid concurrently by every
slot the first time a Python stage runs — measured as the dominant
cold-run cost of the Arrow-batched operators: a 4 s steady-state
query reads 12-16 s on its first executions). Importing the libraries
in the DAEMON parent means every forked worker inherits the loaded
modules through copy-on-write fork memory for free.

Import-only preloading is fork-safe here: none of these libraries
spawn threads at import time. Wired via
``spark.python.daemon.module`` in session.get_spark; if this module
cannot be imported in the worker environment Spark fails loudly, so
the fallback is simply removing the conf.
"""

from __future__ import annotations

import pyspark.daemon

# preload the Arrow/pandas stack the engine's Python operators use
import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401

try:  # serializer stacks imported lazily by pyspark.worker otherwise
    import pyspark.sql.pandas.serializers  # noqa: F401
except Exception:  # pragma: no cover - version-dependent module path
    pass

if __name__ == "__main__":
    pyspark.daemon.manager()
