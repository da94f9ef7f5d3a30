"""Preloading Python worker daemon (opt-in).

PySpark's worker daemon forks a fresh interpreter per worker task
slot; whatever the daemon has imported before the fork is inherited
copy-on-write, so preloading heavy modules in the daemon makes worker
start a plain fork.

Measured on this host (Spark 4.1.2, local[32], 32-task mapInPandas
probe):

* Spark 4's STOCK daemon already preloads most of the hot path —
  ``numpy``, ``pyarrow`` and ``pyspark.sql.pandas.serializers`` are in
  ``sys.modules`` of a freshly forked worker (the daemon imports
  ``pyspark.worker``, which pulls them). Only ``pandas`` and the
  gliner_spark kernel are cold, and importing them in a live worker
  costs ~0.05 s (warm page cache).
* Consequently the A/B on first-Python-stage latency is NEUTRAL here:
  cold 4.77 s stock vs 4.92 s preloaded (the remaining cold cost is
  JVM-side: first-stage codegen + Arrow init, not Python imports). The
  preload itself verifiably works: with this module configured, all
  32 workers report ``gliner_spark.model.pipeline`` already in
  ``sys.modules`` (import dt 0.000 s vs 0.054 s stock).

So this module is NOT configured by default. It is the right knob on
deployments where the stock preload doesn't cover you:

* ``spark.python.worker.reuse=false`` (common when UDF libraries leak
  memory) — every task pays the full import chain, per task;
* executors whose image has a cold page cache or networked site-
  packages (first import is I/O-bound, seconds not milliseconds);
* kernels that grow heavier than this repo's (~50 ms) import cost.

Usage — either set the config directly::

    SparkSession.builder.config(
        "spark.python.daemon.module", "gliner_spark.plans.daemon")

or export ``SPARK_GRAFT_PRELOAD_DAEMON=1`` and let
``plans.session.build_session`` wire it (the module must be on the
executor PYTHONPATH / ``--py-files``, same as the UDFs themselves).

Caveats: the preloaded set must be import-safe in a bare worker
environment (no SparkContext at import time — true of the whole
kernel); encoder/pipeline SINGLETONS are still created per worker
(module-level cache dicts start empty and the fork happens before any
task runs, so no cross-worker state leaks).
"""

# Heavy imports, most expensive first. Failures must not kill the
# daemon — a worker that re-imports is merely slower, never wrong.
try:  # pragma: no cover - exercised via spark, not pytest
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
    import pyspark.sql.pandas.serializers  # noqa: F401  (worker hot path)

    import gliner_spark.model.pipeline  # noqa: F401  (pulls the kernel)
except Exception:  # pragma: no cover
    pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
