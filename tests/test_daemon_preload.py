"""Opt-in worker-daemon preload module (plans/daemon.py).

The full fork-inheritance behavior was verified live (32/32 workers
report the kernel already in sys.modules when the module is set as
spark.python.daemon.module — see the module docstring for the A/B).
These tests pin the import-safety contract that makes that wiring
valid: the module must import in a bare interpreter with no
SparkContext, must leave the heavy stack resident, and must expose
pyspark's daemon manager unchanged.
"""

import importlib
import subprocess
import sys


def test_module_is_import_safe_and_preloads():
    mod = importlib.import_module("gliner_spark.plans.daemon")
    assert callable(mod.manager)
    for name in ("numpy", "pandas", "pyarrow", "gliner_spark.model.pipeline"):
        assert name in sys.modules, f"{name} not resident after daemon import"


def test_imports_clean_in_bare_interpreter():
    # A daemon process has no SparkContext and no driver state; the
    # module must not crash there (a broken daemon kills every worker).
    code = (
        "import gliner_spark.plans.daemon as d; "
        "import sys; "
        "assert callable(d.manager); "
        "assert 'gliner_spark.model.pipeline' in sys.modules; "
        "print('ok')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=120
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "ok"


def test_session_gate_points_at_this_module():
    # build_session wires the env-gated config to this exact module
    # path; if the module moves, the config string must move with it.
    import inspect

    from gliner_spark.plans import session

    src = inspect.getsource(session.build_session)
    assert "SPARK_GRAFT_PRELOAD_DAEMON" in src
    assert "gliner_spark.plans.daemon" in src
