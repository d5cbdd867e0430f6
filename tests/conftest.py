import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_agent_spark.session import get_spark, load_tables  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # lighter for unit tests
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="module", autouse=True)
def _session_hygiene():
    """Bound the shared session's accumulated state between test modules.

    A full-suite run stacks ~350 tests on one driver JVM: every broadcast
    join leaves a broadcast, every persist/localCheckpoint leaves blocks,
    and Spark's ContextCleaner only releases them after the *Python* and
    *JVM* garbage collectors drop the references. Under that load the
    MLlib RF fit in test_ml flaked ~1-in-2 (died in getNumClasses -> take
    after ~11 min of suite) while passing in isolation. Per-module:
    clear the SQL cache, force both GCs so the ContextCleaner can actually
    reap, and let the async cleanup drain."""
    yield
    import gc

    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is not None:
        s.catalog.clearCache()
        gc.collect()
        try:
            s.sparkContext._jvm.System.gc()
        except Exception:
            pass


@pytest.fixture(scope="session")
def tables(spark):
    return load_tables(spark, SF_DIR)


def pytest_exception_interact(node, call, report):
    """Append the compact Java cause chain to Py4J failures.

    A Py4JJavaError's full stacktrace runs hundreds of lines; captures
    that keep only the tail of the log (the round driver does) lose the
    root cause. Re-state the exception CHAIN compactly at the very end of
    the failure output so even a tail capture shows what actually died."""
    exc = call.excinfo.value if call.excinfo else None
    jexc = getattr(exc, "java_exception", None)
    if jexc is None:
        return
    lines = []
    try:
        cause = jexc
        while cause is not None and len(lines) < 8:
            msg = (cause.getMessage() or "").splitlines()
            lines.append(f"  {cause.getClass().getName()}: {msg[0] if msg else ''}")
            cause = cause.getCause()
    except Exception:
        return
    report.longrepr = (
        f"{report.longrepr}\n\nPY4J ROOT-CAUSE CHAIN (compact, innermost last):\n"
        + "\n".join(lines)
    )
