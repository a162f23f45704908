import pytest

TEST_SHUFFLE_PARTITIONS = "8"


@pytest.fixture(scope="session")
def spark():
    from ocr_agent_spark.session import build_spark

    spark = build_spark(
        app_name="ocr-agent-spark-tests",
        cores=8,
        shuffle_partitions=int(TEST_SHUFFLE_PARTITIONS),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(autouse=True)
def _stable_session_conf():
    """Re-pin runtime conf the suite depends on after every test.

    Any in-process code path that calls ``build_spark`` with different
    parameters (the CLI defaults to all host cores) hits getOrCreate on
    the shared test session, which APPLIES the new builder configs to
    the live session — e.g. ``spark.sql.shuffle.partitions`` jumps from
    8 to 2×host-cores and every later plan assertion that reads the
    session's parallelism (``widen_if_narrow`` targets) sees the leaked
    value. Runtime-conf hygiene, not a per-test concern, so it lives
    here.
    """
    yield
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is not None:
        s.conf.set("spark.sql.shuffle.partitions", TEST_SHUFFLE_PARTITIONS)
