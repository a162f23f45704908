import pytest


@pytest.fixture(scope="session")
def spark():
    from ocr_agent_spark.session import build_spark

    spark = build_spark(
        app_name="ocr-agent-spark-tests",
        cores=8,
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()
