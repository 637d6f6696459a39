import pytest


@pytest.fixture(scope="session")
def spark():
    from bib_dedupe_spark.session import get_spark

    session = get_spark(
        app_name="bib-dedupe-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.execution.arrow.maxRecordsPerBatch": "500",
            "spark.driver.memory": "4g",
        },
    )
    yield session
