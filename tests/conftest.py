import pytest


@pytest.fixture(scope="session")
def spark():
    from pdf_parser_spark.session import get_spark

    s = get_spark(app="pdf_parser_spark-tests", cores=8,
                  shuffle_partitions=8)
    yield s
