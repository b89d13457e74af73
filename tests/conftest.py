from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from deluge_spark.session import get_spark

    s = get_spark("deluge_spark_tests", cores=8, shuffle_partitions=8,
                  driver_memory="16g")
    yield s


@pytest.fixture(scope="session")
def corpus_pdf():
    from deluge_spark.corpus import generate_corpus_pdf

    return generate_corpus_pdf(sf=0.001)


@pytest.fixture(scope="session")
def corpus_df(spark, corpus_pdf, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("corpus") / "corpus.parquet")
    spark.createDataFrame(corpus_pdf).repartition(8, "repo").write.parquet(out)
    return spark.read.parquet(out)


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
