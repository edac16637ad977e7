import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from ocr_platform_spark.session import get_spark

    s = get_spark("ocr-platform-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    """Small deterministic corpus shared by Spark-level tests."""
    from ocr_platform_spark import corpus

    d = tmp_path_factory.mktemp("corpus")
    corpus.write_parquet(str(d), n_docs=60, seed=42, max_pages=30)
    return str(d)
