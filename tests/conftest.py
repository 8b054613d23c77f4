import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


@pytest.fixture(scope="session")
def spark():
    from crypto_crawler_rs_spark.session import get_spark

    s = get_spark(
        app="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.default.parallelism": "4"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_corpus():
    from crypto_crawler_rs_spark.sources.fixtures import gen_corpus

    return gen_corpus(n_pages=150, n_hosts=8, n_seeds=10, links_per_page=3)
