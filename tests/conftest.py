from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def spark():
    from emf_spark.session import get_spark

    s = get_spark("emf_spark_tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_path(tmp_path_factory):
    """Shared 2,000-record adversarial corpus (FIXTURES.md slices)."""
    from emf_spark import fixtures

    p = tmp_path_factory.mktemp("corpus") / "emf_tokenized.parquet"
    fixtures.write_corpus(str(p), 2000)
    return str(p)
