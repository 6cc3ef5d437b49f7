from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from social_and_media_data_ingestion_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s
