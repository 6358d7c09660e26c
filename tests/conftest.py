import sys

import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder
        .master("local[4]")
        .appName("morph-xr2rml-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()


import os as _os

import pytest as _pytest

# tests that read the reference checkout (mappings, golden outputs) skip
# cleanly when it isn't present, so the repo is standalone-runnable
requires_reference = _pytest.mark.skipif(
    not _os.path.exists("/root/reference"),
    reason="reference checkout not available")
