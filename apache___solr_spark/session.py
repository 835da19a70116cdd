"""SparkSession factory with the engine's recommended configuration."""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on executors (the ``spark-submit
    --py-files`` analog, applied automatically so library users don't hit
    ModuleNotFoundError in UDF workers)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}-{os.path.getmtime(pkg_dir):.0f}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath + ".tmp", "w") as z:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.join(
                            pkg_name, os.path.relpath(full, pkg_dir)
                        )
                        z.write(full, rel)
        os.replace(zpath + ".tmp", zpath)
    spark.sparkContext.addPyFile(zpath)


def get_spark(
    app_name: str = "apache___solr_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build a local session tuned like we'd tune a real cluster.

    On a real deployment this is `spark-submit --py-files` territory; the
    session-level knobs below (AQE, Arrow, shuffle partition sizing) carry
    over unchanged.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    cores = str(cores)
    master = cores if cores.startswith("local") else f"local[{cores}]"
    n_cores = os.cpu_count() or 8
    if shuffle_partitions is None:
        try:
            shuffle_partitions = int(cores)
        except ValueError:
            shuffle_partitions = n_cores
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    return spark
