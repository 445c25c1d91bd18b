"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we would set on a real cluster:
AQE on (runtime re-planning, skew-join handling), Arrow transfer for
the Pandas-UDF slow path, UTC session timezone so timestamp semantics
match the DuckDB oracle, and shuffle partitions sized to the machine
instead of Spark's legacy default of 200.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _package_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ensure_package_shipped(spark: SparkSession) -> None:
    """Idempotently ship ``libmr_spark`` to the executors of ANY
    session — including one created by an external harness rather than
    :func:`get_spark`. Safe to call per-query (marker on the
    SparkContext makes repeats free)."""
    sc = spark.sparkContext
    if getattr(sc, "_libmr_pkg_shipped", False):
        return
    _ship_package(spark)
    sc._libmr_pkg_shipped = True


def _ship_package(spark: SparkSession) -> None:
    """Make ``libmr_spark`` importable on every executor.

    Steps registered inside the package (e.g. the built-in ``dbsize``
    remote task) pickle by module reference, so executors must be able
    to import the package — the Spark-native replacement for LibMR's
    register-on-every-node-at-load (``/root/reference/src/mr.c:1698-1762``).
    ``addPyFile`` ships a zip of the package through Spark's file
    server, which works identically on a real cluster and in local mode.
    """
    pkg_dir = os.path.join(_package_root(), "libmr_spark")
    zpath = os.path.join(tempfile.gettempdir(), "libmr_spark_pkg.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, _package_root()))
    spark.sparkContext.addPyFile(zpath)


def get_spark(
    app_name: str = "libmr_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with scale-aware defaults.

    These configs are the ones that still matter at 1000 executors:
    AQE coalescing/skew handling, broadcast threshold, Arrow batching.
    ``local[N]`` is only the test harness; nothing here assumes
    single-node execution.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    nshuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    # Local-mode python workers inherit PYTHONPATH from the driver env;
    # set it before the JVM starts so registered steps resolve.
    pp = os.environ.get("PYTHONPATH", "")
    if _package_root() not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{_package_root()}{os.pathsep}{pp}" if pp else _package_root()
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ensure_package_shipped(spark)
    return spark
