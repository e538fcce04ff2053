"""SparkSession factory tuned for this engine.

Arrow on (every custom kernel is a pandas/Arrow UDF), AQE on (runtime
skew/broadcast re-planning), shuffle partitions sized to cores rather than
the 200 default. At cluster scale the same factory is used via
``spark-submit --py-files gjspark.zip`` (see ``gjspark/plans/job.py``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# One BLAS thread per Python worker: N workers x M BLAS threads thrashes the
# box and makes UDF stage times wildly variable. Python workers inherit the
# driver env in local mode; spark.executorEnv covers cluster mode.
_BLAS_VARS = (
    "OMP_NUM_THREADS",
    "OPENBLAS_NUM_THREADS",
    "MKL_NUM_THREADS",
    "NUMEXPR_NUM_THREADS",
)
for _v in _BLAS_VARS:
    os.environ.setdefault(_v, "1")


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except (PermissionError, OSError):
        return True  # exists but not ours — treat as alive
    return True


def _sweep_stale_scratch(scratch: str) -> None:
    """RAM-backed scratch dirs leak when a JVM is killed; reap dead ones.

    Only sibling ``sess-<pid>-*`` dirs whose owning PID is no longer alive
    are removed. Age-based sweeping is unsafe: a directory's mtime does not
    change when files change deeper inside it, so a long-running Spark
    job's live shuffle dirs would look "stale" after a few hours and get
    deleted out from under it.
    """
    import shutil

    try:
        for name in os.listdir(scratch):
            if not name.startswith("sess-"):
                continue
            parts = name.split("-")
            try:
                pid = int(parts[1])
            except (IndexError, ValueError):
                continue
            if not _pid_alive(pid):
                shutil.rmtree(os.path.join(scratch, name), ignore_errors=True)
    except OSError:
        pass


def _session_scratch_dir(root: str) -> str:
    """Own scratch subdir per driver process, PID encoded for the sweeper."""
    import tempfile

    os.makedirs(root, exist_ok=True)
    _sweep_stale_scratch(root)
    return tempfile.mkdtemp(prefix=f"sess-{os.getpid()}-", dir=root)


def get_spark(
    app_name: str = "gjspark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (32 in this sandbox).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = cpus if cpus.isdigit() else "32"
        shuffle_partitions = max(int(n), 8)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("GJSPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # Shuffle/spill scratch: the sandbox's virtual disk writes at tens of
    # MB/s, which makes any shuffle look like a scaling wall (a pure
    # local-mode artifact — on a cluster each node spills to its own
    # NVMe). Use the RAM-backed dir when present, exactly like deploying
    # with node-local tmpfs/NVMe scratch; override with SPARK_LOCAL_DIRS.
    scratch = os.environ.get("GJSPARK_LOCAL_DIR", "/dev/shm/gjspark-scratch")
    if "SPARK_LOCAL_DIRS" not in os.environ:
        try:
            b = b.config("spark.local.dir", _session_scratch_dir(scratch))
        except OSError:
            pass
    for v in _BLAS_VARS:
        b = b.config(f"spark.executorEnv.{v}", "1")
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
