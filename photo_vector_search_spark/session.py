"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default all cores); the same
configuration keys are the ones that matter on a real cluster:

- AQE on (runtime broadcast conversion, skew-join splitting, partition coalescing).
- Arrow on for pandas-UDF exchange; ``maxRecordsPerBatch`` bounds UDF batch memory
  (the reference's analogue is its ≤1024px image downscale bound,
  photo_vector_search.py:53-54 — bound work per unit *before* the expensive operator).
- ``spark.sql.shuffle.partitions`` sized to the test box; at 100 TB you would size this
  to ~2-3× total executor cores or simply let AQE coalesce from a high initial value.
- Session timezone pinned to UTC so timestamp results are reproducible against the
  DuckDB oracle.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import SparkSession


def _available_memory_bytes() -> int | None:
    """Usable RAM: min(physical, cgroup limit). sysconf reports the HOST's
    memory even inside a memory-limited container, so a 4 GB-capped pod on a
    128 GB node must read its cgroup cap (v2 ``memory.max`` / v1
    ``memory.limit_in_bytes``) or the derived heap OOM-kills the driver."""
    log = logging.getLogger(__name__)
    candidates = []
    try:
        candidates.append(os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES"))
    except (ValueError, OSError, AttributeError) as exc:  # non-POSIX sysconf
        log.debug("sysconf physical-memory probe unavailable: %s", exc)
    for cgroup_file in ("/sys/fs/cgroup/memory.max",
                        "/sys/fs/cgroup/memory/memory.limit_in_bytes"):
        try:
            raw = open(cgroup_file).read().strip()
            if raw != "max":  # v2 spells "no limit" as the literal string max
                candidates.append(int(raw))
        except (OSError, ValueError) as exc:  # file absent = other cgroup version
            log.debug("cgroup memory probe %s skipped: %s", cgroup_file, exc)
            continue
    return min(candidates) if candidates else None


def _default_driver_memory() -> str:
    """A quarter of usable RAM clamped to [2g, 16g] — see get_spark body."""
    total = _available_memory_bytes()
    if total is None:
        return "2g"
    return f"{min(max(total // 4, 2 << 30), 16 << 30) >> 30}g"


def get_spark(
    app_name: str = "photo-vector-search-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
    # In local mode the driver JVM IS the executor; the 1g default driver heap
    # starves broadcast builds well below what the box can hold (seen: LSH band
    # self-join at 10× fixture scale), and a large heap is a measured ~10% win
    # at sf0.1 (SCALE_BENCH.md round-3 note). But a fixed 16g fails outright on
    # small hosts, so the default derives from physical RAM: a quarter of it,
    # clamped to [2g, 16g]. No-op if the JVM already exists (behavior then
    # follows whichever call created it — override via env to pin it).
    memory = os.environ.get("SPARK_GRAFT_DRIVER_MEMORY") or _default_driver_memory()
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.driver.memory", memory)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
