"""Session-owned parquet staging scratch — shared by operators that must
materialize an intermediate exactly once (LSH pair results, the shuffle's
bucketed projection) instead of re-executing their upstream plan per consumer.

Local mode defaults to a driver temp dir; clusters MUST set
``SPARK_GRAFT_STAGING_DIR`` to shared storage every executor can reach
(HDFS/S3/NFS scratch) — the standard distributed-checkpoint location. Default
dirs are registered for atexit cleanup so long-lived sessions don't leak one
staged parquet per call; a caller passing an explicit dir owns its lifecycle.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid


def session_staging_dir(prefix: str) -> str:
    """A fresh staging path under the session scratch root, cleaned at exit."""
    shared = os.environ.get("SPARK_GRAFT_STAGING_DIR")
    if shared:
        # cluster-safe default: unique subdir of the configured shared scratch
        path = f"{shared.rstrip('/')}/{prefix}_{uuid.uuid4().hex}"
    else:
        path = tempfile.mkdtemp(prefix=f"{prefix}_")
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def stage_frame(df, prefix: str, staging_dir: str | None = None):
    """Materialize ``df`` to parquet ONCE (eagerly, at call time) and return
    a scan of the staged copy.

    The fix for the multi-consumer fan-out trap: Spark does not deduplicate
    common subtrees across a plan's branches (verified: executed adaptive
    plans of the dedup/TF-IDF fan-outs show zero ReusedExchange), so a
    derived frame feeding N consumers — e.g. a shingle/gram/token explode
    feeding both an aggregation and a join probe — executes its whole
    upstream N times. Staging converts that into one execution plus N cheap
    columnar re-scans, and at 100 TB the write is linear in the frame while
    the avoided re-executions were linear in the CORPUS each.

    Use for frames that are (a) expensive to derive (explode, join, Python
    stage) and (b) consumed by more than one downstream subtree. A bare
    deterministic scan does NOT need this (re-scanning immutable files IS
    the staged read — see ``shuffle_corpus``'s auto mode). An explicit
    ``staging_dir`` must outlive every consumer of the returned DataFrame."""
    if staging_dir is None:
        staging_dir = session_staging_dir(prefix)
    df.write.mode("overwrite").parquet(staging_dir)
    return df.sparkSession.read.parquet(staging_dir)
