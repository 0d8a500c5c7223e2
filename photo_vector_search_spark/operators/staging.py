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
