"""Directory ingestion — the reference's recursive photo scan
(`photo_directory.rglob("*")` + suffix filter, cli.py:41-42) as a Spark source.

``binaryFile`` gives (path, modificationTime, length, content) with partition-level
parallel listing; ``pathGlobFilter`` applies the extension filter at the source
(the listing itself prunes, no post-filter scan). At 100 TB of images the listing
is driver-metadata work and the content read is fully parallel."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

IMAGE_EXTENSIONS = ("png", "jpg", "jpeg")  # cli.py:42


def scan_images(
    spark: SparkSession,
    directory: str,
    extensions: tuple[str, ...] = IMAGE_EXTENSIONS,
    recursive: bool = True,
) -> DataFrame:
    """(path, content, length, modificationTime) for files matching the extension
    set, case-insensitively, recursively — SC1+SC2.

    Char-class glob (``[jJ][pP][gG]``) so ANY case mix matches at the listing
    level (``.Jpg``/``.JPeG`` included, like the reference's suffix.lower()),
    without reading non-matching files at all."""
    glob = "*.{%s}" % ",".join(
        "".join(f"[{c.lower()}{c.upper()}]" for c in e) for e in sorted(set(extensions))
    )
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", str(recursive).lower())
        .load(directory)
        # binaryFile reports URIs (file:/…); strip the scheme so photo_path
        # round-trips as a plain filesystem path like the reference's
        .select(
            F.regexp_replace("path", "^file:", "").alias("path"),
            "content",
            "length",
            "modificationTime",
        )
    )


def with_basename(df: DataFrame, path_col: str = "path") -> DataFrame:
    """F6 — basename extraction (`Path(...).name`, photo_vector_search.py:184)."""
    return df.withColumn("basename", F.element_at(F.split(F.col(path_col), "/"), -1))
