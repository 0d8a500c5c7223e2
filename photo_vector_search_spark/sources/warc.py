"""WARC / WET ingestion — the CommonCrawl container every web-scale
training pipeline starts from (C4, RefinedWeb, Dolma, FineWeb all begin at
WET/WARC records). Pure-stdlib parsing (the ISO 28500 framing is a text
header block + a Content-Length-delimited payload), no external wheels.

Format (ISO 28500 / WARC 1.0 — implemented from the public spec):
each record is ``WARC/1.x CRLF`` + ``Name: value`` header lines + blank
line + exactly ``Content-Length`` payload bytes + ``CRLF CRLF``. WET files
are WARC files whose ``conversion`` records carry extracted plain text.

Scale shape (100 TB): CommonCrawl ships a crawl as ~90k independent
``.warc.wet.gz`` files — the parallelism unit is the FILE. gzip is not
splittable, so one task per file is the honest physical plan (exactly how
every production CC pipeline schedules it); ``binaryFile`` + one Arrow
pass per file keeps parsing executor-side with zero shuffles — rows flow
straight into the curation ladder's first map stage. Memory: a WET file
is ~150 MB compressed / ~400 MB raw — bounded per task, far under
executor budgets; the parser never materializes more than one file.

Malformed trailing records (truncated uploads — real crawls contain them)
stop the parse of THAT file at the last whole record under the default
``strict=False`` (the standard tolerant-reader posture); ``strict=True``
raises with the file path for forensic runs.

Cf. reference scope: the reference ingests only a local photo directory
(photo_vector_search.py:41-42); this extends the mandated
training-pipeline source axis.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WET_SCHEMA = (
    "path string, record_id string, record_type string, target_uri string, "
    "warc_date string, content_length long, text string"
)

_HEADER_ENCODING = "utf-8"  # WARC headers are UTF-8 per ISO 28500 §4


def parse_warc_bytes(
    raw: bytes, path: str = "", strict: bool = False
) -> list[dict]:
    """Parse one WARC/WET file's bytes into record dicts — the single
    definition shared by the Spark reader and the tests' reference calls.
    Payload is decoded as UTF-8 with replacement (WET conversion records
    are text; binary WARC payloads survive as lossy text — pass-through of
    raw bytes is the read_warc_raw variant's job if ever needed)."""
    if raw[:2] == b"\x1f\x8b":  # gzip magic — .warc.wet.gz
        raw = gzip.decompress(raw)
    out: list[dict] = []
    pos, n = 0, len(raw)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and raw[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        end_hdr = raw.find(b"\r\n\r\n", pos)
        if end_hdr < 0 or not raw.startswith(b"WARC/", pos):
            if strict:
                raise ValueError(
                    f"malformed WARC framing at byte {pos} in {path!r}"
                )
            break
        headers: dict[str, str] = {}
        lines = raw[pos:end_hdr].decode(_HEADER_ENCODING, "replace").split("\r\n")
        for line in lines[1:]:  # line 0 is the WARC/1.x version
            k, _, v = line.partition(":")
            if _:
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            if strict:
                raise ValueError(
                    f"record without Content-Length at byte {pos} in {path!r}"
                )
            break
        body_start = end_hdr + 4
        if body_start + clen > n:
            if strict:
                raise ValueError(
                    f"truncated payload (want {clen} bytes) at byte {pos} "
                    f"in {path!r}"
                )
            break
        body = raw[body_start : body_start + clen]
        out.append(
            {
                "path": path,
                "record_id": headers.get("warc-record-id", ""),
                "record_type": headers.get("warc-type", ""),
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date", ""),
                "content_length": clen,
                "text": body.decode("utf-8", "replace"),
            }
        )
        pos = body_start + clen
    return out


def _parse_files(keep: tuple[str, ...], strict: bool):
    """mapInPandas closure over (path, content) file rows — ONE parser
    shared by the batch reader and the streaming reader."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                recs = parse_warc_bytes(
                    bytes(row["content"]), path=row["path"], strict=strict
                )
                if keep:
                    recs = [r for r in recs if r["record_type"] in keep]
                if recs:
                    yield pd.DataFrame(recs)

    return _parse


def read_wet(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("conversion",),
    glob: str = "*.warc.wet*",
    strict: bool = False,
) -> DataFrame:
    """WET records under ``path`` as (path, record_id, record_type,
    target_uri, warc_date, content_length, text) — one task per file (the
    gzip-honest plan), zero shuffles; ``record_types`` keeps ``conversion``
    (the extracted text) by default and drops ``warcinfo`` preambles.
    Pass ``record_types=()`` to keep every record type."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(
        _parse_files(tuple(record_types), strict), schema=WET_SCHEMA
    )


_BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def stream_wet(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("conversion",),
    glob: str = "*.warc.wet*",
    strict: bool = False,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """STREAMING WET ingestion: the same per-file parse over Structured
    Streaming's file source — a crawl landing zone becomes an incremental
    pipeline (each new ``.warc.wet.gz`` is one exactly-once micro-batch
    unit; compose with ``wet_to_documents`` — stateless, stream-safe — and
    the streaming dedup/upsert family downstream). ``max_files_per_trigger``
    bounds a micro-batch (the backfill-vs-latency knob when pointing at a
    90k-file crawl directory)."""
    reader = (
        spark.readStream.format("binaryFile")
        .schema(_BINARY_FILE_SCHEMA)  # streaming sources require one
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    files = reader.load(path).select("path", "content")
    return files.mapInPandas(
        _parse_files(tuple(record_types), strict), schema=WET_SCHEMA
    )


def wet_to_documents(
    wet: DataFrame, min_chars: int = 1, id_bits: int = 62
) -> DataFrame:
    """Adapt WET records to the curation ladder's (doc_id, text, source)
    contract: doc_id = a 62-bit hash of the record id (``pmod(xxhash64,
    2^62)`` — deterministic; audit collisions with ``wet_id_collisions``,
    which a 100 TB crawl run should check by default; CC record UUIDs are
    unique by construction), source = the registered domain of the target
    URI (the domain-cap key). Empty extractions drop. ``id_bits`` narrows
    the fold width — production keeps the default; tests force collisions
    deterministically with tiny widths."""
    from pyspark.sql import functions as F

    from ..operators.domains import url_host

    return (
        wet.filter(F.length("text") >= min_chars)
        .select(
            F.pmod(F.xxhash64("record_id"), F.lit(1 << id_bits)).alias("doc_id"),
            "text",
            F.coalesce(url_host(F.col("target_uri")), F.lit("<unknown>")).alias(
                "source"
            ),
            F.col("target_uri").alias("url"),
        )
    )


def wet_id_collisions(
    wet: DataFrame, min_chars: int = 1, id_bits: int = 62
) -> dict:
    """Audit the ``wet_to_documents`` 62-bit doc_id folding: counts of
    distinct record_ids vs the distinct doc_ids they fold to, over the same
    ``min_chars`` gate the adapter applies. A collision (``collisions > 0``)
    means two crawl records silently share a doc_id downstream — at CC scale
    the birthday bound keeps P(any) ~ n²/2^63 (~2·10⁻⁴ at 10⁹ records), but
    the audit is one cheap agg, so ingest surfaces it by default (the
    curate-corpus CLI prints it per run)."""
    from pyspark.sql import functions as F

    row = (
        wet.filter(F.length("text") >= min_chars)
        .select(
            F.countDistinct("record_id").alias("record_ids"),
            F.countDistinct(
                F.pmod(F.xxhash64("record_id"), F.lit(1 << id_bits))
            ).alias("doc_ids"),
        )
        .first()
    )
    rec, doc = int(row["record_ids"]), int(row["doc_ids"])
    return {"record_ids": rec, "doc_ids": doc, "collisions": rec - doc}
