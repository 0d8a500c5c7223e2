"""WET/WARC ingestion: exact ISO 28500 framing (Content-Length-delimited
payloads incl. multibyte text), gzip and plain files, record-type
filtering, tolerant/strict truncation handling, and the adapter into the
curation ladder's documents contract."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.sources.warc import (
    parse_warc_bytes,
    read_wet,
    wet_to_documents,
)


def _record(rtype: str, uri: str | None, body: str, rid: str) -> bytes:
    payload = body.encode("utf-8")
    headers = [
        "WARC/1.0",
        f"WARC-Type: {rtype}",
        f"WARC-Record-ID: <urn:uuid:{rid}>",
        "WARC-Date: 2024-01-15T12:00:00Z",
    ]
    if uri is not None:
        headers.append(f"WARC-Target-URI: {uri}")
    headers.append(f"Content-Length: {len(payload)}")
    return "\r\n".join(headers).encode() + b"\r\n\r\n" + payload + b"\r\n\r\n"


BODY_A = "First page text.\nSecond line with an em—dash and café."
BODY_B = "Another page.\r\n\r\nWARC/1.0 looks like a header but is payload."
WET_BYTES = (
    _record("warcinfo", None, "software: test-crawler 1.0", "info-1")
    + _record("conversion", "https://example.com/a", BODY_A, "rec-a")
    + _record("conversion", "https://sub.example.org/b?x=1", BODY_B, "rec-b")
)


def test_parse_exact_framing_and_multibyte():
    recs = parse_warc_bytes(WET_BYTES, path="mem")
    assert [r["record_type"] for r in recs] == ["warcinfo", "conversion", "conversion"]
    a = recs[1]
    assert a["text"] == BODY_A  # byte-exact despite multibyte chars
    assert a["content_length"] == len(BODY_A.encode("utf-8"))
    assert a["target_uri"] == "https://example.com/a"
    assert a["warc_date"] == "2024-01-15T12:00:00Z"
    # a payload CONTAINING "WARC/1.0" must not split the record
    assert recs[2]["text"] == BODY_B


def test_truncated_tail_tolerant_and_strict():
    # cut mid-PAYLOAD (the trailing CRLFs + 2 payload bytes): headers whole
    truncated = WET_BYTES + _record("conversion", "https://x.y/c", "tail", "rec-c")[:-6]
    recs = parse_warc_bytes(truncated, path="mem")
    assert len(recs) == 3  # whole records survive, the torn tail drops
    with pytest.raises(ValueError, match="truncated payload"):
        parse_warc_bytes(truncated, path="mem", strict=True)
    with pytest.raises(ValueError, match="malformed WARC framing"):
        parse_warc_bytes(b"not a warc at all", strict=True)
    assert parse_warc_bytes(b"not a warc at all") == []


def test_read_wet_gz_and_plain(spark, tmp_path):
    (tmp_path / "a.warc.wet").write_bytes(WET_BYTES)
    (tmp_path / "b.warc.wet.gz").write_bytes(gzip.compress(WET_BYTES))
    (tmp_path / "ignored.txt").write_bytes(b"not picked up by the glob")

    out = read_wet(spark, str(tmp_path))
    rows = out.collect()
    # conversion-only by default, from BOTH files
    assert len(rows) == 4
    assert {r["record_type"] for r in rows} == {"conversion"}
    texts = sorted({r["text"] for r in rows})
    assert texts == sorted({BODY_A, BODY_B})

    # record_types=() keeps warcinfo preambles too
    all_rows = read_wet(spark, str(tmp_path), record_types=()).collect()
    assert len(all_rows) == 6
    assert sum(r["record_type"] == "warcinfo" for r in all_rows) == 2


def test_wet_to_documents_adapter(spark, tmp_path):
    (tmp_path / "a.warc.wet").write_bytes(WET_BYTES)
    docs = wet_to_documents(read_wet(spark, str(tmp_path)))
    rows = {r["url"]: r for r in docs.collect()}
    assert set(rows) == {"https://example.com/a", "https://sub.example.org/b?x=1"}
    assert rows["https://example.com/a"]["source"] == "example.com"
    assert rows["https://sub.example.org/b?x=1"]["source"] == "sub.example.org"
    ids = [r["doc_id"] for r in rows.values()]
    assert len(set(ids)) == 2 and all(i >= 0 for i in ids)
    # deterministic ids: re-reading yields the same mapping
    again = {
        r["url"]: r["doc_id"]
        for r in wet_to_documents(read_wet(spark, str(tmp_path))).collect()
    }
    assert again == {u: r["doc_id"] for u, r in rows.items()}
    # the adapter's frame drives the curation entry contract
    assert {"doc_id", "text", "source"} <= set(docs.columns)


def test_wet_id_collision_audit(spark, tmp_path):
    """The 62-bit doc_id fold ships with a one-agg collision audit: clean at
    the default width on distinct record ids, and detecting EVERY collision
    when a tiny fold width forces them (the deterministic forced-collision
    fixture — modulus 2^0 folds all ids to 0)."""
    from photo_vector_search_spark.sources.warc import wet_id_collisions

    recs = b"".join(
        _record("conversion", f"https://example.com/{i}", f"Body {i}.", f"r-{i}")
        for i in range(20)
    )
    (tmp_path / "a.warc.wet").write_bytes(recs)
    wet = read_wet(spark, str(tmp_path))

    clean = wet_id_collisions(wet)
    assert clean == {"record_ids": 20, "doc_ids": 20, "collisions": 0}

    forced = wet_id_collisions(wet, id_bits=0)  # modulus 1: all ids collide
    assert forced == {"record_ids": 20, "doc_ids": 1, "collisions": 19}

    # the audit counts the SAME fold the adapter applies: distinct doc_ids in
    # the adapted frame equals the audit's doc_ids at every width
    for bits in (0, 2, 62):
        audit = wet_id_collisions(wet, id_bits=bits)
        adapted = (
            wet_to_documents(wet, id_bits=bits)
            .select("doc_id").distinct().count()
        )
        assert audit["doc_ids"] == adapted
        assert audit["collisions"] == audit["record_ids"] - audit["doc_ids"]

    # min_chars gate is shared too: empty bodies drop from both sides
    empty = _record("conversion", "https://example.com/e", "", "r-empty")
    (tmp_path / "b.warc.wet").write_bytes(empty)
    wet2 = read_wet(spark, str(tmp_path))
    assert wet_id_collisions(wet2)["record_ids"] == 20


def test_stream_wet_incremental(spark, tmp_path):
    """Streaming WET: each new file is one exactly-once micro-batch unit —
    the batch parser's rows arrive incrementally and compose with the
    stateless documents adapter."""
    import gzip as _gzip

    from photo_vector_search_spark.sources.warc import stream_wet

    in_dir = tmp_path / "landing"
    in_dir.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (in_dir / "a.warc.wet").write_bytes(WET_BYTES)

    stream = wet_to_documents(stream_wet(spark, str(in_dir)))
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    first = spark.read.parquet(out_dir)
    assert first.count() == 2  # the two conversion records

    # a new file landing is picked up incrementally, old rows not re-emitted
    more = _record("conversion", "https://late.example.net/c", "Late page.", "rec-c")
    (in_dir / "b.warc.wet.gz").write_bytes(_gzip.compress(more))
    q2 = (
        wet_to_documents(stream_wet(spark, str(in_dir)))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(600)
    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == 3
    assert sum(r["source"] == "late.example.net" for r in rows) == 1
    # batch and stream parse identically (shared _parse_files closure)
    batch = {
        (r["doc_id"], r["text"])
        for r in wet_to_documents(read_wet(spark, str(in_dir))).collect()
    }
    assert {(r["doc_id"], r["text"]) for r in rows} == batch
