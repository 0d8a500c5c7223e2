"""CLI workflow test — the reference's README walkthrough (index → search →
examine → delete → clear) against the Spark-backed store, driven through main()."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from photo_vector_search_spark.cli import main


@pytest.fixture(scope="module")
def photo_dir():
    tmp = tempfile.mkdtemp(prefix="pvs_cli_photos_")
    for name in ("barn.jpg", "tractor.jpg", "field.png"):
        with open(f"{tmp}/{name}", "wb") as f:
            f.write(f"IMAGE:{name}".encode())
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_cli_full_workflow(photo_dir, capsys, spark):
    tmp = tempfile.mkdtemp(prefix="pvs_cli_store_")
    store = f"{tmp}/store"
    try:
        assert main(["index-photos", "--photo-dir", photo_dir, "--store", store]) == 0
        assert "indexed 3 files" in capsys.readouterr().out

        assert main(["list-photos", "--store", store]) == 0
        listed = capsys.readouterr().out.strip().splitlines()
        assert len(listed) == 3 and any("tractor.jpg" in l for l in listed)

        assert main(["search-photos-by-text", "--query", "tractor", "--store", store, "-k", "2"]) == 0
        out = capsys.readouterr().out
        assert "distance=" in out and out.count("\n1. ") <= 1

        # Reference parity: text search ALWAYS prints the description (its
        # --verbose only raises log level, reference cli.py:107-133); image
        # search gates the description behind --verbose (cli.py:85-99).
        args = ["search-photos-by-text", "--query", "tractor", "--store", store, "-k", "1"]
        assert main([*args, "-v"]) == 0
        text_v_out = capsys.readouterr().out
        assert main(args) == 0
        text_out = capsys.readouterr().out
        assert len(text_out.splitlines()) == 2  # result line + description, always
        assert text_v_out.splitlines() == text_out.splitlines()

        img_args = ["search-photos", "--photo", f"{photo_dir}/tractor.jpg",
                    "--store", store, "-k", "1"]
        assert main([*img_args, "--verbose"]) == 0
        img_verbose_out = capsys.readouterr().out
        assert main(img_args) == 0
        img_quiet_out = capsys.readouterr().out
        assert len(img_verbose_out.splitlines()) == 2  # result + description
        assert len(img_quiet_out.splitlines()) == 1

        photo = next(l for l in listed if "barn" in l)
        assert main(["examine-image", "--photo", photo, "--store", store]) == 0
        assert "1 aspect(s)" in capsys.readouterr().out

        # add a second aspect for the same photo with a custom prompt
        src = f"{photo_dir}/barn.jpg"
        assert main(["add-aspect", "--photo", src, "--aspect", "safety",
                     "--prompt", "List safety hazards", "--store", store]) == 0
        capsys.readouterr()
        assert main(["examine-image", "--photo", src, "--store", store]) == 0
        out = capsys.readouterr().out
        assert "[safety]" in out

        assert main(["describe-store", "--store", store]) == 0
        out = capsys.readouterr().out
        assert "4 row(s), 2 aspect(s)" in out
        assert "[default] rows=3 photos=3 described=3 dim=64" in out
        assert "[safety] rows=1 photos=1 described=1 dim=64" in out

        # deletes BOTH aspects of barn.jpg (default + safety)
        assert main(["delete-photo", "--photo", photo, "--store", store]) == 0
        assert "deleted 2 row(s)" in capsys.readouterr().out
        main(["list-photos", "--store", store])
        assert len(capsys.readouterr().out.strip().splitlines()) == 2

        assert main(["clear-store", "--store", store]) == 0
        capsys.readouterr()
        main(["list-photos", "--store", store])
        assert capsys.readouterr().out.strip() == ""

        assert main(["delete-store", "--store", store]) == 2  # refuses without --yes
        assert main(["delete-store", "--store", store, "--yes"]) == 0
        assert not os.path.exists(store)

        assert main(["list-models"]) == 0
        assert "stub-hash-projection" in capsys.readouterr().out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_cli_missing_store_exits_2(spark):
    with pytest.raises(SystemExit) as e:
        main(["list-photos", "--store", "/nonexistent/store"])
    assert e.value.code == 2


def test_cli_curate_corpus(tmp_path, capsys, spark, sf_dir):
    """curate-corpus runs the text pipeline end-to-end from the CLI: stage
    stats on stdout, JSONL shards on disk, and the shard contents reload."""
    docs = str(tmp_path / "docs")
    out = str(tmp_path / "shards")
    spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).write.parquet(docs)

    rc = main(
        [
            "curate-corpus",
            "--docs", docs,
            "--out", out,
            "--shards", "2",
            "--substring-ngram", "5",
        ]
    )
    assert rc == 0
    printed = capsys.readouterr().out
    assert "after_near_dedup:" in printed and "shards_written: 2" in printed
    from photo_vector_search_spark.sources.jsonl import read_jsonl_shards

    reloaded = read_jsonl_shards(spark, out)
    assert reloaded.count() > 0
    assert {"doc_id", "text", "pos"} <= set(reloaded.columns)

    # schema guard: a parquet without doc_id/text exits 2
    bad = str(tmp_path / "bad")
    spark.range(3).write.parquet(bad)
    assert main(["curate-corpus", "--docs", bad, "--out", out]) == 2

    # the r9 opt-in stages reach the pipeline from flags and report stats
    out2 = str(tmp_path / "shards2")
    rc = main(
        [
            "curate-corpus",
            "--docs", docs,
            "--out", out2,
            "--shards", "2",
            "--no-quality-gate",
            "--compression-bounds", "0.05", "0.95",
            "--kn-keep-frac", "0.8",
            "--prototype-keep-frac", "0.5",
            "--prototype-clusters", "4",
            "--budget-tokens", "2000",
        ]
    )
    assert rc == 0
    printed = capsys.readouterr().out
    for key in ("after_compression_gate:", "after_kn_ppl:",
                "after_prototype_prune:", "after_budget_select:"):
        assert key in printed, key


def test_cli_curate_corpus_usage_errors(tmp_path, capsys, spark, sf_dir):
    """Bad stage parameters are pre-flight usage errors (stderr + exit 2),
    never a mid-pipeline traceback — including --prototype-clusters < 1
    (round-10 review fix: it previously failed later inside k-means)."""
    docs = str(tmp_path / "docs")
    out = str(tmp_path / "shards")
    spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).write.parquet(docs)

    base = ["curate-corpus", "--docs", docs, "--out", out]
    for extra, msg in (
        (["--kn-keep-frac", "0"], "--kn-keep-frac"),
        (["--prototype-keep-frac", "1.5"], "--prototype-keep-frac"),
        (["--prototype-keep-frac", "0.5", "--prototype-clusters", "0"],
         "--prototype-clusters"),
        (["--prototype-keep-frac", "0.5", "--prototype-clusters", "-3"],
         "--prototype-clusters"),
        (["--budget-tokens", "-5"], "--budget-tokens"),
    ):
        assert main(base + extra) == 2
        assert msg in capsys.readouterr().err


def test_cli_curate_corpus_from_wet(tmp_path, capsys, spark):
    """--wet points the curation ladder at raw CommonCrawl WET files: the
    crawl-to-shards story in one command. Exactly one of --docs/--wet."""
    import gzip

    from tests.test_warc import WET_BYTES, _record

    wet_dir = tmp_path / "wet"
    wet_dir.mkdir()
    (wet_dir / "a.warc.wet").write_bytes(WET_BYTES)
    # enough distinct docs that the gates keep something: synthesize more
    recs = b"".join(
        _record(
            "conversion",
            f"https://site{i % 5}.example.org/p/{i}",
            "The quick brown fox jumps over the lazy dog number %d and then "
            "walks home through the quiet town in the early evening light." % i,
            f"gen-{i}",
        )
        for i in range(40)
    )
    (wet_dir / "b.warc.wet.gz").write_bytes(gzip.compress(recs))
    out = str(tmp_path / "shards")

    rc = main(
        ["curate-corpus", "--wet", str(wet_dir), "--out", out, "--shards", "2",
         "--no-quality-gate"]
    )
    assert rc == 0
    printed = capsys.readouterr().out
    assert "input: 42" in printed  # 2 fixture + 40 synthesized conversions
    # the ingest surfaces the doc_id collision audit by default
    assert "wet ingest: 42 record id(s) -> 42 doc id(s), 0 collision(s)" in printed
    from photo_vector_search_spark.sources.jsonl import read_jsonl_shards

    reloaded = read_jsonl_shards(spark, out)
    assert reloaded.count() > 0
    assert {"doc_id", "text", "pos"} <= set(reloaded.columns)

    # exactly one input source
    assert main(["curate-corpus", "--out", out]) == 2
    assert "exactly one of" in capsys.readouterr().err
    assert (
        main(["curate-corpus", "--docs", "x", "--wet", str(wet_dir), "--out", out])
        == 2
    )


def test_cli_search_text_and_hybrid(tmp_path, capsys, spark):
    """search-text ranks by BM25 over a documents parquet; search-hybrid
    fuses the embedding and lexical runs — both print rank/score/snippet
    lines and validate their inputs with exit 2."""
    docs_path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a slow green turtle naps under the warm sun"),
            (3, "quick quick fox fox everywhere in this text"),
        ],
        "doc_id long, text string",
    ).write.parquet(docs_path)

    rc = main(["search-text", "--docs", docs_path, "quick fox", "-k", "2"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 2
    assert out[0].lstrip().startswith("1. doc 3")  # doubled tf wins under saturation
    assert "bm25=" in out[0] and "quick" in out[0]

    # no matches → exit 1; bad query → exit 2 with the operator's message
    assert main(["search-text", "--docs", docs_path, "zzz_nowhere"]) == 1
    assert "no matches" in capsys.readouterr().out
    assert main(["search-text", "--docs", docs_path, "   "]) == 2
    assert "no terms" in capsys.readouterr().err

    # hybrid: embeddings keyed by vec_id == doc_id (the fixture convention)
    from photo_vector_search_spark.pipelines.embed import stub_embedding_expr
    from pyspark.sql import functions as F

    emb_path = str(tmp_path / "emb.parquet")
    spark.read.parquet(docs_path).select(
        F.col("doc_id").alias("vec_id"),
        F.lit(0).alias("label"),
        stub_embedding_expr(F.col("text")).alias("embedding"),
    ).write.parquet(emb_path)
    rc = main(
        ["search-hybrid", "--docs", docs_path, "--embeddings", emb_path,
         "quick fox", "-k", "3"]
    )
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 3 and all("rrf=" in ln for ln in lines)
    assert main(
        ["search-hybrid", "--docs", docs_path, "--embeddings", emb_path,
         "quick fox", "-k", "0"]
    ) == 2


def test_cli_colbert_index(tmp_path, capsys, spark):
    """`colbert-index build/search` drives the persisted MaxSim token store
    end-to-end: build prints the build id, search serves ranked hits from
    the store, a no-match query exits 1, a bad k exits 2, and a docs
    parquet without the required columns is refused at build."""
    docs_path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a slow green turtle naps under the warm sun"),
            (3, "quick quick fox fox everywhere in this text"),
        ],
        "doc_id long, text string",
    ).write.parquet(docs_path)
    idx = str(tmp_path / "colbert_idx")

    assert main(["colbert-index", "build", "--docs", docs_path,
                 "--index", idx]) == 0
    assert "built MaxSim token store" in capsys.readouterr().out

    assert main(["colbert-index", "search", "--index", idx,
                 "quick fox", "-k", "2"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2 and all("maxsim=" in ln for ln in lines)
    # docs 1 and 3 both contain exact matches for BOTH query tokens, so
    # each scores exactly 2.0 (MaxSim is tf-agnostic, unlike BM25) — the
    # deterministic tie-break is ascending doc id; the no-match doc 2 is out
    assert lines[0].lstrip().startswith("1. doc 1")
    assert "maxsim=2.000000" in lines[0]
    assert lines[1].lstrip().startswith("2. doc 3")

    assert main(["colbert-index", "search", "--index", idx, "   "]) == 2
    assert "no tokens" in capsys.readouterr().err
    assert main(["colbert-index", "search", "--index", idx,
                 "quick", "-k", "0"]) == 2

    bad = str(tmp_path / "bad.parquet")
    spark.createDataFrame([(1,)], "x long").write.parquet(bad)
    assert main(["colbert-index", "build", "--docs", bad,
                 "--index", idx + "2"]) == 2
    assert "doc_id and text" in capsys.readouterr().err


def test_cli_bm25_index(tmp_path, capsys, spark):
    """`bm25-index build/upsert/delete/compact/search` drives the persisted
    postings store end-to-end, including the live view between compactions."""
    docs_path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a slow green turtle naps under the warm sun"),
            (3, "quick quick fox fox everywhere in this text"),
        ],
        "doc_id long, text string",
    ).write.parquet(docs_path)
    idx = str(tmp_path / "bm25_idx")

    assert main(["bm25-index", "build", "--docs", docs_path,
                 "--index", idx, "--buckets", "8"]) == 0
    out = capsys.readouterr().out
    assert "built BM25 postings store" in out and "3 docs" in out

    assert main(["bm25-index", "search", "--index", idx,
                 "quick fox", "-k", "2"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2 and all("bm25=" in ln for ln in lines)
    # doc 3 repeats both terms — tf saturation still ranks it first
    assert lines[0].lstrip().startswith("1. doc 3")

    # upsert a doc that now matches, serve it from the live view
    delta = str(tmp_path / "delta.parquet")
    spark.createDataFrame(
        [(2, "quick fox convert")], "doc_id long, text string"
    ).write.parquet(delta)
    assert main(["bm25-index", "upsert", "--docs", delta,
                 "--index", idx]) == 0
    assert "upserted 1 docs" in capsys.readouterr().out
    assert main(["bm25-index", "search", "--index", idx, "--live",
                 "quick fox", "-k", "3"]) == 0
    live = capsys.readouterr().out.strip().splitlines()
    assert len(live) == 3  # doc 2 matches now
    # without --live, the base snapshot still serves the old 2 hits
    assert main(["bm25-index", "search", "--index", idx,
                 "quick fox", "-k", "3"]) == 0
    assert len(capsys.readouterr().out.strip().splitlines()) == 2

    assert main(["bm25-index", "delete", "--index", idx, "--ids", "3"]) == 0
    assert "tombstoned 1 ids" in capsys.readouterr().out
    assert main(["bm25-index", "compact", "--index", idx]) == 0
    assert "compacted to 2 live docs" in capsys.readouterr().out
    assert main(["bm25-index", "search", "--index", idx,
                 "quick fox", "-k", "5"]) == 0
    after = capsys.readouterr().out.strip().splitlines()
    assert len(after) == 2 and all("doc 3" not in ln for ln in after)

    # no-match exits 1; empty query exits 2
    assert main(["bm25-index", "search", "--index", idx, "zzz"]) == 1
    capsys.readouterr()
    assert main(["bm25-index", "search", "--index", idx, "  "]) == 2
    assert "no terms" in capsys.readouterr().err


def test_cli_cv2_index(tmp_path, capsys, spark):
    """`cv2-index build/search` drives the compressed token store: build
    prints the build id, search serves ranked hits from the codes."""
    docs_path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a slow green turtle naps under the warm sun"),
            (3, "quick quick fox fox everywhere in this text"),
        ],
        "doc_id long, text string",
    ).write.parquet(docs_path)
    idx = str(tmp_path / "cv2_idx")

    assert main(["cv2-index", "build", "--docs", docs_path,
                 "--index", idx, "--centroids", "16"]) == 0
    assert "built ColBERTv2 compressed token store" in capsys.readouterr().out

    assert main(["cv2-index", "search", "--index", idx,
                 "quick fox", "-k", "2"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2 and all("maxsim=" in ln for ln in lines)
    # the no-match doc 2 must not appear
    assert all("doc 2" not in ln for ln in lines)

    assert main(["cv2-index", "search", "--index", idx, "   "]) == 2
    assert "no tokens" in capsys.readouterr().err

    # incremental lifecycle: upsert → live search → delete → compact
    # the new doc is the only one with EXACT matches for both query tokens
    # (MaxSim is tf-agnostic, so a repeat of in-corpus tokens would tie
    # docs 1/3 and lose the ascending-id break — the colbert-index rule)
    new_path = str(tmp_path / "new.parquet")
    spark.createDataFrame(
        [(9001, "zebra unicorn parade")], "doc_id long, text string"
    ).write.parquet(new_path)
    assert main(["cv2-index", "upsert", "--docs", new_path,
                 "--index", idx]) == 0
    assert "upserted 1 docs" in capsys.readouterr().out
    assert main(["cv2-index", "search", "--index", idx, "--live",
                 "zebra unicorn", "-k", "1"]) == 0
    live = capsys.readouterr().out.strip().splitlines()
    assert live[0].lstrip().startswith("1. doc 9001")
    assert main(["cv2-index", "delete", "--index", idx,
                 "--ids", "9001"]) == 0
    assert "tombstoned 1 ids" in capsys.readouterr().out
    assert main(["cv2-index", "compact", "--index", idx]) == 0
    assert "compacted to 3 live docs" in capsys.readouterr().out

    bad = str(tmp_path / "bad.parquet")
    spark.createDataFrame([(1,)], "x long").write.parquet(bad)
    assert main(["cv2-index", "build", "--docs", bad,
                 "--index", idx + "2"]) == 2
    assert "doc_id and text" in capsys.readouterr().err
