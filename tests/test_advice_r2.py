"""Round-2 regression tests for ADVICE.md findings: nanos int-division parity,
search --model + dimension guard, band-width divergence, deterministic tie-break,
shingle-cache lifecycle, and the broadcast-collect guard."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_events_nanos_integer_truncation(spark, tmp_path):
    """Epoch-nanos above 2^53 can't round-trip through double: a float divide
    lands on a different microsecond than integer `div`. The loader must match
    DuckDB's integer truncation exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from photo_vector_search_spark.sources.tables import load_table

    v = (1 << 60) + 999  # float64 rounds this to 2^60+1024 -> off-by-one microsecond
    assert int(float(v) / 1000) != v // 1000  # the defect this guards against
    tbl = pa.table({"ts": pa.array([v], type=pa.timestamp("ns")), "user_id": [1]})
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = load_table(spark, str(tmp_path), "events").select(
        F.unix_micros("ts").alias("us")
    ).first()["us"]
    assert got == v // 1000


def test_lsh_band_width_must_divide(spark):
    from photo_vector_search_spark.operators.dedup import _bands_from_wide, lsh_bands

    sig = spark.createDataFrame([(1, 0, 7)], "doc_id long, i int, mh long")
    with pytest.raises(ValueError, match="multiple of bands"):
        lsh_bands(sig, bands=5, num_hashes=32)
    wide = spark.createDataFrame([(1, 7, 8, 9)], "doc_id long, mh0 long, mh1 long, mh2 long")
    with pytest.raises(ValueError, match="multiple of bands"):
        _bands_from_wide(wide, bands=2)


def test_minhash_lsh_pairs_leaves_no_cached_rdds(spark):
    """The shingle cache must be unpersisted by the time the call returns —
    repeated calls in a long-lived session must not accumulate cached RDDs."""
    from photo_vector_search_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog wearing hat %d" % (i % 2))
         for i in range(20)],
        "doc_id long, text string",
    )
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    for _ in range(2):
        assert minhash_lsh_pairs(docs, n=3, tau=0.5).count() > 0
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after <= before, f"cached RDDs leaked: {before} -> {after}"


def test_near_dup_fast_guard_refuses_oversized_collect(spark):
    from photo_vector_search_spark.operators.dedup import embedding_near_dup_fast

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, 0.0]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    # allow_approx=False restores the round-3 refuse-don't-reroute contract
    with pytest.raises(ValueError, match="srp_lsh_near_dup_pairs"):
        embedding_near_dup_fast(
            emb, tau=0.4, max_broadcast_bytes=64, allow_approx=False
        )
    # under the limit it still runs
    assert embedding_near_dup_fast(emb, tau=0.99).count() >= 0


def test_near_dup_fast_reroutes_past_guard_without_collect(spark):
    """VERDICT r3 #3: past the broadcast guard the DEFAULT call must keep
    working by degrading to the distributed SRP rung — same schema, exact
    precision (every returned pair truly ≥ tau), no driver gather."""
    from photo_vector_search_spark.operators import dedup as dd

    # clusterable corpus: two tight groups → SRP finds the in-group pairs
    base_a = [1.0, 0.2, 0.1, 0.0, 0.3, 0.9, 0.0, 0.1]
    base_b = [0.0, 1.0, 0.0, 0.8, 0.1, 0.0, 0.7, 0.2]
    rows = []
    for i in range(30):
        src = base_a if i % 2 == 0 else base_b
        rows.append((i, [v + (i % 7) * 1e-3 for v in src]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # prove no driver gather on the fallback path: spy on DataFrame.collect
    # (first()/take() route through it with 1-row results; the broadcast rung
    # would gather all 30 embedding rows — that's what must NOT happen)
    from pyspark.sql import DataFrame as SparkDF

    collected_sizes = []
    real_collect = SparkDF.collect

    def spy(self):
        rows = real_collect(self)
        collected_sizes.append(len(rows))
        return rows

    SparkDF.collect = spy
    try:
        out = dd.embedding_near_dup_fast(emb, tau=0.95, max_broadcast_bytes=64)
        pdf = out.toPandas()
    finally:
        SparkDF.collect = real_collect
    assert max(collected_sizes, default=0) <= 1, (
        f"distributed rung gathered rows to the driver: {collected_sizes}"
    )

    assert len(pdf) > 0
    assert set(pdf.columns) == {"vec_a", "vec_b", "sim"}
    # exact precision: verify every emitted pair against brute-force cosine
    import numpy as np

    mat = {i: np.asarray(v, dtype=np.float64) for i, v in rows}
    for r in pdf.itertuples():
        a, b = mat[r.vec_a], mat[r.vec_b]
        sim = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert sim >= 0.95 and abs(sim - r.sim) < 1e-5 and r.vec_a < r.vec_b


def test_near_dup_mixed_dim_fails_loudly_before_any_kernel(spark):
    """ADVICE r3: a mixed-dimension embeddings table must raise a clear error
    up front on every vectorized rung, not crash inside np.vstack."""
    from photo_vector_search_spark.operators.dedup import (
        embedding_near_dup_fast,
        srp_lsh_near_dup_pairs,
        srp_lsh_near_dup_sql,
    )

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0, 0.5])],
        "vec_id long, embedding array<float>",
    )
    for op in (embedding_near_dup_fast, srp_lsh_near_dup_pairs):
        with pytest.raises(ValueError, match="single embedding dimension"):
            op(emb, tau=0.4)
    with pytest.raises(ValueError, match="single embedding dimension"):
        srp_lsh_near_dup_sql(emb, tau=0.4).count()


def test_search_dimension_mismatch_fails_loudly(spark, tmp_path, capsys):
    """A store indexed at a different dim than the query model must error, not
    silently return zero results (zip_with NULL-padding swallowed it before)."""
    from photo_vector_search_spark.cli import main

    store = str(tmp_path / "store8")
    spark.createDataFrame(
        [("p1.jpg", "default", "", [1.0] * 8)],
        "photo_path string, aspect_name string, description string, embedding array<float>",
    ).write.parquet(store)
    with pytest.raises(SystemExit) as e:
        main(["search-photos-by-text", "--query", "x", "--store", store])
    assert e.value.code == 2
    assert "dimension mismatch" in capsys.readouterr().err


def test_search_mixed_dim_store_fails_loudly(spark, tmp_path, capsys):
    """A store holding TWO embedding dims (indexed under different models) must
    error even when the first row happens to match the query dim — otherwise
    every other-dim row silently drops out of results."""
    from photo_vector_search_spark.cli import main

    store = str(tmp_path / "store_mixed")
    rows = [("a.jpg", "default", "", [1.0] * 64), ("b.jpg", "default", "", [1.0] * 8)]
    spark.createDataFrame(
        rows,
        "photo_path string, aspect_name string, description string, embedding array<float>",
    ).write.parquet(store)
    with pytest.raises(SystemExit) as e:
        main(["search-photos-by-text", "--query", "x", "--store", store])
    assert e.value.code == 2
    err = capsys.readouterr().err
    assert "dimension mismatch" in err and "8-64" in err


def test_search_tiebreak_is_total_ordered(spark, tmp_path, capsys):
    """Aspects of one photo share the stub embedding (content-keyed), so their
    distances tie exactly; the printed top-k must be deterministic via the
    (dist, photo_path, aspect_name) sort."""
    from photo_vector_search_spark.cli import main

    store = str(tmp_path / "store_ties")
    photos = tmp_path / "photos"
    photos.mkdir()
    (photos / "one.jpg").write_bytes(b"IMAGE:one")
    main(["index-photos", "--photo-dir", str(photos), "--store", store])
    for asp in ("z-aspect", "a-aspect", "m-aspect"):
        main(["add-aspect", "--photo", str(photos / "one.jpg"), "--aspect", asp,
              "--prompt", "p", "--store", store])
    capsys.readouterr()
    outs = []
    for _ in range(3):
        main(["search-photos-by-text", "--query", "anything", "--store", store, "-k", "2"])
        outs.append(capsys.readouterr().out)
    assert outs[0] == outs[1] == outs[2]
    # ties broken by aspect_name ascending
    assert "[aspect=a-aspect]" in outs[0].splitlines()[0]


def test_search_accepts_model_flag(spark, tmp_path, capsys):
    from photo_vector_search_spark.cli import main

    photos = tmp_path / "ph"
    photos.mkdir()
    (photos / "x.jpg").write_bytes(b"IMAGE:x")
    store = str(tmp_path / "store_m")
    main(["index-photos", "--photo-dir", str(photos), "--store", store])
    capsys.readouterr()
    assert main(["search-photos-by-text", "--query", "q", "--store", store,
                 "--model", "stub-hash-projection"]) == 0
    assert "distance=" in capsys.readouterr().out
    with pytest.raises(SystemExit) as e:
        main(["search-photos-by-text", "--query", "q", "--store", store,
              "--model", "no-such-model"])
    assert e.value.code == 2
