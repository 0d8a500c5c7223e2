

def test_compression_ratio_matches_direct_zlib(spark):
    """Per-row parity with direct zlib, NULL/empty contracts, and the
    repetitive-compresses-better ordering the gate relies on."""
    import zlib

    from photo_vector_search_spark.pipelines.quality import (
        compression_gate,
        compression_ratio,
    )

    rows = [
        (0, "spam spam spam spam spam spam spam spam spam spam"),
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "qz7#kf9@wm2$xv8&nb4!hj6%rt3^yu5*lp1(od0)se"),
        (3, None),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["zlib_ratio"]
        for r in compression_ratio(df).collect()
    }
    for i, t in rows:
        if t:
            raw = t.encode()
            want = round(len(zlib.compress(raw, 6)) / len(raw), 6)
            assert got[i] == want, i
        else:
            assert got[i] is None, i
    # ordering: repetitive < prose < random noise
    assert got[0] < got[1] < got[2]

    kept = compression_gate(df, min_ratio=got[0] + 1e-6,
                            max_ratio=got[2] - 1e-6)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1]
    assert "zlib_ratio" not in kept.columns

    import pytest

    with pytest.raises(ValueError, match="min_ratio"):
        compression_gate(df, min_ratio=0.9, max_ratio=0.5)

    # partitioning invariance (stateless map — trivially, but pinned)
    many = {
        r["doc_id"]: r["zlib_ratio"]
        for r in compression_ratio(df.repartition(5)).collect()
    }
    assert many == got
