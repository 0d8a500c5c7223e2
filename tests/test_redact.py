"""PII redaction: Spark result must equal DuckDB running the IDENTICAL rule
constants (redact._rules) — the same value-level cross-engine discipline as the
declared oracle surface, on a synthetic corpus because the fixture documents
are PII-free word salad."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from photo_vector_search_spark.functions.redact import (
    PII_RULES,
    pii_count_sql,
    pii_counts,
    redact_pii,
    redact_pii_sql,
)

CORPUS = [
    (0, "contact jane.doe+spam@example-mail.co.uk or bob@host.io today"),
    (1, "server at 192.168.0.1 and 10.0.0.255, not version 1.2.3"),
    (2, "ssn 123-45-6789 leaked; call 555-867-5309 or +1 555 867 5309"),
    (3, "dots 555.867.5309 and spaces 555 867 5309 both match"),
    (4, "no pii here, just words and numbers 42 17 2026"),
    (5, "edge: a@b.co min-email; 999.999.999.999 still ip-shaped"),
    (6, ""),
    (7, None),
    # overlap: the email rule consumes the phone-shaped local part FIRST, so
    # the audit must report one email replacement and zero phone replacements
    (8, "reach 555-123-4567@example.com today"),
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        con.register("corpus", pd.DataFrame(CORPUS, columns=["doc_id", "text"]))
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _spark_corpus(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_redact_pii_matches_duckdb_twin(spark):
    got = (
        _spark_corpus(spark)
        .select("doc_id", redact_pii(F.col("text")).alias("clean"))
        .orderBy("doc_id")
        .collect()
    )
    want = _duck(
        f"SELECT doc_id, {redact_pii_sql('text')} AS clean "
        "FROM corpus ORDER BY doc_id"
    )
    for r, (_, w) in zip(got, want.iterrows()):
        assert r["clean"] == (None if pd.isna(w["clean"]) else w["clean"]), r["doc_id"]
    # and the redaction actually fired: no raw PII survives in non-null rows
    joined = " ".join(r["clean"] for r in got if r["clean"])
    for needle in ("@example", "192.168", "123-45-6789", "867-5309", "867 5309"):
        assert needle not in joined
    for token in ("<EMAIL>", "<IP>", "<SSN>", "<PHONE>"):
        assert token in joined


def test_pii_counts_match_duckdb_twin(spark):
    kinds = [k for k, _, _ in PII_RULES]
    got = (
        _spark_corpus(spark)
        .select("doc_id", *pii_counts(F.col("text")))
        .orderBy("doc_id")
        .collect()
    )
    duck_cols = ", ".join(f"{pii_count_sql('text', k)} AS n_{k}" for k in kinds)
    want = _duck(f"SELECT doc_id, {duck_cols} FROM corpus ORDER BY doc_id")
    for r, (_, w) in zip(got, want.iterrows()):
        for k in kinds:
            wv = w[f"n_{k}"]
            assert r[f"n_{k}"] == (None if pd.isna(wv) else int(wv)), (
                r["doc_id"],
                k,
            )
    # the corpus exercises every kind at least once
    totals = {
        k: sum(r[f"n_{k}"] or 0 for r in got) for k in kinds
    }
    assert all(v > 0 for v in totals.values()), totals
    # counts reconcile with redact_pii: the overlap doc is ONE email
    # replacement, not an email AND a phone (progressive-count contract)
    by_id = {r["doc_id"]: r for r in got}
    assert by_id[8]["n_email"] == 1 and by_id[8]["n_phone"] == 0


def test_redact_kind_subset_and_order_independence(spark):
    df = _spark_corpus(spark)
    only_email = df.select(
        redact_pii(F.col("text"), kinds=("email",)).alias("c")
    ).collect()
    joined = " ".join(r["c"] for r in only_email if r["c"])
    assert "<EMAIL>" in joined and "<IP>" not in joined and "192.168.0.1" in joined
    # caller-supplied kind order must not change the applied rule order
    a = df.select(redact_pii(F.col("text"), kinds=("phone", "ip")).alias("c")).collect()
    b = df.select(redact_pii(F.col("text"), kinds=("ip", "phone")).alias("c")).collect()
    assert [r["c"] for r in a] == [r["c"] for r in b]


def test_redact_unknown_kind_raises(spark):
    with pytest.raises(ValueError, match="unknown PII kinds"):
        redact_pii(F.lit("x"), kinds=("email", "iban"))
    with pytest.raises(ValueError, match="unknown PII kind"):
        pii_count_sql("text", "iban")
