"""Learned language ID: held-out accuracy on a synthetic multilingual corpus
with distinct character distributions, char-n-gram parity with a Python
reference, passthrough/NULL contracts, and label-mapping determinism.

(The fixture documents share ONE vocabulary across their `lang` labels —
labels are independent of text there, so accuracy is asserted on corpora
where the signal exists, like the quality classifier's seed-vs-cipher
split.)"""

from __future__ import annotations

import numpy as np

from photo_vector_search_spark.pipelines.langid import (
    char_ngrams,
    predict_lang,
    train_langid,
)

# four synthetic "languages" with disjoint character inventories
_ALPHABETS = {
    "aa": "abcdefghij",
    "bb": "klmnopqrst",
    "cc": "uvwxyzàéîö",
    "dd": "бвгдежзикл",
}


def _corpus(seed: int, n_per_lang: int = 60):
    rng = np.random.RandomState(seed)
    rows = []
    i = 0
    for lang, alpha in _ALPHABETS.items():
        chars = list(alpha)
        for _ in range(n_per_lang):
            words = [
                "".join(rng.choice(chars, rng.randint(3, 9)))
                for _ in range(rng.randint(8, 20))
            ]
            rows.append((i, " ".join(words), lang))
            i += 1
    return rows


def test_heldout_accuracy_and_confidence(spark):
    train_rows = _corpus(1)
    test_rows = _corpus(2)
    train = spark.createDataFrame(train_rows, "doc_id long, text string, lang string")
    test = spark.createDataFrame(test_rows, "doc_id long, text string, lang string")
    model = train_langid(train, max_iter=40)
    out = predict_lang(test, model).collect()
    acc = sum(1 for r in out if r["lang_pred"] == r["lang"]) / len(out)
    assert acc >= 0.95, acc
    # confident on clean single-script text
    assert float(np.mean([r["lang_conf"] for r in out])) > 0.8
    # passthrough: every input column survives, plus exactly the two outputs
    assert set(out[0].asDict()) == {"doc_id", "text", "lang", "lang_pred", "lang_conf"}


def test_char_ngrams_match_python_reference(spark):
    texts = [
        "Hello  World",
        "ab",
        "",
        None,
        "añ é",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {
        r["i"]: r["g"]
        for r in df.select("i", char_ngrams("t", 3).alias("g")).collect()
    }

    def ref(t):
        if t is None:
            return []
        import re

        s = re.sub(r"\s+", " ", t.strip().lower())
        return [s[i : i + 3] for i in range(max(len(s) - 2, 0))]

    for i, t in enumerate(texts):
        assert got[i] == ref(t), (t, got[i], ref(t))


def test_null_text_and_label_contracts(spark):
    rows = _corpus(3, n_per_lang=30)
    train = spark.createDataFrame(
        rows + [(9999, "dropme", None)], "doc_id long, text string, lang string"
    )
    model = train_langid(train, max_iter=20)  # NULL label row must not break fit
    probe = spark.createDataFrame(
        [(1, None, "x"), (2, "", "y")], "doc_id long, text string, meta string"
    )
    out = {r["doc_id"]: r for r in predict_lang(probe, model).collect()}
    # NULL/empty text still get a (intercept-driven) prediction, row survives
    assert out[1]["lang_pred"] in _ALPHABETS and out[2]["lang_pred"] in _ALPHABETS
    assert out[1]["meta"] == "x"


def test_label_mapping_alphabetical_and_deterministic(spark):
    rows = _corpus(4, n_per_lang=30)
    train = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    m1 = train_langid(train, max_iter=10)
    m2 = train_langid(train.repartition(7), max_iter=10)
    assert list(m1.stages[0].labels) == sorted(_ALPHABETS)
    assert list(m2.stages[0].labels) == list(m1.stages[0].labels)
    # same-model scoring is exactly deterministic
    probe = spark.createDataFrame(rows[:40], "doc_id long, text string, lang string")
    a = {r["doc_id"]: (r["lang_pred"], r["lang_conf"]) for r in predict_lang(probe, m1).collect()}
    b = {r["doc_id"]: (r["lang_pred"], r["lang_conf"]) for r in predict_lang(probe.repartition(5), m1).collect()}
    assert a == b
