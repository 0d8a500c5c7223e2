"""End-to-end curation pipeline: stage counts monotone, each stage's invariant
verified independently on the output, export round-trips."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from photo_vector_search_spark.functions.redact import redact_pii
from photo_vector_search_spark.functions.text import doc_fingerprint, gopher_flags
from photo_vector_search_spark.operators.dedup import minhash_lsh_pairs
from photo_vector_search_spark.pipelines.curation import curate_corpus
from photo_vector_search_spark.sources.jsonl import read_jsonl_shards
from photo_vector_search_spark.sources.tables import load_table


def test_curate_corpus_end_to_end(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    tmp = tempfile.mkdtemp(prefix="pvs_curate_")
    try:
        curated, stats = curate_corpus(
            docs, export_path=f"{tmp}/shards", n_shards=4
        )
        # survivor counts monotone, pipeline non-degenerate on the fixture
        order = [
            "input",
            "after_quality_gate",
            "after_exact_dedup",
            "after_boilerplate",
            "after_near_dedup",
        ]
        vals = [stats[k] for k in order]
        assert vals == sorted(vals, reverse=True)
        assert 0 < stats["after_near_dedup"] < stats["input"]

        rows = curated.select("doc_id", "text", "pos").collect()
        assert len(rows) == stats["after_near_dedup"]
        assert sorted(r["pos"] for r in rows) == list(range(len(rows)))

        # stage invariants, verified independently on the survivors:
        # 1. every survivor passes the quality gate on its redacted pre-boiler text
        survivor_ids = {r["doc_id"] for r in rows}
        gate = {
            r["doc_id"]: r["gopher_pass"]
            for r in docs.withColumn("text", redact_pii(F.col("text")))
            .select("doc_id", *gopher_flags(F.col("text")))
            .collect()
        }
        assert all(gate[d] for d in survivor_ids)
        # 2. exact dedup kept one canonical per fingerprint group
        fps = (
            curated.select(doc_fingerprint(F.col("text")).alias("fp"))
            .groupBy("fp")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        assert fps == 1
        # 3. no near-dup pair survives among the curated docs
        assert minhash_lsh_pairs(curated.select("doc_id", "text"), tau=0.5).count() == 0

        # export round-trips with the pos column intact
        assert stats["shards_written"] == 4
        back = read_jsonl_shards(
            spark,
            f"{tmp}/shards",
            "doc_id long, source string, text string, pos long",
        )
        assert back.count() == len(rows)
        assert {r["doc_id"] for r in back.select("doc_id").collect()} == survivor_ids
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_curate_corpus_cluster_mode_witness_correct(spark, sf_dir):
    """near_dedup='cluster': survivors are exactly the min-id member of each
    CC component (witness-correct — every removed doc's cluster keeps its
    canonical), and cluster mode never keeps MORE docs than there are
    components."""
    from photo_vector_search_spark.operators.dedup import minhash_lsh_pairs
    from photo_vector_search_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    curated, stats = curate_corpus(docs, near_dedup="cluster")
    survivors = {r["doc_id"] for r in curated.select("doc_id").collect()}

    # structural contract, checked against an independent CC over the pair
    # graph of the raw corpus (a SUPERSET of the deboiled-stage graph):
    pairs = minhash_lsh_pairs(
        docs.select("doc_id", "text"), tau=0.5
    )  # superset graph of the deboiled one
    comp = {
        r["doc_id"]: r["group_id"]
        for r in connected_components(pairs).collect()
    }
    # every survivor that appears in a component is that component's min id
    for d in survivors:
        if d in comp:
            assert d == comp[d] or comp[d] not in survivors
    # no two survivors share a component
    seen = {}
    for d in survivors:
        g = comp.get(d, d)
        assert g not in seen, (d, seen[g])
        seen[g] = d
    import pytest as _pytest

    with _pytest.raises(ValueError, match="greedy"):
        curate_corpus(docs, near_dedup="bogus")


def test_curate_corpus_quality_gate_off(spark, sf_dir):
    """quality_gate=False skips only the Gopher stage: the gate count equals
    the input count, every gated-run survivor also survives the ungated run,
    and docs the gated run dropped ONLY at the gate reappear unless a later
    stage (dedup/boilerplate/near-dup) removes them."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    gated, s_on = curate_corpus(docs)
    ungated, s_off = curate_corpus(docs, quality_gate=False)

    assert s_off["after_quality_gate"] == s_off["input"] == s_on["input"]
    assert s_off["after_near_dedup"] >= s_on["after_near_dedup"]

    on_ids = {r["doc_id"] for r in gated.select("doc_id").collect()}
    off_ids = {r["doc_id"] for r in ungated.select("doc_id").collect()}
    # near-dup pruning keeps the LOWEST id of a pair, and adding back
    # gate-rejected docs can only add pairs whose loser is the larger id —
    # but a re-added doc may itself displace a gated survivor as canonical,
    # so assert the count relation plus ungated ⊇ the docs that survive when
    # no gate-rejected doc outranks them: the pos column is dense either way
    assert len(off_ids) == s_off["after_near_dedup"]
    assert len(on_ids) == s_on["after_near_dedup"]
    for df, n in ((gated, len(on_ids)), (ungated, len(off_ids))):
        poss = [r["pos"] for r in df.select("pos").collect()]
        assert sorted(poss) == list(range(n))


def test_curate_corpus_substring_stage(spark, sf_dir):
    """substring_ngram=N appends span removal after near-dup: survivors'
    DOC SET is unchanged (no docs dropped, only spans), the stage output
    equals running the operator standalone on the near-dup survivors, and
    the shuffle still assigns a dense pos permutation."""
    from photo_vector_search_spark.operators.substring import (
        remove_repeated_ngrams,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base, s_base = curate_corpus(docs)
    cur, s = curate_corpus(docs, substring_ngram=5)

    assert s["after_substring"] == s["after_near_dedup"] == s_base["after_near_dedup"]
    base_rows = {r["doc_id"]: r["text"] for r in base.select("doc_id", "text").collect()}
    got = {r["doc_id"]: r["text"] for r in cur.select("doc_id", "text").collect()}
    assert set(got) == set(base_rows)

    # standalone operator on the near-dup survivors gives the same texts
    survivors = spark.createDataFrame(
        [(d, t) for d, t in base_rows.items()], "doc_id long, text string"
    )
    want = {
        r["doc_id"]: r["text_deduped"]
        for r in remove_repeated_ngrams(survivors, n=5).collect()
    }
    assert got == want
    assert any(got[d] != base_rows[d] for d in got)  # it actually removed spans

    poss = sorted(r["pos"] for r in cur.select("pos").collect())
    assert poss == list(range(len(got)))


def test_curate_corpus_learned_quality_stage(spark, sf_dir):
    """quality_model=... inserts score+Pareto-keep after the rule gate:
    survivors are a deterministic subset, the stage count is recorded, the
    transient score column is dropped, and the downstream stages run on the
    reduced corpus."""
    from pyspark.sql import functions as F

    from photo_vector_search_spark.pipelines.quality import train_quality_classifier

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    model = train_quality_classifier(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1).withColumn(
            "text",
            F.translate(
                F.col("text"), "abcdefghijklmnopqrstuvwxyz", "zyxwvutsrqponmlkjihgfedcba"
            ),
        ),
    )
    # a corpus whose last third is ciphered junk; quality_gate=False so the
    # LEARNED stage is the only quality filter in the run (the rule gate
    # would otherwise already reject the ciphered docs and the learned
    # stage would correctly drop ~nothing)
    n = docs.count()
    mixed = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 2,
            F.translate(
                F.col("text"), "abcdefghijklmnopqrstuvwxyz", "zyxwvutsrqponmlkjihgfedcba"
            ),
        ).otherwise(F.col("text")),
    )
    cur, s = curate_corpus(mixed, quality_model=model, quality_gate=False)
    assert 0 < s["after_learned_quality"] < s["after_quality_gate"] == n
    # the ciphered third is (almost) gone, the clean docs mostly survive
    kept = {r["doc_id"] for r in cur.select("doc_id").collect()}
    junk_kept = sum(1 for d in kept if d % 3 == 2)
    assert junk_kept < n / 3 * 0.05
    assert s["after_learned_quality"] > n * 0.4
    assert "quality_score" not in cur.columns

    # deterministic: same model + seed under different partitioning
    cur2, s2 = curate_corpus(mixed.repartition(17), quality_model=model, quality_gate=False)
    assert s2["after_learned_quality"] == s["after_learned_quality"]
    b = {r["doc_id"] for r in cur2.select("doc_id").collect()}
    assert kept == b


def test_curate_corpus_bpe_terminal_stage(spark, sf_dir):
    """bpe_model appends input_ids after the shuffle; exported JSONL shards
    carry the ids, and reading them back matches a direct encode_bpe of the
    curated text exactly (the tokenized-shards round trip)."""
    from photo_vector_search_spark.operators.bpe import encode_bpe, train_bpe_model

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    model = train_bpe_model(docs, n_merges=30, min_count=2)
    tmp = tempfile.mkdtemp(prefix="pvs_curate_bpe_")
    try:
        curated, stats = curate_corpus(
            docs, bpe_model=model, export_path=f"{tmp}/shards", n_shards=3
        )
        rows = curated.select("doc_id", "text", "input_ids", "pos").collect()
        assert stats["bpe_total_tokens"] == sum(len(r["input_ids"]) for r in rows)
        assert stats["bpe_total_tokens"] > 0

        back = read_jsonl_shards(
            spark,
            f"{tmp}/shards",
            "doc_id long, text string, input_ids array<int>, pos long",
        )
        got = {r["doc_id"]: list(r["input_ids"]) for r in back.collect()}
        # direct encode of the curated text must agree id-for-id
        merges, vocab = model
        want = {
            r["doc_id"]: list(r["input_ids"])
            for r in encode_bpe(
                curated.select("doc_id", "text"), merges, vocab
            ).collect()
        }
        assert got == want
        assert len(got) == len(rows)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_curate_corpus_dsir_stage(spark, sf_dir):
    """dsir_target + dsir_keep select exactly n_keep docs right after the
    quality tiers, deterministically; downstream stages see only the kept
    pool; the transient score columns are dropped; half-passed params raise
    at entry."""
    import pytest
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    curated, stats = curate_corpus(
        docs,
        quality_gate=False,
        dsir_target=F.col("source") == "src0",
        dsir_keep=40,
        dsir_seed=3,
    )
    assert stats["after_dsir"] == 40
    assert stats["after_exact_dedup"] <= 40
    cols = set(curated.columns)
    assert "dsir_score" not in cols and "n_feats" not in cols
    # deterministic under re-run
    curated2, stats2 = curate_corpus(
        docs,
        quality_gate=False,
        dsir_target=F.col("source") == "src0",
        dsir_keep=40,
        dsir_seed=3,
    )
    a = {r["doc_id"] for r in curated.select("doc_id").collect()}
    b = {r["doc_id"] for r in curated2.select("doc_id").collect()}
    assert a == b and len(a) > 0
    with pytest.raises(ValueError, match="together"):
        curate_corpus(docs, dsir_keep=10)
    with pytest.raises(ValueError, match="together"):
        curate_corpus(docs, dsir_target=F.lit(True))


def test_curate_corpus_all_stages_integration(spark, sf_dir, tmp_path):
    """Every opt-in stage ON in one run — rule gate, learned quality, DSIR
    selection, exact/near dedup, boilerplate, substring spans, shuffle, BPE
    encode, JSONL export — composes without column collisions; stage counts
    are monotone non-increasing through the filters; the export round-trips."""
    from pyspark.sql import functions as F

    from photo_vector_search_spark.operators.bpe import train_bpe_model
    from photo_vector_search_spark.pipelines.quality import (
        train_quality_classifier,
    )
    from photo_vector_search_spark.sources.jsonl import read_jsonl_shards

    from photo_vector_search_spark.pipelines.langid import train_langid

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    li_model = train_langid(
        load_table(spark, sf_dir, "documents"), max_iter=5
    )
    li_langs = tuple(li_model.stages[0].labels)  # keep every label: the
    # fixture's lang column is text-independent, so this exercises the
    # stage's plumbing (predict -> filter -> drop transients) without
    # arbitrarily cutting the pool the later stage assertions rely on
    q_model = train_quality_classifier(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1).withColumn(
            "text",
            F.translate(
                F.col("text"),
                "abcdefghijklmnopqrstuvwxyz",
                "zyxwvutsrqponmlkjihgfedcba",
            ),
        ),
        max_iter=10,
    )
    bpe_model = train_bpe_model(docs, n_merges=30, min_count=1)
    curated, stats = curate_corpus(
        docs,
        langid_model=li_model,
        langid_keep=li_langs,
        quality_model=q_model,
        pareto_alpha=9.0,
        dsir_target=F.col("source") == "src0",
        dsir_keep=60,
        substring_ngram=8,
        bpe_model=bpe_model,
        export_path=str(tmp_path / "shards"),
        n_shards=2,
    )
    # filter stages only shrink the pool
    order = [
        "input",
        "after_langid",
        "after_quality_gate",
        "after_learned_quality",
        "after_dsir",
        "after_exact_dedup",
        "after_boilerplate",
        "after_near_dedup",
        "after_substring",
    ]
    assert all(k in stats for k in order), stats
    for a, b in zip(order, order[1:]):
        if b == "after_substring":
            continue  # span removal rewrites text, never drops docs
        assert stats[b] <= stats[a], (a, b, stats)
    assert stats["after_dsir"] == 60
    assert stats["after_substring"] == stats["after_near_dedup"]
    assert stats["bpe_total_tokens"] > 0 and stats["shards_written"] == 2

    rows = curated.select("doc_id", "pos", "input_ids").collect()
    assert len(rows) == stats["after_substring"]
    assert sorted(r["pos"] for r in rows) == list(range(len(rows)))
    back = read_jsonl_shards(
        spark,
        str(tmp_path / "shards"),
        "doc_id long, text string, input_ids array<int>, pos long",
    )
    assert back.count() == len(rows)


def test_curate_corpus_ppl_filter_stage(spark, sf_dir):
    """ppl_lm drops the tail tertile and unscored docs right after the
    quality tiers: garbage rides into the tail under a fluent-corpus LM,
    survivors are a strict subset, the transient nll/bucket columns are
    gone, and the stage composes with the rest of the pipeline."""
    from photo_vector_search_spark.plans.text_queries import train_bigram_lm

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    garbage = spark.createDataFrame(
        [(10_000 + i, " ".join(f"zz{i}q{j}" for j in range(30)))
         for i in range(12)],
        "doc_id long, text string",
    )
    docs = base.unionByName(garbage)
    lm = train_bigram_lm(base)  # clean-corpus LM, CCNet-style
    curated, stats = curate_corpus(
        docs, quality_gate=False, ppl_lm=lm, ppl_by=None
    )
    assert "after_ppl_filter" in stats
    assert stats["after_ppl_filter"] < stats["input"]
    kept = {r["doc_id"] for r in curated.select("doc_id").collect()}
    # the planted garbage is the worst-scoring slice -> all in the dropped tail
    assert not (kept & {10_000 + i for i in range(12)})
    assert len(kept) > 0
    cols = set(curated.columns)
    assert "nll" not in cols and "bucket" not in cols


def test_curate_corpus_langid_stage(spark):
    """langid_model + langid_keep filter to the target languages FIRST
    (CCNet order): off-language docs are gone before any later stage, the
    transient lang_pred/lang_conf columns are dropped, min_conf tightens
    the keep, and the half-specified call raises before any stage runs."""
    import numpy as np
    import pytest

    from photo_vector_search_spark.pipelines.langid import train_langid

    alphabets = {
        "aa": "abcdefghij",
        "bb": "klmnopqrst",
        "cc": "uvwxyzabcd",
    }
    rng = np.random.RandomState(5)
    rows, i = [], 0
    for lang, alpha in alphabets.items():
        chars = list(alpha)
        for _ in range(40):
            words = [
                "".join(rng.choice(chars, rng.randint(3, 9)))
                for _ in range(rng.randint(10, 20))
            ]
            rows.append((i, " ".join(words), lang))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    model = train_langid(docs, max_iter=30)

    curated, stats = curate_corpus(
        docs,
        quality_gate=False,
        langid_model=model,
        langid_keep=("aa", "bb"),
        compute_stats=True,
    )
    assert "after_langid" in stats and stats["after_langid"] < stats["input"]
    kept = {r["doc_id"]: r["lang"] for r in curated.select("doc_id", "lang").collect()}
    # cc has a disjoint-enough alphabet that no cc doc should survive
    assert set(kept.values()) <= {"aa", "bb"}, set(kept.values())
    assert len(kept) > 0
    assert {"lang_pred", "lang_conf"}.isdisjoint(curated.columns)

    # an (unreachably) high confidence floor empties the keep
    _, s2 = curate_corpus(
        docs,
        quality_gate=False,
        langid_model=model,
        langid_keep=("aa", "bb"),
        langid_min_conf=1.1,
        compute_stats=True,
    )
    assert s2["after_langid"] == 0

    with pytest.raises(ValueError, match="langid_model and langid_keep"):
        curate_corpus(docs, langid_model=model)
    with pytest.raises(ValueError, match="non-empty"):
        curate_corpus(docs, langid_model=model, langid_keep=())


def test_curate_corpus_denoising_terminal_stage(spark, sf_dir):
    """pack_context_len + corrupt_rate turn the tokenized corpus into a
    T5-style denoising dataset: windows reconstruct exactly from the
    exported (inputs, targets) pairs, the export round-trips through JSONL,
    and the option contracts raise at entry."""
    import pytest

    from photo_vector_search_spark.operators.bpe import train_bpe_model
    from photo_vector_search_spark.operators.corruption import (
        reconstruct_spans,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    model = train_bpe_model(docs, n_merges=30, min_count=2)
    L, SENT = 128, 32_000
    tmp = tempfile.mkdtemp(prefix="pvs_curate_denoise_")
    try:
        # pack-only run: the ground-truth windows (same seeds => same corpus)
        windows, wstats = curate_corpus(
            docs, bpe_model=model, pack_context_len=L, pack_eos_id=0
        )
        want = {r["seq_id"]: list(r["input_ids"]) for r in windows.collect()}
        assert wstats["packed_windows"] == len(want) > 0
        assert all(len(v) == L for v in want.values())

        corrupted, cstats = curate_corpus(
            docs,
            bpe_model=model,
            pack_context_len=L,
            pack_eos_id=0,
            corrupt_rate=0.15,
            corrupt_sentinel_start=SENT,
            export_path=f"{tmp}/shards",
            n_shards=3,
        )
        assert cstats["packed_windows"] == len(want)
        assert cstats["shards_written"] >= 1
        back = read_jsonl_shards(
            spark,
            f"{tmp}/shards",
            "seq_id long, inputs array<int>, targets array<int>, "
            "n_noise_tokens int, n_tokens int, n_docs long",
        )
        got = {
            r["seq_id"]: (list(r["inputs"]), list(r["targets"]), r["n_noise_tokens"])
            for r in back.collect()
        }
        assert set(got) == set(want)
        for sid, (inp, tgt, noise) in got.items():
            # lossless: reconstruct(corrupt(w)) == w, via the EXPORTED rows
            assert reconstruct_spans(inp, tgt, SENT) == want[sid], sid
            # sentinels descend from SENT; real ids here are far below
            assert noise == sum(1 for t in tgt if t < SENT - 1000)
        # some corruption actually happened
        assert sum(n for _, _, n in got.values()) > 0

        with pytest.raises(ValueError, match="requires bpe_model"):
            curate_corpus(docs, pack_context_len=L)
        with pytest.raises(ValueError, match="requires pack_context_len"):
            curate_corpus(docs, bpe_model=model, corrupt_rate=0.15)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_curate_corpus_decontamination_stage(spark, sf_dir):
    """decon_benchmark=... inserts span decontamination before exact dedup:
    docs wholly contained in the benchmark vanish (full n-gram coverage
    leaves no fragments), untouched docs keep their text verbatim, and the
    stage stats are recorded."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base, s_base = curate_corpus(docs)
    base_rows = {
        r["doc_id"]: r["text"] for r in base.select("doc_id", "text").collect()
    }
    # benchmark = three full documents that survive the base pipeline
    bench_ids = sorted(base_rows)[:3]
    bench = spark.createDataFrame(
        [(i, base_rows[i]) for i in bench_ids], "doc_id long, text string"
    )

    cur, s = curate_corpus(docs, decon_benchmark=bench)
    got = {r["doc_id"]: r["text"] for r in cur.select("doc_id", "text").collect()}

    assert "decon_rewritten" in s and "after_decontaminate" in s
    assert s["after_decontaminate"] <= s_base["after_quality_gate"]
    # the benchmark members are fully covered by their own 13-grams -> gone
    assert not (set(bench_ids) & set(got))
    # survivors are a subset of the base survivor set, texts verbatim or
    # rewritten-shorter (token count can only shrink)
    assert set(got) <= set(base_rows)
    assert any(got[d] == base_rows[d] for d in got)
    assert all(
        len(got[d].split()) <= len(base_rows[d].split()) for d in got
    )


def test_curate_corpus_kn_ppl_stage(spark, sf_dir):
    """kn_lm keeps the most-fluent kn_keep_frac under the Kneser-Ney LM:
    planted gibberish lands past the cutoff, survivors are a subset, and
    the stage composes after the add-k tier without column residue."""
    from photo_vector_search_spark.operators.kneser_ney import train_kn_lm

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    garbage = spark.createDataFrame(
        [(20_000 + i, " ".join(f"qx{i}v{j}" for j in range(30)))
         for i in range(10)],
        "doc_id long, text string",
    )
    docs = base.unionByName(garbage)
    lm = train_kn_lm(base)  # clean-corpus LM, the CCNet setup
    curated, stats = curate_corpus(
        docs, quality_gate=False, kn_lm=lm, kn_keep_frac=0.6, kn_exact=True
    )
    assert "after_kn_ppl" in stats
    assert stats["after_kn_ppl"] < stats["input"]
    kept = {r["doc_id"] for r in curated.select("doc_id").collect()}
    assert not (kept & {20_000 + i for i in range(10)})
    assert len(kept) > 0
    assert "nll" not in set(curated.columns)


def test_curate_corpus_prototype_prune_stage(spark, sf_dir):
    """prototype_keep_frac prunes per-cluster under the Sorscher difficulty
    metric over stub embeddings: the survivor count matches the quota sum
    of a standalone prune over the same pre-stage survivors, and the stage
    leaves no lineage columns on the curated output."""
    from photo_vector_search_spark.operators.pruning import prune_prototypes
    from photo_vector_search_spark.pipelines.embed import embed_documents

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base, _ = curate_corpus(docs, quality_gate=False)
    curated, stats = curate_corpus(
        docs,
        quality_gate=False,
        prototype_keep_frac=0.5,
        prototype_clusters=4,
    )
    assert "after_prototype_prune" in stats
    kept = {r["doc_id"] for r in curated.select("doc_id").collect()}

    # standalone replay over the same pre-stage survivor set
    emb = embed_documents(base.select("doc_id", "text")).select(
        "doc_id", "embedding"
    )
    want = {
        r["doc_id"]
        for r in prune_prototypes(
            emb, keep_frac=0.5, n_clusters=4, id_col="doc_id"
        ).collect()
    }
    assert kept == want
    assert stats["after_prototype_prune"] == len(want)
    cols = set(curated.columns)
    assert not {"cluster_id", "difficulty", "rank", "embedding"} & cols


def test_curate_corpus_compression_gate_stage(spark, sf_dir):
    """compression_bounds drops incompressible noise and token floods right
    after the rule gate; the fixture prose passes a wide bracket."""
    import base64
    import hashlib

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    noise = base64.b64encode(
        b"".join(hashlib.sha256(bytes([i])).digest() for i in range(40))
    ).decode()  # high-entropy, non-repeating: zlib ratio ~0.77
    planted = spark.createDataFrame(
        [(30_000, "word " * 200),  # floods compress ~nothing-left (~0.02)
         (30_001, noise)],
        "doc_id long, text string",
    )
    docs = base.unionByName(planted)
    curated, stats = curate_corpus(
        docs, quality_gate=False, compression_bounds=(0.12, 0.7)
    )
    assert "after_compression_gate" in stats
    kept = {r["doc_id"] for r in curated.select("doc_id").collect()}
    assert 30_000 not in kept and 30_001 not in kept
    assert len(kept) > 0
    assert "zlib_ratio" not in curated.columns


def test_curate_corpus_budget_select_stage(spark, sf_dir):
    """budget_tokens is the terminal pre-shuffle cut: survivors fit the
    budget, form the most-fluent (lowest-KN-nll) prefix of the no-budget
    run's survivors, and the stage requires a ranking LM."""
    from photo_vector_search_spark.functions.text import token_count
    from photo_vector_search_spark.operators.kneser_ney import (
        doc_log_perplexity_kn,
        train_kn_lm,
    )
    from photo_vector_search_spark.operators.selection import budget_select

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    lm = train_kn_lm(docs)
    budget = 1_500

    # budget-only: kn_keep_frac=None must SKIP the KN filter (short docs
    # survive curation and order last in the budget walk)
    curated, stats = curate_corpus(
        docs, quality_gate=False, kn_lm=lm, kn_keep_frac=None,
        budget_tokens=budget,
    )
    assert "after_kn_ppl" not in stats
    assert "after_budget_select" in stats
    total = curated.agg(
        F.sum(F.coalesce(token_count(F.col("text")), F.lit(0)))
    ).first()[0]
    assert total <= budget
    assert "_budget_nll" not in curated.columns

    # prefix property: replay budget_select over the no-budget run
    base, _ = curate_corpus(
        docs, quality_gate=False, kn_lm=lm, kn_keep_frac=None,
    )
    kn_df, kn_consts = lm
    scored = doc_log_perplexity_kn(base.select("doc_id", "text"), kn_df, kn_consts)
    expected = {
        r["doc_id"]
        for r in budget_select(
            base.select("doc_id", "text").join(
                scored.select("doc_id", F.col("nll").alias("s")), "doc_id", "left"
            ),
            budget,
            score_col="s",
            ascending=True,
        ).collect()
    }
    got = {r["doc_id"] for r in curated.select("doc_id").collect()}
    assert got == expected

    # budget with the KN filter on composes (filter first, then budget)
    both, stats2 = curate_corpus(
        docs, quality_gate=False, kn_lm=lm, kn_keep_frac=0.8,
        budget_tokens=budget,
    )
    assert "after_kn_ppl" in stats2 and "after_budget_select" in stats2
    assert stats2["after_budget_select"] <= stats2["after_kn_ppl"]

    # usage errors are entry-time
    import pytest

    with pytest.raises(ValueError, match="requires kn_lm"):
        curate_corpus(docs, budget_tokens=100)
    with pytest.raises(ValueError, match="budget_tokens must be"):
        curate_corpus(docs, kn_lm=lm, budget_tokens=-1)
