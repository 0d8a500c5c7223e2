"""Fixed-length sequence packing — the terminal transform of an LLM data
pipeline: concatenate the tokenized corpus in a deterministic global order
and re-chunk it into exact ``context_len`` training windows (the GPT-2/
"packed dataset" convention: documents are joined — optionally with an EOS
separator — and windows cross document boundaries, so zero tokens are
wasted to padding).

Spark-first shape, reusing the ``shuffle_corpus`` fixed-bucket discipline:

1. **Per-doc token offsets.** Each doc needs its global token offset
   ``o_i = sum of n_tokens over all docs ordered before it``. A global
   window cumsum would serialize on one task; instead docs are bucketed by
   a PREFIX of the order (``order_col // bucket_width``), per-bucket token
   sums (≤ ``N_BUCKETS`` longs) are collected and cumsum'd on the driver,
   and a within-bucket running sum (one bounded window per bucket) adds the
   local part. Exact, deterministic, one small driver list.
2. **Window assignment.** A doc's tokens occupy global positions
   ``[o_i, o_i + n_i)``; the windows it intersects are
   ``o_i // L .. (o_i + n_i - 1) // L``. Each doc explodes into at most
   ``n_i / L + 1`` (window, slice) pieces — O(total tokens / L) rows
   corpus-wide, each carrying its id slice.
3. **Window rebuild.** groupBy(window) flattens the pieces in order. Each
   group holds exactly ``L`` ids by construction — bounded memory per key —
   and the trailing partial window is dropped (``keep_partial=True`` keeps
   it with its true length; training loaders usually drop it).

Everything is Catalyst (sequence/slice/flatten/window); no UDF, nothing
driver-sized except the ≤4096 bucket sums. Verified against an independent
Python reference (collect → concat → rechunk) and partitioning-invariant
(tests/test_packing.py).

Reference scope note: the reference (photo_vector_search) has no text/token
surface; this extends the mandated LLM-pipeline family (tokenize → shuffle
→ pack → export) to the exact shape a pretraining loader consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_BUCKETS = 4096


def pack_sequences(
    docs: DataFrame,
    context_len: int,
    ids_col: str = "input_ids",
    order_col: str = "doc_id",
    eos_id: int | None = None,
    pad_id: int | None = None,
    n_shards: int = 8,
    overflow: str = "truncate",
    algorithm: str = "nextfit",
    max_open_bins: int = 1024,
) -> DataFrame:
    """Boundary-RESPECTING sequence packing — the SFT/instruction-tuning
    counterpart of ``pack_token_windows``: documents are greedily binned
    into ``context_len``-token sequences but NEVER split across sequences
    (each example's tokens stay contiguous and whole, so per-example loss
    masks and block-diagonal attention stay trivial).

    Rule: deterministic hash-shard on ``order_col`` (the ``assign_packs``
    discipline — partitioning-invariant by construction), then NEXT-FIT in
    ``order_col`` order within each shard: a doc joins the current pack while
    the pack's fill + the doc's effective length (ids + optional EOS) stays
    ≤ ``context_len``, else a new pack opens. Next-fit is genuinely
    sequential (the leftover space at each pack boundary feeds the next
    decision — no prefix-sum decomposition exists, which is exactly why
    ``assign_packs``'s cumsum-div-cap rule can overfill a pack), so the
    scan runs as ONE exchange on the shard key + a sorted-partition Arrow
    pass (``mapInPandas`` with carry-over state across batches, shard
    changes resetting it — NOT a group-materializing ``applyInPandas``):
    peak kernel memory is one Arrow batch plus the open pack, independent
    of shard size, and ``n_shards`` bounds only the sequential chain length
    / parallelism — the 100 TB knob. The rule is still SQL-replayable per
    shard via a recursive CTE — the DuckDB twin in tests/test_packing.py
    replays it, keeping this a declared-surface candidate.

    ``overflow`` controls docs longer than ``context_len``: ``"truncate"``
    keeps the first ``context_len`` ids (EOS, when set, survives as the last
    token), ``"drop"`` removes them, ``"error"`` raises at execution. NULL
    ``ids_col`` rows contribute nothing; empty arrays pack as bare EOS when
    ``eos_id`` is set and vanish otherwise (the ``pack_token_windows``
    NULL-vs-empty contract).

    ``algorithm`` picks the bin rule, both deterministic and
    partitioning-invariant:

    - ``"nextfit"`` (default): one open pack, order-preserving — the
      oracle-replayable rung (O(1) kernel state).
    - ``"ffd"``: first-fit-DECREASING — docs sort by (effective length desc,
      id asc) within the shard and each joins the FIRST open bin it fits,
      the classic density heuristic (≤ 11/9·OPT + 1 bins; next-fit only
      guarantees 2·OPT). Open bins are capped at ``max_open_bins``: past
      the cap the FULLEST bin closes (descending lengths mean later docs
      are smaller, so the emptiest bins stay useful) — bounded memory at
      any shard size, and a closed bin can cost at most its residual slack
      vs unbounded FFD.

    Returns one row per packed sequence: ``(shard, pack_id, input_ids,
    n_tokens, n_docs, doc_ids, seq_lens)`` — ``n_tokens`` the real fill
    before padding, ``seq_lens`` each doc's in-pack token count (EOS
    included) in order, enough to rebuild position ids and block-diagonal
    attention masks; ``pad_id`` pads ``input_ids`` to ``context_len``
    (``None`` leaves ragged sequences); ``pack_id`` numbers packs per shard
    in emission order."""
    if context_len <= 0:
        raise ValueError(f"context_len must be positive, got {context_len}")
    if overflow not in ("truncate", "drop", "error"):
        raise ValueError(
            f"overflow must be truncate|drop|error, got {overflow!r}"
        )
    if algorithm not in ("nextfit", "ffd"):
        raise ValueError(f"algorithm must be nextfit|ffd, got {algorithm!r}")
    if max_open_bins < 1:
        raise ValueError(f"max_open_bins must be >= 1, got {max_open_bins}")
    import pandas as pd

    from photo_vector_search_spark.functions.text import hash32

    L = int(context_len)
    eos = int(eos_id) if eos_id is not None else None
    pad = int(pad_id) if pad_id is not None else None
    ord_type = dict(docs.dtypes)[order_col]

    toks = docs.filter(F.col(ids_col).isNotNull()).select(
        F.col(order_col).alias("_ord"),
        F.col(ids_col).cast("array<int>").alias("_ids"),
        (hash32(F.col(order_col).cast("string")) % n_shards)
        .cast("int")
        .alias("_shard"),
    )
    schema = (
        "shard int, pack_id long, input_ids array<int>, n_tokens int, "
        f"n_docs int, doc_ids array<{ord_type}>, seq_lens array<int>"
    )

    def fn(batches):
        # carry-over state across Arrow batches of the sorted partition:
        # (shard, pack_id counter, open-bin buffers). A shard-key change —
        # shards are contiguous after sortWithinPartitions — flushes and
        # resets. nextfit keeps ONE open bin; ffd keeps ≤ max_open_bins.
        state = {"shard": None, "pack_id": 0}
        bins: list[dict] = []  # each: {"ids": [], "docs": [], "lens": []}
        out = {c: [] for c in (
            "shard", "pack_id", "input_ids", "n_tokens", "n_docs",
            "doc_ids", "seq_lens",
        )}

        def emit(b: dict) -> None:
            fill = len(b["ids"])
            out["shard"].append(state["shard"])
            out["pack_id"].append(state["pack_id"])
            out["input_ids"].append(
                b["ids"] + [pad] * (L - fill) if pad is not None else b["ids"]
            )
            out["n_tokens"].append(fill)
            out["n_docs"].append(len(b["docs"]))
            out["doc_ids"].append(b["docs"])
            out["seq_lens"].append(b["lens"])
            state["pack_id"] += 1

        def flush_all():
            # remaining bins close in creation order — deterministic
            for b in bins:
                if b["docs"]:
                    emit(b)
            bins.clear()

        def drain():
            n = len(out["pack_id"])
            pdf = pd.DataFrame({c: out[c] for c in out})
            for c in out:
                out[c] = []
            return pdf if n else None

        def place(ids: list, ord_v) -> None:
            need = len(ids)
            if algorithm == "nextfit":
                if bins and len(bins[0]["ids"]) + need > L:
                    emit(bins.pop(0))
                if not bins:
                    bins.append({"ids": [], "docs": [], "lens": []})
                b = bins[0]
            else:  # ffd: first OPEN bin it fits, in bin-creation order
                b = next(
                    (x for x in bins if len(x["ids"]) + need <= L), None
                )
                if b is None:
                    b = {"ids": [], "docs": [], "lens": []}
                    bins.append(b)
                    if len(bins) > max_open_bins:
                        # close the FULLEST (ties: oldest) — later docs are
                        # no longer than this one, so roomy bins stay useful
                        full = max(bins, key=lambda x: len(x["ids"]))
                        emit(full)
                        bins.remove(full)
            b["ids"].extend(ids)
            b["docs"].append(ord_v)
            b["lens"].append(need)

        for pdf in batches:
            for shard, ord_v, ids in zip(pdf["_shard"], pdf["_ord"], pdf["_ids"]):
                if shard != state["shard"]:
                    flush_all()
                    state["shard"], state["pack_id"] = shard, 0
                ids = [int(t) for t in ids]
                if eos is not None:
                    ids = ids + [eos]
                if not ids:
                    continue  # empty doc without EOS: nothing to pack
                if len(ids) > L:
                    if overflow == "error":
                        raise ValueError(
                            f"doc {ord_v!r} has {len(ids)} tokens > "
                            f"context_len={L} (overflow='error')"
                        )
                    if overflow == "drop":
                        continue
                    ids = ids[: L - 1] + [eos] if eos is not None else ids[:L]
                place(ids, ord_v)
            drained = drain()
            if drained is not None:
                yield drained
        flush_all()
        tail = drain()
        if tail is not None:
            yield tail

    if algorithm == "ffd":
        # effective length for the DECREASING sort: eos + truncation applied,
        # so the kernel sees genuinely non-increasing needs; ties break by id
        e = F.size("_ids") + (F.lit(1) if eos is not None else F.lit(0))
        sorted_toks = toks.withColumn(
            "_e", F.least(e, F.lit(L))
        ).repartition(n_shards, "_shard").sortWithinPartitions(
            "_shard", F.desc("_e"), "_ord"
        ).drop("_e")
    else:
        sorted_toks = toks.repartition(n_shards, "_shard").sortWithinPartitions(
            "_shard", "_ord"
        )
    return sorted_toks.mapInPandas(fn, schema)


def pack_token_windows(
    docs: DataFrame,
    context_len: int,
    ids_col: str = "input_ids",
    order_col: str = "pos",
    eos_id: int | None = None,
    keep_partial: bool = False,
    stage: bool | None = None,
    staging_dir: str | None = None,
) -> DataFrame:
    """Pack ``docs[ids_col]`` (array<int>, e.g. ``encode_bpe`` output) into
    fixed ``context_len`` windows following the total order of ``order_col``
    (dense or sparse, unique, non-negative — ``shuffle_corpus``'s ``pos`` is
    the intended producer; any unique long works, order = ascending values).

    ``eos_id`` appends one separator token to every doc before packing (the
    GPT-2 convention, so a model can learn document boundaries). NULL or
    empty ``ids_col`` rows contribute nothing (an EOS is still emitted for
    empty — but not NULL — docs: an empty document is a real, separable
    document; NULL means absent).

    Returns ``(seq_id, input_ids, n_tokens, n_docs)``: ``seq_id`` the
    0-based window index in corpus order, ``input_ids`` exactly
    ``context_len`` ids (the final shorter remainder is dropped unless
    ``keep_partial``), ``n_docs`` how many documents contributed tokens to
    the window (packing-density diagnostics).

    The token frame feeds THREE jobs (max-order probe, per-bucket sums, the
    window rebuild); Spark re-executes common subtrees per consumer, so by
    default (``stage=None``) a wide or nondeterministic upstream — the
    intended producers ``shuffle_corpus``/``encode_bpe`` are both wide — is
    staged to parquet once (``operators.staging``) and all three jobs read
    the staged copy, while a bare deterministic scan skips the write
    (re-scanning immutable files IS the staged read — the ``shuffle_corpus``
    auto-mode discipline). ``stage=True``/``False`` overrides."""
    if context_len <= 0:
        raise ValueError(f"context_len must be positive, got {context_len}")
    spark = docs.sparkSession

    ids = F.coalesce(F.col(ids_col), F.array().cast("array<int>"))
    if eos_id is not None:
        ids = F.when(
            F.col(ids_col).isNull(), F.array().cast("array<int>")
        ).otherwise(F.concat(ids, F.array(F.lit(int(eos_id)))))
    toks = docs.select(
        F.col(order_col).alias("_ord"), ids.alias("_ids")
    ).withColumn("_n", F.size("_ids"))

    from photo_vector_search_spark.operators.shuffle import _rescan_safe_and_cheap
    from photo_vector_search_spark.operators.staging import stage_frame

    if stage is None:
        stage = not _rescan_safe_and_cheap(toks)
    if stage:
        toks = stage_frame(toks, "pvs_pack", staging_dir)

    # bucket by an order PREFIX: (bucket, _ord) ascending == _ord ascending,
    # so per-bucket driver offsets + within-bucket running sums are exact
    max_ord = toks.agg(F.max("_ord")).first()[0]
    if max_ord is None:
        return spark.createDataFrame(
            [], "seq_id long, input_ids array<int>, n_tokens int, n_docs long"
        )
    bucket_width = max(int(max_ord) // N_BUCKETS + 1, 1)
    # integer DIV, not float division: exact at any order magnitude
    toks = toks.withColumn("_b", F.expr(f"CAST(_ord DIV {bucket_width} AS INT)"))

    per_bucket = {
        r["_b"]: r["s"]
        for r in toks.groupBy("_b").agg(F.sum("_n").alias("s")).collect()
    }
    offsets, acc = [], 0
    for b in sorted(per_bucket):
        offsets.append((b, acc))
        acc += per_bucket[b]
    off = F.broadcast(spark.createDataFrame(offsets, "_b int, _boff long"))

    w = (
        Window.partitionBy("_b")
        .orderBy("_ord")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = (
        toks.join(off, "_b")
        .withColumn("_o", F.col("_boff") + F.coalesce(F.sum("_n").over(w), F.lit(0)))
        .filter(F.col("_n") > 0)
    )

    L = int(context_len)
    # explode into (window, slice) pieces: windows o//L .. (o+n-1)//L
    # (integer DIV — float division would round near 2^53; DIV is exact)
    pieces = placed.select(
        "_o",
        F.explode(
            F.transform(
                F.sequence(
                    F.expr(f"_o DIV {L}"),
                    F.expr(f"(_o + _n - 1) DIV {L}"),
                ),
                lambda win: F.struct(
                    win.alias("seq_id"),
                    # slice of _ids covering [max(win*L, o), min((win+1)*L, o+n))
                    F.slice(
                        F.col("_ids"),
                        (F.greatest(win * L, F.col("_o")) - F.col("_o") + 1).cast(
                            "int"
                        ),
                        (
                            F.least((win + 1) * L, F.col("_o") + F.col("_n"))
                            - F.greatest(win * L, F.col("_o"))
                        ).cast("int"),
                    ).alias("chunk"),
                ),
            )
        ).alias("p"),
    ).select("_o", F.col("p.seq_id").alias("seq_id"), F.col("p.chunk").alias("chunk"))

    out = (
        pieces.groupBy("seq_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_o"), F.col("chunk")))
                    ),
                    lambda s: s["chunk"],
                )
            ).alias("input_ids"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .withColumn("n_tokens", F.size("input_ids"))
    )
    if not keep_partial:
        out = out.filter(F.col("n_tokens") == L)
    return out.select("seq_id", "input_ids", "n_tokens", "n_docs")
