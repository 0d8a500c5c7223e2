"""Batch embedding pipeline — the Spark-native form of the reference's
`index-photos` flow (SURVEY §3.1): scan → preprocess → embed → describe → upsert.

The reference computes one CLIP embedding + one Ollama description per photo,
row-at-a-time in 4 threads (cli.py:54-62, photo_vector_search.py:30-34, 42-82).
Here each stage is an Arrow-batched UDF over partitions; model handles load once
per Python worker (iterator-UDF pattern — the analogue of CLIP loading once per
process in the reference's __init__, photo_vector_search.py:27-28).

Error semantics preserved from the reference:
- embedding failure aborts that row (photo_vector_search.py:102-104) → null
  embedding rows are dropped before the upsert;
- description failure yields '' but the row IS still indexed
  (photo_vector_search.py:80-82) → the describe UDF catches per-row errors to ''.

**Deterministic stub embedder.** CI has no CLIP/Ollama, so the default `Embedder`
is a seeded hash-projection: component j of text t is
    u = hash32(t || ':' || j) / 2^32   (md5-prefix hash, engine-portable)
    e_j = 2u - 1,   then L2-normalize.
The same formula exists as a SQL column expression (``stub_embedding_expr``) and
as DuckDB oracle SQL (``stub_embedding_sql``), so embedding *generation* — not
just retrieval — is value-checked against the oracle. Real CLIP/Ollama
implementations plug in behind the same interfaces (``Embedder``/``Describer``).
"""

from __future__ import annotations

import hashlib
import logging
import math
from dataclasses import dataclass
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, StringType

from photo_vector_search_spark.functions.text import hash32

STUB_DIM = 64  # matches the `embeddings` fixture (FIXTURES.md)


# ---------------------------------------------------------------- SQL-expression path


def stub_embedding_expr(text: Column, dim: int = STUB_DIM) -> Column:
    """The stub embedding as a pure column expression (JVM-side, oracle-twinned).

    Components derive from a 32-char md5 SEED of the text, not from the text
    itself: the variable-length document is hashed exactly once and the ``dim``
    per-component hashes run over short fixed-size strings — ~8× fewer hashed
    bytes at the fixture's ~300-char mean than hashing the full text per
    component (round-4 change; all four twins moved together, driver parity
    re-verified). Unnormalized components first; L2-normalized via a second
    pass. All double math, deterministic across engines."""
    seed = F.md5(text.cast("binary"))
    comps = F.array(
        *[
            (hash32(F.concat(seed, F.lit(f":{j}"))) / F.lit(float(1 << 32))) * 2.0 - 1.0
            for j in range(dim)
        ]
    )
    norm = F.sqrt(F.aggregate(comps, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.transform(comps, lambda x: x / norm)


def with_stub_embedding(
    df: DataFrame, text_col: str, out_col: str = "embedding", dim: int = STUB_DIM
) -> DataFrame:
    """Bulk form of ``stub_embedding_expr``: Arrow-batched mapInPandas over the
    Python kernel (``stub_embed_one`` — the same formula, value-identical).

    Python beats the JVM here, measured 3.7× at sf0.1 (0.66 s vs 2.43 s):
    the expression form evaluates 64 chained concat→md5→conv expression trees
    per row — per-expression interpretation overhead on tiny strings — while
    hashlib runs the digest loop in C inside one Arrow batch. This is the
    documented exception to "prefer built-in expressions": a hash-dense,
    tiny-string workload where expression-tree overhead dominates the actual
    hashing. ``stub_embedding_expr`` remains the pure-column form for
    single-row composition (e.g. embedding a query literal inside a plan)."""
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    # structural, not a DDL string: column names with spaces/colons/commas (or
    # exotic nested types) have no stable simpleString round-trip
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, ArrayType(DoubleType()))]
    )

    def _embed(batches):
        for pdf in batches:
            pdf = pdf.copy()
            # None → None mirrors the expression form (md5(NULL) = NULL)
            pdf[out_col] = [
                None if t is None else stub_embed_one(t, dim) for t in pdf[text_col]
            ]
            yield pdf

    return df.mapInPandas(_embed, schema=schema)


def stub_embedding_sql(text_sql: str, dim: int = STUB_DIM) -> str:
    """DuckDB twin of ``stub_embedding_expr`` (same seeded md5-prefix formula)."""
    comps = ", ".join(
        f"(CAST(concat('0x', substring(md5(concat(md5({text_sql}), ':{j}')), 1, 8)) AS BIGINT)"
        f" / 4294967296.0) * 2.0 - 1.0"
        for j in range(dim)
    )
    arr = f"[{comps}]"
    return (
        f"list_transform({arr}, x -> x / sqrt(list_sum(list_transform({arr}, y -> y*y))))"
    )


# ----------------------------------------------------------------- python-side stub


def stub_embed_one(text: str, dim: int = STUB_DIM) -> list[float]:
    """Python twin of the stub formula (used inside the pandas UDF and in tests)."""
    seed = hashlib.md5(text.encode()).hexdigest()
    comps = []
    for j in range(dim):
        h = int(hashlib.md5(f"{seed}:{j}".encode()).hexdigest()[:8], 16)
        comps.append((h / float(1 << 32)) * 2.0 - 1.0)
    n = math.sqrt(sum(x * x for x in comps))
    return [x / n for x in comps]


# ------------------------------------------------------------- pluggable interfaces


@dataclass
class Embedder:
    """Pluggable text/bytes → vector model (reference: CLIP, photo_vector_search.py
    :30-40). ``make_fn`` returns the per-worker inference function — called once
    per Python worker, so heavyweight model loads amortize across batches."""

    dim: int
    make_fn: Callable[[], Callable[[pd.Series], pd.Series]]

    def udf(self):
        make_fn = self.make_fn

        @F.pandas_udf(ArrayType(FloatType()))
        def _embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            fn = make_fn()  # model handle, once per worker
            for s in batches:
                yield fn(s)

        return _embed


def stub_embedder(dim: int = STUB_DIM) -> Embedder:
    def make_fn():
        def embed(s: pd.Series) -> pd.Series:
            return s.map(lambda t: stub_embed_one("" if t is None else str(t), dim))

        return embed

    return Embedder(dim=dim, make_fn=make_fn)


@dataclass
class Describer:
    """Pluggable (content, prompt) → description model (reference: Ollama llava,
    photo_vector_search.py:42-82). Per-row errors map to '' — the row still gets
    indexed, exactly like the reference's silent-empty path (:80-82)."""

    make_fn: Callable[[], Callable[[object, str], str]]

    def udf(self, prompt: str):
        make_fn = self.make_fn

        @F.pandas_udf(StringType())
        def _describe(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            fn = make_fn()
            for s in batches:

                def safe(v):
                    try:
                        out = fn(v, prompt)
                        return "" if out is None else str(out).strip()
                    except Exception:
                        return ""  # error → '' , row still indexed

                yield s.map(safe)

        return _describe


def stub_describer() -> Describer:
    """Deterministic description: first 8 hex of md5 of the input repr + prompt."""

    def make_fn():
        def describe(v, prompt: str) -> str:
            payload = v if isinstance(v, (bytes, bytearray)) else str(v).encode()
            return f"desc-{hashlib.md5(payload + prompt.encode()).hexdigest()[:8]}"

        return describe

    return Describer(make_fn=make_fn)


def available_models() -> dict[str, dict[str, str]]:
    """U-models — the engine-side analogue of `ollama.models()` listing
    (photo_vector_search.py:217-225): the registry of pluggable model
    implementations this deployment can bind to the Embedder/Describer
    interfaces. Real CLIP/Ollama entries register here when their runtimes are
    installed; the deterministic stubs are always available."""
    out = {
        "stub-hash-projection": {"kind": "embedder", "dim": str(STUB_DIM), "hermetic": "yes"},
        "stub-describer": {"kind": "describer", "hermetic": "yes"},
    }
    try:  # real backends appear only when their runtimes are installed
        import clip  # noqa: F401
        import torch  # noqa: F401

        out["clip-vit-l14"] = {"kind": "embedder", "dim": "768", "hermetic": "no"}
    except ImportError as exc:  # absent runtime is the normal hermetic case —
        # log it so a *broken* (half-installed) runtime isn't invisible
        logging.getLogger(__name__).debug("real model backends unavailable: %s", exc)
    return out


# ------------------------------------------------------------------------ pipeline


def embed_documents(
    docs: DataFrame, embedder: Embedder | None = None, text_col: str = "text"
) -> DataFrame:
    """documents → (doc_id, text, embedding): the batch embedding-generation stage.

    Pure map stage — no shuffle; Arrow batches bound memory; rows with a null
    embedding (model failure) are dropped, per the reference's abort-row semantics
    (photo_vector_search.py:102-104)."""
    embedder = embedder or stub_embedder()
    out = docs.withColumn("embedding", embedder.udf()(F.col(text_col)))
    return out.filter(F.col("embedding").isNotNull())


def index_photos(
    files: DataFrame,
    existing: DataFrame | None,
    embedder: Embedder | None = None,
    describer: Describer | None = None,
    prompt: str = "Describe this image in detail",
    aspect_name: str = "default",
) -> DataFrame:
    """Full `index-photos` pipeline as one DataFrame transformation.

    ``files``: (path string, content binary) — e.g. from the binaryFile source.
    Returns the new store state: merge-upsert of the freshly embedded batch into
    ``existing`` (or just the batch if no store yet). Keys are deterministic
    (photo_vector_search.py:127) so re-runs are idempotent."""
    from photo_vector_search_spark.operators.store import merge_upsert

    embedder = embedder or stub_embedder()
    describer = describer or stub_describer()
    batch = (
        files.withColumn("aspect_name", F.lit(aspect_name))
        .withColumn("photo_path", F.col("path"))
        .withColumn("id", F.concat_ws("_", F.col("photo_path"), F.col("aspect_name")))
        .withColumn("embedding", embedder.udf()(F.col("content")))
        .withColumn("description", describer.udf(prompt)(F.col("content")))
        .filter(F.col("embedding").isNotNull())  # embed failure aborts the row
        .select("id", "photo_path", "aspect_name", "description", "embedding")
    )
    if existing is None:
        return batch
    return merge_upsert(existing, batch, ["id"])
