"""Binary LM import — the one-time conversion from a serialized
n-gram model to the `(model_id, ngram_key, ngram_order, logprob)`
parquet that join-based scoring consumes.

The reference stores models as pickled blobs (`model_table.model_data
BYTEA`, `sql/schema.sql:85-90`; loaded in `setup_database.py:215-229`)
and its roadmap's decided direction is KenLM-style binary models
(`ROADMAP.md:61-66`). In this engine models are TABLES (SURVEY §7.4
Option A), so legacy blobs enter through this module once:

- pickle path: a pickled `NGramModel` (the stand-in for the
  reference's NLTK LM blob);
- ARPA path: the standard n-gram interchange text format every
  KenLM/SRILM-style toolchain can emit.

Both stream the model out in bounded batches through a pyarrow
ParquetWriter — driver memory stays O(batch), never O(model) beyond
the deserialized blob itself (unavoidable: a pickle is a single
object), and the output is immediately splittable for Spark.
"""

from __future__ import annotations

import pickle
from collections.abc import Iterator

MODEL_TABLE_FIELDS = ("model_id", "ngram_key", "ngram_order", "logprob")
_BATCH_ROWS = 500_000


def _write_rows(rows: Iterator[tuple[int, str, int, float]],
                out_path: str) -> int:
    """Stream (model_id, ngram_key, ngram_order, logprob) tuples to
    parquet in bounded batches. Returns rows written."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema([
        pa.field("model_id", pa.int64()),
        pa.field("ngram_key", pa.string()),
        pa.field("ngram_order", pa.int32()),
        pa.field("logprob", pa.float64()),
    ])
    writer = pq.ParquetWriter(out_path, schema)
    n = 0
    batch: list[tuple[int, str, int, float]] = []
    try:
        for row in rows:
            batch.append(row)
            if len(batch) >= _BATCH_ROWS:
                writer.write_table(pa.Table.from_pylist(
                    [dict(zip(MODEL_TABLE_FIELDS, r)) for r in batch],
                    schema=schema))
                n += len(batch)
                batch = []
        if batch:
            writer.write_table(pa.Table.from_pylist(
                [dict(zip(MODEL_TABLE_FIELDS, r)) for r in batch],
                schema=schema))
            n += len(batch)
    finally:
        writer.close()
    return n


def export_model_pickle(model, path: str) -> None:
    """The legacy serialization (reference `model_table.model_data`
    shape): one pickled model blob."""
    with open(path, "wb") as f:
        pickle.dump(model, f)


def import_pickled_model(pickle_path: str, model_id: int,
                         out_path: str) -> int:
    """Pickled NGramModel blob -> model-table parquet. Returns the
    number of n-gram rows written."""
    with open(pickle_path, "rb") as f:
        model = pickle.load(f)  # noqa: S301 — operator-supplied blob
    rows = ((model_id, " ".join(gram), len(gram), lp)
            for gram, lp in model.logprobs.items())
    return _write_rows(rows, out_path)


def export_model_arpa(model, path: str) -> None:
    """Write an NGramModel as ARPA text (the KenLM/SRILM interchange
    format): \\data\\ counts header, then per-order sections of
    `logprob<TAB>w1 w2 ... wn` lines."""
    by_order: dict[int, list[tuple[str, float]]] = {}
    for gram, lp in model.logprobs.items():
        by_order.setdefault(len(gram), []).append((" ".join(gram), lp))
    orders = sorted(by_order)
    with open(path, "w", encoding="utf-8") as f:
        f.write("\\data\\\n")
        for k in orders:
            f.write(f"ngram {k}={len(by_order[k])}\n")
        for k in orders:
            f.write(f"\n\\{k}-grams:\n")
            for key, lp in sorted(by_order[k]):
                f.write(f"{lp}\t{key}\n")
        f.write("\n\\end\\\n")


def import_arpa_model(arpa_path: str, model_id: int, out_path: str) -> int:
    """ARPA text -> model-table parquet, streaming line-by-line (an
    ARPA file can be arbitrarily large; memory stays O(batch)).
    Back-off weights (a third column in full ARPA) are ignored — the
    engine's scoring contract is stupid-backoff with a constant alpha
    (SURVEY §7.3)."""

    def rows() -> Iterator[tuple[int, str, int, float]]:
        order = None
        with open(arpa_path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("\\data\\") \
                        or line.startswith("ngram "):
                    continue
                if line == "\\end\\":
                    break
                if line.startswith("\\") and line.endswith("-grams:"):
                    order = int(line[1:].split("-")[0])
                    continue
                if order is None:
                    continue
                parts = line.split("\t")
                if len(parts) < 2:
                    continue
                yield (model_id, parts[1], order, float(parts[0]))

    return _write_rows(rows(), out_path)


def load_model_table(spark, path: str, model_id: int | None = None):
    """Read an imported model table for `score_with_ngram_table`
    (filter by model_id when the parquet holds several models — the
    predicate reaches the scan)."""
    df = spark.read.parquet(path)
    if model_id is not None:
        df = df.filter(df.model_id == model_id)
    return df.select("ngram_key", "ngram_order", "logprob")
