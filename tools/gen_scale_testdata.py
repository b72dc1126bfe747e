"""Deterministic scale-up of the driver's synthetic test tables —
sf0.1 -> sf1.0 (or any integer factor) for one-shot scaling probes.

The driver generates /root/testdata/sf* (read-only, seed=42) but ships
no generator, so larger scale factors for SCALING MEASUREMENTS are
produced by offset replication of the largest shipped SF:

- region/nation stay fixed (TPC-H semantics: dims don't scale).
- Every other table is replicated `factor` times with each copy's
  keys offset by copy_i * (max_key + 1) per key column — FK edges stay
  valid within a copy and never collide across copies, so join
  selectivities and group cardinalities grow exactly linearly (what a
  real 10x corpus does).
- documents.text is DETERMINISTICALLY WORD-SHUFFLED per (copy, doc)
  for copies > 0: replication with near-identical text would make
  every doc a 10-way near-duplicate cluster — a pathological shape a
  real 10x corpus does not have (candidate pairs would grow
  quadratically in the factor). A full word shuffle destroys the
  shingle structure (MinHash/SimHash similarity to the original drops
  to background) while preserving unigram statistics (langid, quality
  ratios, token counts, tf-idf stay distribution-identical). Planted
  WITHIN-copy exact duplicates survive: identical inputs shuffle
  identically under the same (copy, doc)-seeded permutation... except
  identical texts at different doc_ids — those are seeded by TEXT
  HASH, not doc_id, precisely so exact-dup groups replicate linearly.
- embeddings get a per-copy seeded RANDOM ORTHOGONAL ROTATION of the
  whole vector set (see `_perturb_embeddings`): rotation preserves
  every intra-copy pair distance, cluster, and norm exactly (so
  similarity-join outputs and IVF/k-means structure scale linearly
  with the factor) while two independent rotations decorrelate
  cross-copy (cosine ~ N(0, 1/dim) — far outside near-neighbor
  thresholds). An earlier Gaussian-perturbation approach left copies
  at cosine ~0.6-0.8 to their source, spawning factor-sized cliques
  under the LSH radius and ~100x pair growth at 10x data — abandoned
  after the r11 sf1.0 probe caught it.

Usage:
  python tools/gen_scale_testdata.py SRC_DIR DST_DIR [factor]
e.g.
  python tools/gen_scale_testdata.py /root/testdata/sf0.1 \
      /root/repo/.local/sf1.0 10

Output layout matches the driver's (one {table}.parquet per table),
so SPARK_GRAFT_SF_DIR=/root/repo/.local/sf1.0 python bench.py works
unchanged. This data is for SCALING measurements; correctness stays
pinned to the driver's own files.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FIXED_TABLES = ("region", "nation")

# key columns to offset per table: column -> offset base is that
# column's own max+1 in the SOURCE data (per-column, so FK pairs use
# the same base on both sides: customer.c_custkey and orders.o_custkey
# share base via the SHARED_BASE map below)
KEY_COLS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}


def _key_bases(src: str) -> dict[str, int]:
    """max+1 per logical key domain, computed from the SOURCE tables
    so both sides of every FK edge shift by the same base."""
    bases: dict[str, int] = {}
    for table, cols in KEY_COLS.items():
        t = pq.read_table(os.path.join(src, f"{table}.parquet"),
                          columns=list(cols))
        for col, domain in cols.items():
            mx = int(pa.compute.max(t[col]).as_py())
            bases[domain] = max(bases.get(domain, 0), mx + 1)
    return bases


def _shuffle_words(text: str, seed: int) -> str:
    words = text.split(" ")
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    rng.shuffle(words)
    return " ".join(words)


def _perturb_documents(t: pa.Table, copy_i: int) -> pa.Table:
    texts = t["text"].to_pylist()
    out = []
    for txt in texts:
        if txt is None:
            out.append(None)
            continue
        # seed by (copy, text-hash): identical texts (planted exact
        # dups) stay identical after shuffling; different copies get
        # different permutations. crc32, not hash() — the builtin is
        # salted per process and would break determinism across runs.
        import zlib
        seed = zlib.crc32(f"{copy_i}|{txt}".encode())
        out.append(_shuffle_words(txt, seed))
    idx = t.schema.get_field_index("text")
    return t.set_column(idx, "text", pa.array(out, pa.string()))


def _perturb_embeddings(t: pa.Table, copy_i: int) -> pa.Table:
    """Per-copy RANDOM ORTHOGONAL ROTATION of the whole vector set.

    Why rotation and not additive noise: a copy must (a) preserve the
    source's internal geometry exactly — every intra-copy pair
    distance, cluster, and norm is invariant under rotation, so
    similarity-join outputs and IVF/k-means structure scale EXACTLY
    linearly with the factor — and (b) decorrelate from the other
    copies: two independent rotations of the same set have cross-copy
    cosines ~ N(0, 1/dim), i.e. euclidean ~ sqrt(2) for unit-ish
    vectors, far outside near-neighbor thresholds. The first attempt
    used norm-preserving additive noise (cosine-to-source ~0.6-0.8
    ~= euclidean 0.6-0.9): every source spawned a factor-sized clique
    under the LSH join's 1.2 threshold and pair counts grew ~100x at
    10x data — a pathological shape a real 10x corpus does not have
    (caught by the r11 sf1.0 scaling probe as the only super-linear
    headliner; output-driven, not a plan defect)."""
    embs = t["embedding"].to_pylist()
    mat = np.asarray(embs, dtype=np.float64)
    rng = np.random.RandomState(1_000_003 * (copy_i + 1))
    dim = mat.shape[1]
    q, r = np.linalg.qr(rng.normal(size=(dim, dim)))
    q *= np.sign(np.diag(r))  # unique Q: det-stable, no reflections
    rotated = (mat @ q).astype(np.float32)
    idx = t.schema.get_field_index("embedding")
    return t.set_column(
        idx, "embedding",
        pa.array([row.tolist() for row in rotated],
                 t.schema.field("embedding").type))


def scale_table(src: str, dst: str, table: str, factor: int,
                bases: dict[str, int]) -> int:
    path = os.path.join(src, f"{table}.parquet")
    t = pq.read_table(path)
    if table in FIXED_TABLES:
        pq.write_table(t, os.path.join(dst, f"{table}.parquet"))
        return t.num_rows
    copies = []
    for i in range(factor):
        c = t
        if i > 0:
            for col, domain in KEY_COLS.get(table, {}).items():
                idx = c.schema.get_field_index(col)
                typ = c.schema.field(col).type
                shifted = pa.compute.add(c[col],
                                         pa.scalar(i * bases[domain],
                                                   type=typ))
                c = c.set_column(idx, col, shifted)
            if table == "documents":
                c = _perturb_documents(c, i)
            if table == "embeddings":
                c = _perturb_embeddings(c, i)
        copies.append(c)
    out = pa.concat_tables(copies)
    pq.write_table(out, os.path.join(dst, f"{table}.parquet"))
    return out.num_rows


def main() -> None:
    if "--selfcheck" in sys.argv[1:]:
        # Clean-shell import canary (r12 verdict item 2): pyarrow and
        # numpy resolved at module level; prove it, touch no data.
        print(f"selfcheck OK: pyarrow {pa.__version__}, "
              f"numpy {np.__version__}")
        return
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    src, dst = sys.argv[1], sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    bases = _key_bases(src)
    tables = ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split()
    for table in tables:
        n = scale_table(src, dst, table, factor, bases)
        print(f"{table}: {n} rows")
    print(f"done: {dst} at {factor}x of {src}")


if __name__ == "__main__":
    main()
