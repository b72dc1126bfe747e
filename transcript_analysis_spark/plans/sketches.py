"""Sketch, retrieval, and clustering operators: count-min heavy
hitters, positional phrase search over an inverted index, token
distribution drift (PSI), and exact-arithmetic Lloyd k-means.

Every hash/bit trick follows the portable-arithmetic discipline of
plans/data_pipeline.py: exact int64 math that Spark and DuckDB
reproduce bit-for-bit, so even the count-min sketch's COLLISIONS and
k-means' full iteration trajectory are oracle-checked.

Scale notes:

- ``cms_heavy_hitters``: the streaming-agg sketch shape. The sketch is
  a FIXED 4 x 4096 counter grid built in one hash aggregate (map-side
  combined: every executor folds its partition into <=16k cells before
  the shuffle); estimates probe it with a broadcast join. At 100 TB
  the sketch size is unchanged — that is the point of a CMS.
- ``inverted_phrase_search``: positional posting lists (term ->
  (doc, pos)), phrase matching = equi-join of the two terms' lists on
  (doc_id, adjacent positions). Only the queried terms' postings move
  through the join — the corpus-sized posting table partitions by term
  and the filter prunes to 2 keys before any shuffle.
- ``token_psi_drift``: drift monitoring between two corpus snapshots.
  Two hash aggregates over tokens + one vocabulary-sized outer join;
  each PSI contribution is per-row independent (no cross-engine
  sum-order hazard — contributions are emitted, not summed).
- ``kmeans_centroids``: Lloyd's algorithm with embeddings quantized to
  int64 (floor(x*2^16+0.5) — exact for float32 inputs, so distance
  comparisons and centroid updates are pure integer arithmetic and the
  whole T-round trajectory is deterministic across engines). Per
  round: centroids live on the driver (K*DIM ints, the MLlib KMeans
  pattern — the bounded ``collect`` precedent is operators/bpe.py's
  vocabulary loop), assignment is per-row JVM math against a literal
  centroid array (zero shuffle), and the update is ONE map-side-
  combined aggregate with 64 column sums (no dimension explode). The
  DuckDB oracle replays all T rounds as generated SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transcript_analysis_spark.plans.data_pipeline import (MOD, _t,
                                                           duck_char_hash,
                                                           spark_char_hash)
from transcript_analysis_spark.plans.registry import register

# --- count-min sketch ----------------------------------------------------
# depth 4 x width 4096; row hashes ((a*h + b) % MOD) % W on the shared
# polynomial char hash h. a*h < 11*(1e9+7) — inside int64.
CMS_W = 1 << 12
CMS_K_AB = ((0, 3, 1), (1, 5, 2), (2, 7, 3), (3, 11, 5))
CMS_TOP = 20


def tokens_with_hash(docs: DataFrame) -> DataFrame:
    """(w, h): every token occurrence with its portable char hash.
    Shared by the batch query and streaming/sketch_store.py."""
    return (docs.select(F.explode(F.split("text", " ")).alias("w"))
            .withColumn("h", F.expr(spark_char_hash("w"))))


def cms_probe_structs() -> F.Column:
    """The k (j, bucket) probe cells for the hash column `h`."""
    return F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"),
                 ((F.lit(a) * F.col("h") + F.lit(b)) % MOD % CMS_W)
                 .alias("bucket"))
        for j, a, b in CMS_K_AB])).alias("p")


def cms_cells(toks: DataFrame) -> DataFrame:
    """Fold a (w, h) token frame into sketch cells (j, bucket, cnt) —
    one map-side-combined aggregate, <= 4*4096 output rows."""
    return (toks.select("w", "h", cms_probe_structs())
            .groupBy(F.col("p.j").alias("j"),
                     F.col("p.bucket").alias("bucket"))
            .agg(F.count("*").cast("long").alias("cnt")))


def cms_estimate(candidates: DataFrame, sketch: DataFrame) -> DataFrame:
    """min-over-k CMS estimates for a (w, h) candidate frame against a
    (j, bucket, cnt) sketch (broadcast — it is sketch-sized)."""
    probes = candidates.select("w", "h", cms_probe_structs())
    return (probes.join(F.broadcast(sketch),
                        (F.col("p.j") == sketch.j)
                        & (F.col("p.bucket") == sketch.bucket))
            .groupBy("w")
            .agg(F.min("cnt").alias("cms_est")))


@register(
    "cms_heavy_hitters",
    headline=True,
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    h AS (SELECT w, {duck_char_hash('w')} AS h FROM toks),
    ks(j, a, b) AS (VALUES {', '.join(f'({j}, {a}, {b})' for j, a, b in CMS_K_AB)}),
    sketch AS (
      SELECT k.j, ((k.a * h.h + k.b) % {MOD}) % {CMS_W} AS bucket,
             COUNT(*) AS cnt
      FROM h CROSS JOIN ks k GROUP BY 1, 2
    ),
    exact AS (SELECT w, h, COUNT(*) AS exact_cnt FROM h GROUP BY w, h),
    top AS (SELECT * FROM exact ORDER BY exact_cnt DESC, w LIMIT {CMS_TOP})
    SELECT t.w AS token, t.exact_cnt,
           MIN(s.cnt) AS cms_est,
           MIN(s.cnt) - t.exact_cnt AS overestimate
    FROM top t CROSS JOIN ks k
    JOIN sketch s
      ON s.j = k.j AND s.bucket = ((k.a * t.h + k.b) % {MOD}) % {CMS_W}
    GROUP BY t.w, t.exact_cnt
    """,
    tags=("sketch", "text"),
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters: fold the token stream into a
    fixed 4x4096 counter grid (one map-side-combined aggregate), then
    estimate the top-k tokens' counts as the min over their 4 cells.
    The CMS guarantee (est >= exact, overestimate bounded by
    collisions) is visible in the output and oracle-checked exactly,
    because the bucket hashes are shared int64 arithmetic."""
    d = _t(spark, sf_dir, "documents")
    toks = tokens_with_hash(d)
    sketch = cms_cells(toks)
    exact = toks.groupBy("w", "h").agg(F.count("*").alias("exact_cnt"))
    top = exact.orderBy(F.desc("exact_cnt"), "w").limit(CMS_TOP)
    return (cms_estimate(top, sketch)
            .join(top.select("w", "exact_cnt"), "w")
            .select(F.col("w").alias("token"), "exact_cnt", "cms_est",
                    (F.col("cms_est") - F.col("exact_cnt"))
                    .alias("overestimate")))


# --- inverted-index phrase search ----------------------------------------

PHRASE = ("table", "hash")


@register(
    "inverted_phrase_search",
    oracle=f"""
    WITH docs_w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    pos AS (
      SELECT doc_id, i, words[i] AS w
      FROM docs_w, unnest(generate_series(1, CAST(len(words) AS BIGINT)))
        AS t(i)
    )
    SELECT a.doc_id, COUNT(*) AS n_hits
    FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.i = a.i + 1
    WHERE a.w = '{PHRASE[0]}' AND b.w = '{PHRASE[1]}'
    GROUP BY a.doc_id
    """,
    tags=("retrieval", "text"),
)
def inverted_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search over positional posting lists: tokenize
    with positions (the inverted-index build), keep the two queried
    terms' postings, and match the phrase as an equi-join on (doc_id,
    pos+1). At scale the posting table is partitioned by term, so the
    term filter is partition pruning and the join moves only the two
    postings lists — never the corpus."""
    d = _t(spark, sf_dir, "documents")
    pos = d.select("doc_id", F.posexplode(F.split("text", " "))
                   .alias("i", "w"))
    a = pos.filter(F.col("w") == PHRASE[0]).select("doc_id", "i")
    b = pos.filter(F.col("w") == PHRASE[1]).select(
        F.col("doc_id").alias("b_doc"), F.col("i").alias("b_i"))
    return (a.join(b, (F.col("b_doc") == F.col("doc_id"))
                   & (F.col("b_i") == F.col("i") + 1))
            .groupBy("doc_id").agg(F.count("*").alias("n_hits")))


# --- token distribution drift (PSI) --------------------------------------
# Snapshot A = sources whose numeric suffix is even (right(source,1)
# in 0/2/4/6/8), B = the rest. Laplace-smoothed shares; contributions
# are per-row independent so no cross-engine sum-order hazard exists.

_EVENS = "('0','2','4','6','8')"


@register(
    "token_psi_drift",
    oracle=f"""
    WITH toks AS (
      SELECT CASE WHEN right(source, 1) IN {_EVENS} THEN 'a' ELSE 'b'
             END AS side,
             unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    cnt AS (
      SELECT w,
             COUNT(*) FILTER (WHERE side = 'a') AS cnt_a,
             COUNT(*) FILTER (WHERE side = 'b') AS cnt_b
      FROM toks GROUP BY w
    ),
    tot AS (
      SELECT SUM(cnt_a) AS tot_a, SUM(cnt_b) AS tot_b,
             COUNT(*) AS vocab
      FROM cnt
    )
    SELECT c.w AS token, c.cnt_a, c.cnt_b,
           ROUND(
             (CAST(c.cnt_a + 1 AS DOUBLE) / (t.tot_a + t.vocab)
              - CAST(c.cnt_b + 1 AS DOUBLE) / (t.tot_b + t.vocab))
             * ln((CAST(c.cnt_a + 1 AS DOUBLE) / (t.tot_a + t.vocab))
                  / (CAST(c.cnt_b + 1 AS DOUBLE) / (t.tot_b + t.vocab))),
             8) AS psi_contrib
    FROM cnt c CROSS JOIN tot t
    """,
    tags=("quality", "drift"),
)
def token_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift between two corpus snapshots
    (even- vs odd-suffixed sources): per-token Laplace-smoothed share
    in each snapshot and its PSI contribution. The monitoring op a
    training pipeline runs when a new crawl lands — a large
    contribution pinpoints WHICH token's frequency shifted. Two
    map-side-combined aggregates + one vocabulary-sized join; the
    totals row is a broadcast."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.when(F.substring("source", -1, 1).isin("0", "2", "4", "6", "8"),
               F.lit("a")).otherwise(F.lit("b")).alias("side"),
        F.explode(F.split("text", " ")).alias("w"))
    cnt = toks.groupBy("w").agg(
        F.count(F.when(F.col("side") == "a", 1)).alias("cnt_a"),
        F.count(F.when(F.col("side") == "b", 1)).alias("cnt_b"))
    tot = cnt.agg(F.sum("cnt_a").alias("tot_a"),
                  F.sum("cnt_b").alias("tot_b"),
                  F.count("*").alias("vocab"))
    pa = (F.col("cnt_a") + 1).cast("double") / (F.col("tot_a") + F.col("vocab"))
    pb = (F.col("cnt_b") + 1).cast("double") / (F.col("tot_b") + F.col("vocab"))
    return (cnt.join(F.broadcast(tot))
            .select(F.col("w").alias("token"), "cnt_a", "cnt_b",
                    F.round((pa - pb) * F.log(pa / pb), 8)
                    .alias("psi_contrib")))


# --- exact-arithmetic Lloyd k-means --------------------------------------

KM_K = 8           # seed centroids = vec_id 0..7
KM_T = 3           # Lloyd update rounds
KM_DIM = 64
KM_SCALE = 65536   # 2^16: x*SCALE is exact for float32 x


def _km_chain() -> str:
    """The unrolled T-round Lloyd CTE chain (shared by the
    kmeans_centroids and semdedup_prune oracles): defines q
    (quantized vectors), c0..c{T} (centroids) and a0..a{T-1}
    (assignments)."""
    parts = [f"""
    q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {KM_SCALE}.0 + 0.5)
                         AS BIGINT)) AS v
      FROM embeddings
    ),
    c0 AS (SELECT vec_id AS cid, v FROM q WHERE vec_id < {KM_K})"""]
    for t in range(KM_T):
        parts.append(f""",
    d{t} AS (
      SELECT q.vec_id, c.cid,
             list_sum(list_transform(list_zip(q.v, c.v),
                      s -> CAST(s[1] - s[2] AS HUGEINT)
                           * (s[1] - s[2]))) AS dist
      FROM q CROSS JOIN c{t} c
    ),
    a{t} AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cid) AS rn
        FROM d{t}) WHERE rn = 1
    ),
    u{t} AS (
      SELECT a.cid, t.i AS dim, SUM(q.v[t.i]) AS s, COUNT(*) AS n
      FROM a{t} a
      JOIN q ON q.vec_id = a.vec_id
      CROSS JOIN unnest(generate_series(1, {KM_DIM})) AS t(i)
      GROUP BY a.cid, t.i
    ),
    c{t + 1} AS (
      SELECT cid,
             list(CASE WHEN s < 0 THEN -1 ELSE 1 END
                  * ((2 * abs(s) + n) // (2 * n)) ORDER BY dim) AS v
      FROM u{t} GROUP BY cid
    )""")
    return "".join(parts)


def _km_oracle() -> str:
    return f"""
    WITH {_km_chain()}
    SELECT c.cid AS centroid_id, n.n_assigned,
           array_to_string(c.v, ',') AS centroid_q
    FROM c{KM_T} c
    JOIN (SELECT cid, COUNT(*) AS n_assigned
          FROM a{KM_T - 1} GROUP BY cid) n ON n.cid = c.cid"""


def _km_assign(vecs: DataFrame, centroids: list[tuple[int, list[int]]]):
    """Add an argmin-centroid column via per-row JVM math against a
    literal centroid array — zero shuffle, no join."""
    cent_arr = F.array(*[
        F.struct(F.lit(cid).alias("cid"),
                 F.lit(list(v)).cast("array<bigint>").alias("cv"))
        for cid, v in centroids])
    # Distance terms and their sum run in DECIMAL(38,0): the int64 sum
    # of 64 squared deltas wraps once the corpus value spread exceeds
    # ~4600 quantized units (caught by the 64x overflow-regime oracle
    # sweep, tools/scale_probe.py --check — Spark ANSI errors where
    # DuckDB widens to HUGEINT). Same exact-integer algebra, 1e38
    # headroom, and the DuckDB side is HUGEINT so both stay exact.
    dist = lambda c: F.aggregate(  # noqa: E731
        F.zip_with(F.col("v"), c["cv"],
                   lambda a, b: (a - b).cast("decimal(19,0)") * (a - b)),
        F.lit(0).cast("decimal(38,0)"), lambda acc, x: acc + x)
    best = F.array_min(F.transform(cent_arr,
                                   lambda c: F.struct(dist(c).alias("dist"),
                                                      c["cid"].alias("cid"))))
    return vecs.withColumn("cid", best["cid"])


def _round_half_up(s: int, n: int) -> int:
    sign = -1 if s < 0 else 1
    return sign * ((2 * abs(s) + n) // (2 * n))


def _lloyd(spark: SparkSession, sf_dir: str):
    """Run the T Lloyd rounds; return (final centroids, the last
    round's assignment frame (vec_id, v, cid))."""
    e = _t(spark, sf_dir, "embeddings")
    vecs = e.select(
        "vec_id",
        F.transform("embedding",
                    lambda x: F.floor(x.cast("double") * KM_SCALE + F.lit(0.5))
                    .cast("bigint")).alias("v"))
    # Quantize once: every round re-reads this frame (T assignment
    # scans + the final count), so pin it instead of re-deriving.
    vecs = vecs.localCheckpoint(eager=True)
    seeds = (vecs.filter(F.col("vec_id") < KM_K)
             .orderBy("vec_id").collect())
    centroids = [(int(r.vec_id), list(r.v)) for r in seeds]
    if not centroids:
        # Empty corpus: no seeds, no clusters — return the contract
        # shapes instead of building an untypeable empty literal array.
        empty = vecs.withColumn("cid", F.lit(None).cast("int")).limit(0)
        return [], empty
    assigned = None
    for _ in range(KM_T):
        assigned = _km_assign(vecs, centroids)
        upd = (assigned.groupBy("cid")
               .agg(F.count("*").alias("n"),
                    # wide sums: int64 column sums overflow in the same
                    # regime as the distance kernel (DuckDB's SUM is
                    # HUGEINT already); python ints are unbounded after
                    # the K-row collect
                    *[F.sum(F.col("v")[i].cast("decimal(38,0)"))
                      .alias(f"s{i}") for i in range(KM_DIM)])
               .collect())
        centroids = sorted(
            (int(r.cid),
             [_round_half_up(int(r[f"s{i}"]), int(r.n))
              for i in range(KM_DIM)])
            for r in upd)
    return centroids, assigned


@register(
    "kmeans_centroids",
    oracle=_km_oracle(),
    tags=("clustering", "embedding"),
)
def kmeans_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd k-means over the embedding corpus in exact integer
    arithmetic: vectors quantize to int64 at 2^16 (exact for float32),
    so assignment argmins and centroid means (integer half-up) are
    deterministic and the ENTIRE 3-round trajectory hash-matches the
    DuckDB replay — an iterative ML algorithm under the same oracle
    gate as the SQL queries.

    Execution shape per round (the MLlib KMeans pattern): centroids
    are a K x DIM literal broadcast into a per-row JVM argmin (zero
    shuffle), the update is ONE aggregate with 64 map-side-combined
    column sums (no dimension explode), and only K rows cross to the
    driver (the bounded-collect precedent of operators/bpe.py).
    Clusters that lose all members drop out — identically in both
    engines. At 100 TB this is exactly MLlib KMeans' cost model:
    T scans, each one map + one K-row aggregate. Seeds are the first K
    vectors (k-means|| is the production seeding swap)."""
    centroids, assigned = _lloyd(spark, sf_dir)
    counts = assigned.groupBy("cid").agg(F.count("*").alias("n_assigned"))
    final = spark.createDataFrame(
        [(cid, ",".join(map(str, v))) for cid, v in centroids],
        "cid bigint, centroid_q string")
    return (counts.join(F.broadcast(final), "cid")
            .select(F.col("cid").alias("centroid_id"), "n_assigned",
                    "centroid_q"))


# --- SemDeDup: cluster-then-prune semantic dedup -------------------------

SEMDEDUP_TAU = 0.3  # cosine threshold, same scale as embedding_similar_pairs


def _semdedup_oracle() -> str:
    return f"""
    WITH {_km_chain()},
    embd AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    dropped AS (
      SELECT DISTINCT bb.vec_id
      FROM a{KM_T - 1} aa
      JOIN a{KM_T - 1} bb ON bb.cid = aa.cid AND bb.vec_id > aa.vec_id
      JOIN embd ea ON ea.vec_id = aa.vec_id
      JOIN embd eb ON eb.vec_id = bb.vec_id
      WHERE ROUND(list_dot_product(ea.v, eb.v)
                  / (sqrt(list_dot_product(ea.v, ea.v))
                     * sqrt(list_dot_product(eb.v, eb.v))), 6)
            >= CAST({SEMDEDUP_TAU} AS DOUBLE)
    )
    SELECT a.vec_id, a.cid,
           CAST(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS INT)
             AS dropped
    FROM a{KM_T - 1} a LEFT JOIN dropped d ON d.vec_id = a.vec_id"""


@register(
    "semdedup_prune",
    oracle=_semdedup_oracle(),
    tags=("dedup", "clustering", "embedding"),
)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup that never goes
    all-pairs — k-means the embedding corpus (the exact-arithmetic
    Lloyd rounds of `kmeans_centroids`), then compare cosines ONLY
    within a cluster and drop every vector that has an
    above-threshold neighbor with a smaller id (the keep-first
    contract of dedup_keep_best). Cost is sum over clusters of
    |cluster|^2 instead of n^2 — and at 100 TB k grows with the
    corpus so cluster sizes stay bounded; the pair join shuffles on
    cid exactly like embedding_similar_pairs does on label.

    Output: every vector with its cluster and an exact keep/drop
    verdict — the input a curation pipeline feeds to the release
    filter. Cosines use the embedding_similar_pairs float contract
    (round 6, fold order fixed by aggregate())."""
    _, assigned = _lloyd(spark, sf_dir)
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("vd"))
    # Norm per VECTOR, not per pair: sqrt(fold(v,v)) here is bitwise
    # the same value the per-pair form would compute, at 1/|cluster|
    # of the cost. Checkpoint so the Lloyd assignment and the norm
    # fold run once, not once per self-join side.
    norm = ("sqrt(aggregate(zip_with(vd, vd, (x, y) -> x * y), 0D,"
            " (a, x) -> a + x))")
    av = (assigned.join(e, "vec_id")
          .select("vec_id", "cid", "vd", F.expr(norm).alias("nrm"))
          .localCheckpoint(eager=False))
    a = av.select(F.col("vec_id").alias("vec_a"), F.col("cid").alias("ca"),
                  F.col("vd").alias("va"), F.col("nrm").alias("na"))
    b = av.select(F.col("vec_id").alias("vec_b"), F.col("cid").alias("cb"),
                  F.col("vd").alias("vb"), F.col("nrm").alias("nb"))
    dot = "aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (a, x) -> a + x)"
    dropped = (a.join(b, (F.col("cb") == F.col("ca"))
                      & (F.col("vec_b") > F.col("vec_a")))
               .filter(F.round(F.expr(dot) / (F.col("na") * F.col("nb")), 6)
                       >= SEMDEDUP_TAU)
               .select(F.col("vec_b").alias("vec_id")).distinct())
    return (av.join(dropped.withColumn("_d", F.lit(1)), "vec_id", "left")
            .select("vec_id", "cid",
                    F.coalesce("_d", F.lit(0)).cast("int").alias("dropped")))


# --- portable HyperLogLog ------------------------------------------------
# p=10 -> m=1024 registers. All register math is exact int64: ids run
# through a 32-bit avalanche mixer (two rounds of (x>>16 ^ x) *
# 0x45d9f3b — the polynomial char hash is NOT rank-uniform enough for
# HLL's geometric statistics; first drafts underestimated 47% / 19%),
# then split into p index bits and 22 rank bits (rho = trailing zeros
# via log2(x & -x), exact for powers of two). The harmonic sum adds
# exact binary fractions (2^-M, M <= 23: every partial sum fits in 33
# mantissa bits), so even the floating-point estimate is
# order-independent and deterministic across engines — an
# oracle-checkable approximate-distinct, unlike the engine-native HLL
# sketches (approx_order_stats is rows-only for exactly that reason).

HLL_P = 10
HLL_M = 1 << HLL_P
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


@register(
    "hll_distinct_profile",
    headline=True,
    oracle=f"""
    WITH mixed AS (
      SELECT event_type,
             xor(x2 >> 16, x2) AS h
      FROM (
        SELECT event_type,
               (xor(x1 >> 16, x1) * 73244475) & 4294967295 AS x2
        FROM (
          SELECT event_type,
                 (xor(x0 >> 16, x0) * 73244475) & 4294967295 AS x1
          FROM (SELECT event_type,
                       CAST(user_id AS BIGINT) & 4294967295 AS x0
                FROM events)))
    ),
    rho AS (
      SELECT event_type, h & {HLL_M - 1} AS j,
             CASE WHEN (h >> {HLL_P}) = 0 THEN {33 - HLL_P}
                  ELSE CAST(log2((h >> {HLL_P}) & (-(h >> {HLL_P})))
                            AS INT) + 1
             END AS r
      FROM mixed
    ),
    regs AS (
      SELECT event_type, j, MAX(r) AS m FROM rho GROUP BY event_type, j
    ),
    agg AS (
      SELECT event_type,
             COUNT(*) AS present,
             SUM(POWER(2.0, -m)) AS s
      FROM regs GROUP BY event_type
    ),
    est AS (
      SELECT a.event_type,
             {HLL_M} - a.present AS zeros,
             CAST({HLL_ALPHA!r} AS DOUBLE) * {HLL_M} * {HLL_M}
               / (a.s + ({HLL_M} - a.present)) AS raw
      FROM agg a
    )
    SELECT e.event_type,
           x.n_exact,
           ROUND(CASE WHEN e.raw <= 2.5 * {HLL_M} AND e.zeros > 0
                      THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / e.zeros)
                      ELSE e.raw END, 2) AS hll_est
    FROM est e
    JOIN (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
          FROM events GROUP BY event_type) x
      ON x.event_type = e.event_type
    """,
    tags=("sketch", "approximate"),
)
def hll_distinct_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate per event type, next to the
    exact count — with EVERY step engine-portable: register index and
    rank are int64 arithmetic, and the harmonic mean adds exact binary
    fractions, so the estimate itself hash-matches DuckDB (the
    deterministic counterpart to approx_count_distinct's rows-only
    check, with the same fixed-size-sketch scale story: 1024 registers
    per group no matter how many rows stream through the map-side
    combine; union of sketches = register-wise max, which is exactly
    the shuffle this plan performs)."""
    e = _t(spark, sf_dir, "events")
    regs = hll_registers(e, "event_type", "user_id")
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"))
    return (hll_estimate(regs, "event_type").join(exact, "event_type")
            .select("event_type", "n_exact", "hll_est"))


def hll_registers(df: DataFrame, group_col: str, id_col: str) -> DataFrame:
    """(group, j, m): HLL registers per group — one map-side-combined
    max aggregate. Shared by the batch query and
    streaming/sketch_store.py (sketch union = register-wise MAX)."""
    mixed = (df.select(group_col,
                       F.expr(f"CAST({id_col} AS BIGINT) & 4294967295")
                       .alias("x0"))
             .select(group_col,
                     F.expr("(shiftright(x0, 16) ^ x0) * 73244475"
                            " & 4294967295").alias("x1"))
             .select(group_col,
                     F.expr("(shiftright(x1, 16) ^ x1) * 73244475"
                            " & 4294967295").alias("x2"))
             .select(group_col,
                     F.expr("shiftright(x2, 16) ^ x2").alias("h")))
    w = f"shiftright(h, {HLL_P})"
    rho = mixed.select(
        group_col, (F.col("h") % HLL_M).alias("j"),
        F.expr(f"CASE WHEN {w} = 0 THEN {33 - HLL_P} ELSE "
               f"CAST(log2({w} & -{w}) AS INT) + 1 END").alias("r"))
    return rho.groupBy(group_col, "j").agg(F.max("r").alias("m"))


def hll_estimate(regs: DataFrame, group_col: str) -> DataFrame:
    """Per-group cardinality estimate from a (group, j, m) register
    frame — harmonic mean + small-range linear counting."""
    agg = (regs.groupBy(group_col)
           .agg(F.count("*").alias("present"),
                F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("s")))
    est = agg.select(
        group_col, (F.lit(HLL_M) - F.col("present")).alias("zeros"),
        (F.lit(HLL_ALPHA) * HLL_M * HLL_M
         / (F.col("s") + (F.lit(HLL_M) - F.col("present")))).alias("raw"))
    return est.select(
        group_col,
        F.round(
            F.when((F.col("raw") <= 2.5 * HLL_M) & (F.col("zeros") > 0),
                   HLL_M * F.log(F.lit(float(HLL_M)) / F.col("zeros")))
            .otherwise(F.col("raw")), 2).alias("hll_est"))


# --- weighted sampling (A-Res) and co-occurrence mining ------------------

WSAMPLE_K = 50


@register(
    "weighted_doc_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             ROUND(POWER(
               (CAST({duck_char_hash("text || '|wsamp'")} AS DOUBLE) + 1)
                 / ({MOD} + 1),
               1.0 / n_chars), 9) AS ares_key
      FROM documents
    )
    SELECT doc_id, n_chars, ares_key
    FROM keyed ORDER BY ares_key DESC, doc_id LIMIT {WSAMPLE_K}
    """,
    tags=("sampling",),
)
def weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sampling without replacement (Efraimidis-
    Spirakis A-Res): key = u^(1/w) with u from the portable content
    hash instead of an RNG — longer documents are proportionally more
    likely to be drawn, the draw is reproducible across engines and
    runs, and "keep the k largest keys" is a TakeOrderedAndProject
    (per-partition top-k + merge), never a global sort. The length-
    weighted counterpart to uniform_hash_sample / stratified sampling.
    Keys round at 9 before ordering so the two engines' pow() agree on
    the ranking boundary; doc_id breaks residual ties."""
    d = _t(spark, sf_dir, "documents")
    u = ((F.expr(spark_char_hash("text || '|wsamp'")).cast("double") + 1)
         / (MOD + 1))
    keyed = d.select(
        "doc_id", "n_chars",
        F.round(F.pow(u, F.lit(1.0) / F.col("n_chars")), 9)
        .alias("ares_key"))
    return keyed.orderBy(F.desc("ares_key"), "doc_id").limit(WSAMPLE_K)


@register(
    "token_cooccurrence_top20",
    oracle="""
    WITH pres AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
      FROM documents
    )
    SELECT a.w AS w1, b.w AS w2, COUNT(*) AS n_docs
    FROM pres a JOIN pres b ON b.doc_id = a.doc_id AND b.w > a.w
    GROUP BY a.w, b.w
    ORDER BY n_docs DESC, w1, w2 LIMIT 20
    """,
    tags=("mining", "text"),
)
def token_cooccurrence_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top co-occurring token pairs across documents — the pairwise
    frequent-itemset pass of market-basket analysis. The pair join
    runs on the DISTINCT (doc, token) presence table, so its output is
    bounded by docs x vocab^2 presence — at 100 TB the standard cut is
    frequency-pruned candidates (drop tokens below min-support before
    pairing: the Apriori property), which is one filter on this same
    plan. Top-20 is a TakeOrderedAndProject."""
    d = _t(spark, sf_dir, "documents")
    pres = (d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
            .distinct())
    b = pres.select(F.col("doc_id").alias("b_doc"), F.col("w").alias("w2"))
    return (pres.join(b, (F.col("b_doc") == F.col("doc_id"))
                      & (F.col("w2") > F.col("w")))
            .groupBy(F.col("w").alias("w1"), "w2")
            .agg(F.count("*").alias("n_docs"))
            .orderBy(F.desc("n_docs"), "w1", "w2").limit(20))


# --- binned quantile sketch ----------------------------------------------
# The third mergeable sketch: counts -> CMS (merge=sum), distinct ->
# HLL (merge=max), quantiles -> fixed equi-width histogram
# (merge=bin-wise sum, the same algebra as CMS). 2048 bins over the
# observed [min, max]; estimates interpolate uniformly inside the hit
# bin. Bin assignment arithmetic runs on identical doubles in both
# engines; the cumulative walk is a bounded self-join over the
# aggregated bins (never a global window).

QSK_BINS = 2048
QSK_QS = (0.5, 0.95, 0.99)


@register(
    "binned_quantile_estimate",
    oracle=f"""
    WITH ext AS (
      SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders
    ),
    binned AS (
      SELECT LEAST({QSK_BINS - 1}, GREATEST(0,
               CAST(FLOOR((o.o_totalprice - e.lo) / (e.hi - e.lo)
                          * {QSK_BINS}) AS INT))) AS b,
             COUNT(*) AS cnt
      FROM orders o CROSS JOIN ext e
      GROUP BY 1
    ),
    cum AS (
      SELECT a.b, a.cnt,
             SUM(p.cnt) AS cum_le,
             SUM(p.cnt) - a.cnt AS cum_lt
      FROM binned a JOIN binned p ON p.b <= a.b
      GROUP BY a.b, a.cnt
    ),
    qs(q) AS (VALUES {', '.join(f'(CAST({q} AS DOUBLE))' for q in QSK_QS)}),
    hit AS (
      SELECT q, MIN(b) AS b
      FROM qs JOIN cum ON cum.cum_le >= q * (SELECT n FROM ext)
      GROUP BY q
    ),
    exact AS (
      {' UNION ALL '.join(
          f"SELECT CAST({q} AS DOUBLE) AS q,"
          f" ROUND(quantile_cont(o_totalprice, {q}), 4) AS exact"
          f" FROM orders" for q in QSK_QS)}
    )
    SELECT h.q AS quantile,
           ROUND(e.lo + (e.hi - e.lo) / {QSK_BINS}
                 * (h.b + (h.q * e.n - c.cum_lt) / c.cnt), 4) AS est,
           x.exact
    FROM hit h
    JOIN cum c ON c.b = h.b
    JOIN exact x ON x.q = h.q
    CROSS JOIN ext e
    """,
    tags=("sketch", "approximate"),
)
def binned_quantile_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a fixed 2048-bin histogram, reported
    beside the exact percentile — the mergeable-quantile-sketch shape
    (bins merge by addition across partitions/shards, exactly like
    the CMS cells; the t-digest this stands in for trades the fixed
    grid for adaptive centroids). Every arithmetic step is identical
    double math in both engines, so the ESTIMATE is oracle-checked —
    completing the sketch trilogy with CMS (counts) and HLL
    (distinct). Accuracy is bounded by bin width (range/2048);
    pinned in tests."""
    o = _t(spark, sf_dir, "orders")
    ext = o.agg(F.min("o_totalprice").alias("lo"),
                F.max("o_totalprice").alias("hi"),
                F.count("*").cast("bigint").alias("n"))
    binned = (o.join(F.broadcast(ext))
              .select(F.least(
                  F.lit(QSK_BINS - 1),
                  F.greatest(F.lit(0), F.floor(
                      (F.col("o_totalprice") - F.col("lo"))
                      / (F.col("hi") - F.col("lo")) * QSK_BINS)
                      .cast("int"))).alias("b"))
              .groupBy("b").agg(F.count("*").alias("cnt"))
              .localCheckpoint(eager=False))
    p = binned.select(F.col("b").alias("pb"), F.col("cnt").alias("pcnt"))
    cum = (binned.join(p, F.col("pb") <= F.col("b"))
           .groupBy("b", "cnt")
           .agg(F.sum("pcnt").alias("cum_le"),
                (F.sum("pcnt") - F.col("cnt")).alias("cum_lt")))
    qs = spark.range(1).select(F.explode(F.array(
        *[F.lit(float(q)) for q in QSK_QS])).alias("q"))
    hit = (qs.join(F.broadcast(ext))
           .join(cum, F.col("cum_le") >= F.col("q") * F.col("n"))
           .groupBy("q").agg(F.min("b").alias("b")))
    exact = o.agg(*[
        F.round(F.expr(f"percentile(o_totalprice, cast({q} as double))"), 4)
        .alias(f"x{i}") for i, q in enumerate(QSK_QS)])
    exact_long = (exact.select(F.explode(F.array(*[
        F.struct(F.lit(float(q)).alias("q"),
                 F.col(f"x{i}").alias("exact"))
        for i, q in enumerate(QSK_QS)])).alias("s"))
        .select("s.q", "s.exact"))
    return (hit.join(cum.select("b", "cnt", "cum_lt"), "b")
            .join(F.broadcast(ext))
            .select("q",
                    F.round(F.col("lo") + (F.col("hi") - F.col("lo"))
                            / QSK_BINS
                            * (F.col("b") + (F.col("q") * F.col("n")
                                             - F.col("cum_lt"))
                               / F.col("cnt")), 4).alias("est"),
                    "q")
            .select("q", "est")
            .join(F.broadcast(exact_long), "q")
            .select(F.col("q").alias("quantile"), "est", "exact"))


# --- embedding outlier scores (distance-to-centroid anomaly) -------------

_OUT_SCHEMA = ("vec_id bigint, cid bigint, dist2 bigint, "
               "med_dist2 double, outlier boolean")


def _outlier_oracle() -> str:
    return f"""
    WITH {_km_chain()},
    d AS (
      SELECT a.vec_id, a.cid,
             list_sum(list_transform(list_zip(q.v, c.v),
                      s -> (s[1] - s[2]) * (s[1] - s[2]))) AS dist2
      FROM a{KM_T - 1} a
      JOIN q ON q.vec_id = a.vec_id
      JOIN c{KM_T} c ON c.cid = a.cid
    ),
    med AS (
      SELECT cid, quantile_cont(dist2, 0.5) AS med_dist2
      FROM d GROUP BY cid
    )
    SELECT d.vec_id, CAST(d.cid AS BIGINT) AS cid,
           CAST(d.dist2 AS BIGINT) AS dist2,
           m.med_dist2,
           CAST(d.dist2 AS DOUBLE) > 4.0 * m.med_dist2 AS outlier
    FROM d JOIN med m ON m.cid = d.cid
    """


@register("embedding_outlier_scores", oracle=_outlier_oracle(),
          tags=("clustering", "embedding", "quality"))
def embedding_outlier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic outlier detection: every vector's squared distance to
    its FINAL k-means centroid, the per-cluster median of those
    distances, and an outlier flag at 2x the median distance
    (4x squared) — the embedding-space garbage filter that catches
    what text heuristics can't (mojibake, wrong-modality payloads,
    encoder failures all land far from every centroid).

    Shares the exact-arithmetic Lloyd machinery: assignments and
    centroids come from the same quantized int64 trajectory the
    kmeans_centroids oracle replays, distances are exact integers,
    and the median (linear interpolation over int64, at worst one
    .5 term — exact in double) plus the 4x-median comparison are
    engine-deterministic. Plan: distances are per-row math against
    the K-row broadcast centroid table; the only shuffles are the
    K-sized median aggregate and its broadcast back."""
    centroids, assigned = _lloyd(spark, sf_dir)
    if not centroids:
        return spark.createDataFrame([], _OUT_SCHEMA)
    cent = spark.createDataFrame(
        [(cid, v) for cid, v in centroids], "cid int, cv array<bigint>")
    d = (assigned.join(F.broadcast(cent), "cid")
         .select("vec_id", "cid",
                 F.aggregate(
                     F.zip_with("v", "cv", lambda a, b: (a - b) * (a - b)),
                     F.lit(0).cast("bigint"), lambda acc, x: acc + x)
                 .alias("dist2")))
    med = d.groupBy("cid").agg(
        F.expr("percentile(dist2, 0.5)").alias("med_dist2"))
    return (d.join(F.broadcast(med), "cid")
            .select("vec_id", F.col("cid").cast("long").alias("cid"),
                    F.col("dist2").cast("long").alias("dist2"),
                    "med_dist2",
                    (F.col("dist2").cast("double")
                     > F.lit(4.0) * F.col("med_dist2")).alias("outlier")))


# --- power-iteration top principal component -----------------------------

PI_T = 4              # power-iteration rounds
PI_DIR_SCALE = 16384  # 2^14: direction vectors renormalize to +/- this


def _pi_oracle() -> str:
    """Unrolled power-iteration replay: the kmeans trajectory
    discipline applied to covariance-free power iteration. All
    arithmetic is HUGEINT; the per-round renormalization is integer
    half-up against the max-abs component, so every round's direction
    vector is bit-identical across engines."""
    parts = [f"""
    q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {KM_SCALE}.0 + 0.5)
                         AS BIGINT)) AS v
      FROM embeddings
    ),
    st AS (SELECT COUNT(*) AS n FROM q),
    cs AS (
      SELECT t.i AS dim, SUM(CAST(q.v[t.i] AS HUGEINT)) AS s
      FROM q CROSS JOIN unnest(generate_series(1, {KM_DIM})) AS t(i)
      GROUP BY t.i
    ),
    cm AS (
      SELECT cs.dim,
             CASE WHEN cs.s < 0 THEN -1 ELSE 1 END
             * (abs(cs.s) // CAST(st.n AS HUGEINT)) AS c
      FROM cs CROSS JOIN st
    ),
    yl AS (
      SELECT q.vec_id, t.i AS dim,
             CAST(q.v[t.i] AS HUGEINT) - cm.c AS y
      FROM q CROSS JOIN unnest(generate_series(1, {KM_DIM})) AS t(i)
      JOIN cm ON cm.dim = t.i
    ),
    w0 AS (
      SELECT t.i AS dim, CAST({PI_DIR_SCALE} AS HUGEINT) AS w
      FROM unnest(generate_series(1, {KM_DIM})) AS t(i)
    )"""]
    for t in range(PI_T):
        parts.append(f""",
    d{t} AS (
      SELECT y.vec_id, SUM(y.y * w.w) AS d
      FROM yl y JOIN w{t} w USING (dim) GROUP BY y.vec_id
    ),
    s{t} AS (
      SELECT y.dim, SUM(y.y * d.d) AS s
      FROM yl y JOIN d{t} d USING (vec_id) GROUP BY y.dim
    ),
    m{t} AS (SELECT GREATEST(MAX(abs(s)), 1) AS m FROM s{t}),
    w{t + 1} AS (
      SELECT dim, CASE WHEN s < 0 THEN -1 ELSE 1 END
                  * ((2 * {PI_DIR_SCALE} * abs(s) + m) // (2 * m)) AS w
      FROM s{t} CROSS JOIN m{t}
    ),
    o{t} AS (
      SELECT CAST({t + 1} AS BIGINT) AS round_id,
             array_to_string(list(w.w ORDER BY w.dim), ',') AS dir_q,
             CAST(MAX(m.m) AS VARCHAR) AS scale_m
      FROM w{t + 1} w CROSS JOIN m{t} m
      HAVING COUNT(*) > 0
    )""")
    unions = " UNION ALL ".join(f"SELECT * FROM o{t}" for t in range(PI_T))
    return f"WITH {''.join(parts)} {unions}"


def _pi_run(spark: SparkSession, sf_dir: str):
    """Shared power-iteration trajectory: returns (n, y, rows, w)
    where y is the mean-centered quantized frame (localCheckpointed),
    rows the per-round (round_id, dir_q, scale_m) tuples, and w the
    final +/-2^14 direction. n == 0 short-circuits to (0, None, [],
    None)."""
    e = _t(spark, sf_dir, "embeddings")
    vecs = e.select(
        "vec_id",
        F.transform("embedding",
                    lambda x: F.floor(x.cast("double") * KM_SCALE + F.lit(0.5))
                    .cast("bigint")).alias("v"))
    head = vecs.agg(
        F.count("*").alias("n"),
        *[F.sum(F.col("v")[i].cast("decimal(38,0)")).alias(f"s{i}")
          for i in range(KM_DIM)]).collect()[0]
    n = int(head["n"])
    if n == 0:
        return 0, None, [], None
    colsum = [int(head[f"s{i}"]) for i in range(KM_DIM)]
    cmean = [(-1 if c < 0 else 1) * (abs(c) // n) for c in colsum]
    # y = x - (colsum div n): |y| ~ 2^17 regardless of n; pinned
    # once — every round re-scans this frame twice.
    y = vecs.select(
        "vec_id",
        F.zip_with(F.col("v"), F.lit(cmean).cast("array<bigint>"),
                   lambda a, b: a - b).alias("y"))
    y = y.localCheckpoint(eager=True)
    w = [PI_DIR_SCALE] * KM_DIM
    rows = []
    for t in range(PI_T):
        w_lit = F.lit(w).cast("array<bigint>")
        # |y*w| <= 2^17 * 2^14, 64-term sum <= 2^37: pure int64
        dot = F.aggregate(
            F.zip_with(F.col("y"), w_lit, lambda a, b: a * b),
            F.lit(0).cast("bigint"), lambda acc, x: acc + x)
        upd = (y.select(dot.alias("d"), "y")
               .agg(*[F.sum(F.col("y")[i].cast("decimal(38,0)")
                            * F.col("d")).alias(f"s{i}")
                      for i in range(KM_DIM)])
               .collect()[0])
        s = [int(upd[f"s{i}"]) for i in range(KM_DIM)]
        m = max(max(abs(x) for x in s), 1)
        w = [(-1 if x < 0 else 1)
             * ((2 * PI_DIR_SCALE * abs(x) + m) // (2 * m)) for x in s]
        rows.append((t + 1, ",".join(map(str, w)), str(m)))
    return n, y, rows, w


@register(
    "power_iteration_top_pc",
    oracle=_pi_oracle(),
    tags=("embedding", "linear-algebra"),
)
def power_iteration_top_pc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the embedding corpus by
    covariance-free power iteration — the 'all-but-the-top' embedding
    post-processing primitive (Mu & Viswanath 2018: isotropy repair by
    removing the top PCs) and the health check that catches a
    collapsed encoder (one direction swallowing the variance).

    Exact-arithmetic trajectory (the kmeans_centroids discipline
    applied to linear algebra): vectors quantize at 2^16; centering
    subtracts the exact integer mean (colsum div n, truncation toward
    zero spelled identically on both engines via sign * abs-quotient),
    so |y| stays ~2^17 INDEPENDENT of corpus size — the rejected
    alternative y = n*x - colsum is division-free but its round
    products grow as n^3 and breach DECIMAL(38,0) at ~10M vectors;
    this form is safe to ~2^70 rows (the sub-quantum residual mean is
    deterministic, identical cross-engine, and below quantization
    noise). Each round computes w <- Y^T (Y w) without ever
    materializing the 64x64 covariance, then renormalizes to +/-2^14
    by integer half-up against the max-abs component (GREATEST(m,1)
    guards the all-zero corpus). Every round's direction vector and
    normalizer hash-match the DuckDB HUGEINT replay; the per-row dot
    fits plain int64, only the corpus-sum runs in the
    overflow-sweep-audited DECIMAL(38,0) _wide regime.

    Execution shape per round (T=4 total): the direction is a 64-int
    literal broadcast into per-row JVM math — dot = one zip_with fold,
    update = ONE aggregate with 64 map-side-combined wide column sums;
    only a single row ever reaches the driver. At 100 TB: T scans,
    each map + 1-row aggregate — no shuffle wider than 64 decimals,
    same cost model as MLlib's RowMatrix power iteration (RowMatrix
    caps at the same "tall-and-skinny" shape; here dim=64)."""
    n, _, rows, _ = _pi_run(spark, sf_dir)
    schema = "round_id bigint, dir_q string, scale_m string"
    if n == 0:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(rows, schema)


def _repair_oracle() -> str:
    """Composed on the PI chain: the final direction w{PI_T} and the
    centered frame yl feed the projection removal; the half-up
    quotient is the house sign * abs // algebra so residual
    coordinates are bit-identical across engines."""
    chain = _pi_oracle().split(" UNION ALL ")[0]
    with_body = chain[len("WITH "):chain.rindex(" SELECT * FROM o0")]
    return f"""WITH {with_body},
    tw AS (SELECT SUM(w.w * w.w) AS ww FROM w{PI_T} w),
    pv AS (
      SELECT y.vec_id, SUM(y.y * w.w) AS p
      FROM yl y JOIN w{PI_T} w USING (dim) GROUP BY y.vec_id
    ),
    rs AS (
      SELECT y.vec_id,
             y.y - (CASE WHEN p.p * w.w < 0 THEN -1 ELSE 1 END)
                   * ((2 * abs(p.p * w.w) + t.ww) // (2 * t.ww)) AS r,
             y.y AS y0
      FROM yl y JOIN w{PI_T} w USING (dim)
      JOIN pv p USING (vec_id) CROSS JOIN tw t
    )
    SELECT r.vec_id,
           CAST(p.p AS BIGINT) AS proj_q,
           CAST(SUM(r.y0 * r.y0) AS BIGINT) AS norm2_before,
           CAST(SUM(r.r * r.r) AS BIGINT) AS resid_norm2
    FROM rs r JOIN pv p USING (vec_id)
    GROUP BY r.vec_id, p.p"""


@register(
    "isotropy_repair_residuals",
    oracle=_repair_oracle(),
    tags=("embedding", "linear-algebra"),
)
def isotropy_repair_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-but-the-top APPLIED (Mu & Viswanath 2018): remove each
    embedding's projection onto the corpus' dominant principal
    direction — the isotropy repair that measurably improves
    similarity search on anisotropic encoders — and report, per
    vector, the projection coefficient plus squared norms before and
    after (their gap is exactly the variance the top PC swallowed;
    ranking by |proj_q| surfaces the vectors a collapsed encoder
    piled onto one axis).

    Composed on `power_iteration_top_pc`: the Spark side reuses the
    SAME trajectory run (shared `_pi_run`), the oracle the SAME CTE
    chain, so repair cannot drift from the direction it repairs (the
    corpus_release_prep composition discipline). Projection removal
    is exact integer: c_i = half-up(p * w_i / (w.w)) via the house
    sign * abs-quotient algebra, so residual coordinates — not just
    norms — are bit-identical across engines; everything fits int64
    (|p| <= 64 * 2^17 * 2^14 = 2^37 at real-data magnitudes, audited
    to 2^61 in the 64x shift-inflated probe regime).

    Execution: ONE map-only pass over the centered frame with the
    direction + its Gram scalar broadcast as literals (SQL lambdas,
    JVM codegen, no shuffle at all beyond the trajectory's own
    aggregates) — at 100 TB this is the same cost as reading the
    embedding column once."""
    n, y, _, w = _pi_run(spark, sf_dir)
    schema = ("vec_id bigint, proj_q bigint, norm2_before bigint, "
              "resid_norm2 bigint")
    if n == 0:
        return spark.createDataFrame([], schema)
    wtw = sum(x * x for x in w)
    arr = "array(" + ",".join(f"{x}L" for x in w) + ")"
    p = (f"aggregate(zip_with(y, {arr}, (a, b) -> a * b), 0L, "
         f"(acc, x) -> acc + x)")
    rn2 = (f"aggregate(zip_with(y, {arr}, (a, b) -> a - "
           f"(CASE WHEN p * b < 0 THEN -1L ELSE 1L END) * "
           f"((2 * abs(p * b) + {wtw}L) div (2 * {wtw}L))), 0L, "
           f"(acc, r) -> acc + r * r)")
    nb2 = "aggregate(y, 0L, (acc, a) -> acc + a * a)"
    return (y.select("vec_id", F.expr(p).alias("p"), "y")
             .select("vec_id",
                     F.col("p").alias("proj_q"),
                     F.expr(nb2).alias("norm2_before"),
                     F.expr(rn2).alias("resid_norm2")))
