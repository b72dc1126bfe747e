"""ANN parameter sweep — the recall/cost frontier, oracle-checked.

`ann_recall_report` (plans/data_pipeline.py) publishes recall for the
PRODUCTION config of each ANN family; this module publishes the
FRONTIER the production config was chosen from (r6 verdict item 2):
recall@k and candidate cost for IVF nprobe in {2,4,8,16}, RP-LSH
multiprobe (planes, Hamming radius) in {(8,0),(8,1),(8,2),(6,1)}, and
PQ (codebook size, rerank depth) in {(4,100),(16,400),(64,400),
(64,500),(64,800)} — averaged over a deterministic multi-query set
(every 97th vector) instead of the single-query report, so the
promoted numbers are not one-query noise.

All recall arithmetic is exact integers over deterministically
tie-broken top-k sets (metric-matched ground truth: cosine for
IVF/RP, L2 for PQ), the ratio through the shared half-up integer
rounding — the sweep itself is driver-hash-checked against DuckDB,
same discipline as `lsh_band_tuning_report`.

The promoted constants live in plans/data_pipeline.py
(`IVF_NPROBE=8`, `PQ_NCODE=64`, `PQ_RERANK=500`) and are consumed by
`ivf_topk_probe` / `pq_topk_adc` / `ann_recall_report` / the
streaming IVF store; tests/test_ann.py pins the promoted PQ config's
measured recall@10 >= 0.9 at sf0.1 against this sweep.

Scale shape: every family keeps its production plan (broadcast
centroids/codebooks/query vectors, per-partition window argmins,
rank-bounded shortlists); the ground-truth brute force is the one
deliberately exhaustive branch — it runs per offline audit, never per
corpus pass. Reference parity: pgvector HNSW tuned by hand
(`setup_vector_db.py:147-155`); here index selection is a measured
artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from transcript_analysis_spark.functions.rounding import (duck_round_ratio,
                                                          spark_round_ratio)
from transcript_analysis_spark.plans.data_pipeline import (ANN_K, _DUCK_COS,
                                                           _DUCK_EMB,
                                                           _spark_cos, _t)
from transcript_analysis_spark.plans.registry import register

SWEEP_QUERY_MOD = 97          # query set: vec_id % 97 == 0 (21 at sf0.1)
IVF_SWEEP = (2, 4, 8, 16)
RP_SWEEP = ((8, 0), (8, 1), (8, 2), (6, 1))      # (planes, hamming radius)
PQ_SWEEP = ((4, 100), (16, 400), (64, 400), (64, 500), (64, 800))
_PQ_NCODES = tuple(sorted({nc for nc, _ in PQ_SWEEP}))

_DUCK_L2_6 = ("ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
              "list_transform(generate_series(1, CAST(len({a}) AS BIGINT)), "
              "d -> ({a}[d] - {b}[d]) * ({a}[d] - {b}[d]))), "
              "(acc, x) -> acc + x), 6)")

_DUCK_SUBDIST = ("list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
                 "list_transform(generate_series(1, 8), "
                 "t -> ({v}[8*{s}+t] - {c}[t]) * ({v}[8*{s}+t] - {c}[t]))), "
                 "(acc, x) -> acc + x)")

_DUCK_PROJ = ("list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
              "list_transform(generate_series(1, CAST(len(v) AS BIGINT)), "
              "d -> v[d] * (CAST(((p.j * 64 + d) * 2654435761) % 1000 "
              "AS DOUBLE) / 500.0 - 1.0))), (a, b) -> a + b)")


def _duck_sweep_sql() -> str:
    """Generate the full sweep oracle: shared base CTEs + one
    cand/top CTE pair per grid point + a UNION ALL report."""
    chain = " + ".join(
        f"MAX(CASE WHEN e.s = {i} THEN d.dq END)" for i in range(8))
    base = f"""
    WITH {_DUCK_EMB},
    qs AS (
      SELECT vec_id AS qid, v AS qv FROM emb
      WHERE vec_id % {SWEEP_QUERY_MOD} = 0
    ),
    nq AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_queries FROM qs),
    scored AS (
      SELECT q.qid, e.vec_id,
             {_DUCK_COS.format(a='e.v', b='q.qv', d=6)} AS cosine,
             {_DUCK_L2_6.format(a='e.v', b='q.qv')} AS l2
      FROM emb e CROSS JOIN qs q WHERE e.vec_id <> q.qid
    ),
    gt_cos AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id, ROW_NUMBER() OVER (
          PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rk
        FROM scored) WHERE rk <= {ANN_K}
    ),
    gt_l2 AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id, ROW_NUMBER() OVER (
          PARTITION BY qid ORDER BY l2, vec_id) AS rk
        FROM scored) WHERE rk <= {ANN_K}
    ),
    cents AS (
      SELECT vec_id AS cent_id, v AS cv FROM emb WHERE vec_id % 53 = 1
    ),
    assign AS (
      SELECT vec_id, cent_id FROM (
        SELECT e.vec_id, c.cent_id, ROW_NUMBER() OVER (
          PARTITION BY e.vec_id
          ORDER BY {_DUCK_COS.format(a='e.v', b='c.cv', d=9)} DESC,
                   c.cent_id) AS rk
        FROM emb e CROSS JOIN cents c) WHERE rk = 1
    ),
    qc AS (
      SELECT q.qid, c.cent_id, ROW_NUMBER() OVER (
        PARTITION BY q.qid
        ORDER BY {_DUCK_COS.format(a='c.cv', b='q.qv', d=9)} DESC,
                 c.cent_id) AS crk
      FROM cents c CROSS JOIN qs q
    ),
    dots AS (
      SELECT vec_id, p.j, {_DUCK_PROJ} AS dot
      FROM emb CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS j) p
    ),
    cb AS (
      SELECT subs.s, seeds.code, seeds.crk,
             seeds.sv[8*subs.s+1 : 8*subs.s+8] AS c
      FROM (SELECT vec_id AS code, v AS sv,
                   ROW_NUMBER() OVER (ORDER BY vec_id) AS crk
            FROM emb ORDER BY vec_id LIMIT {max(_PQ_NCODES)}) seeds
      CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS s) subs
    ),
    dv AS (
      SELECT e.vec_id, cb.s, cb.code, cb.crk,
             {_DUCK_SUBDIST.format(v='e.v', s='cb.s', c='cb.c')} AS dv
      FROM emb e CROSS JOIN cb
    ),
    dqt AS (
      SELECT q.qid, cb.s, cb.code, cb.crk,
             {_DUCK_SUBDIST.format(v='q.qv', s='cb.s', c='cb.c')} AS dq
      FROM cb CROSS JOIN qs q
    )"""
    parts, rows = [], []
    for p in sorted({pl for pl, _ in RP_SWEEP}):
        parts.append(f""",
    buck{p} AS (
      SELECT vec_id,
             CAST(SUM(CASE WHEN dot > 0 THEN CAST(POWER(2, j) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS bucket
      FROM dots WHERE j < {p} GROUP BY vec_id
    ),
    qb{p} AS (
      SELECT q.qid, b.bucket AS qbucket
      FROM qs q JOIN buck{p} b ON b.vec_id = q.qid
    )""")
    for n in IVF_SWEEP:
        parts.append(f""",
    ivf{n}_cand AS (
      SELECT r.qid, a.vec_id
      FROM assign a JOIN qc r ON a.cent_id = r.cent_id AND r.crk <= {n}
      WHERE a.vec_id <> r.qid
    ),
    ivf{n}_top AS (
      SELECT qid, vec_id FROM (
        SELECT s.qid, s.vec_id, ROW_NUMBER() OVER (
          PARTITION BY s.qid ORDER BY s.cosine DESC, s.vec_id) AS rk
        FROM ivf{n}_cand c
        JOIN scored s ON s.qid = c.qid AND s.vec_id = c.vec_id)
      WHERE rk <= {ANN_K}
    )""")
        rows.append(
            f"SELECT 'ivf' AS variant, CAST({n} AS BIGINT) AS p1, "
            f"CAST(0 AS BIGINT) AS p2, 'cosine' AS metric, "
            f"(SELECT COUNT(*) FROM ivf{n}_cand) AS n_candidates, "
            f"(SELECT COUNT(*) FROM ivf{n}_top t JOIN gt_cos g "
            f"ON g.qid = t.qid AND g.vec_id = t.vec_id) AS n_hits")
    for p, h in RP_SWEEP:
        parts.append(f""",
    rp{p}_{h}_cand AS (
      SELECT q.qid, b.vec_id
      FROM buck{p} b CROSS JOIN qb{p} q
      WHERE bit_count(xor(b.bucket, q.qbucket)) <= {h}
        AND b.vec_id <> q.qid
    ),
    rp{p}_{h}_top AS (
      SELECT qid, vec_id FROM (
        SELECT s.qid, s.vec_id, ROW_NUMBER() OVER (
          PARTITION BY s.qid ORDER BY s.cosine DESC, s.vec_id) AS rk
        FROM rp{p}_{h}_cand c
        JOIN scored s ON s.qid = c.qid AND s.vec_id = c.vec_id)
      WHERE rk <= {ANN_K}
    )""")
        rows.append(
            f"SELECT 'rp_multiprobe', CAST({p} AS BIGINT), "
            f"CAST({h} AS BIGINT), 'cosine', "
            f"(SELECT COUNT(*) FROM rp{p}_{h}_cand), "
            f"(SELECT COUNT(*) FROM rp{p}_{h}_top t JOIN gt_cos g "
            f"ON g.qid = t.qid AND g.vec_id = t.vec_id)")
    for nc in _PQ_NCODES:
        parts.append(f""",
    pq{nc}_enc AS (
      SELECT vec_id, s, code FROM (
        SELECT vec_id, s, code, ROW_NUMBER() OVER (
          PARTITION BY vec_id, s ORDER BY dv, code) AS rn
        FROM dv WHERE crk <= {nc}) WHERE rn = 1
    ),
    pq{nc}_adc AS (
      SELECT d.qid, e.vec_id, ROUND({chain}, 6) AS approx
      FROM pq{nc}_enc e
      JOIN dqt d ON d.s = e.s AND d.code = e.code AND d.crk <= {nc}
      WHERE e.vec_id <> d.qid
      GROUP BY d.qid, e.vec_id
    )""")
    for nc, rr in PQ_SWEEP:
        parts.append(f""",
    pq{nc}_{rr}_short AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id, ROW_NUMBER() OVER (
          PARTITION BY qid ORDER BY approx, vec_id) AS rk
        FROM pq{nc}_adc) WHERE rk <= {rr}
    ),
    pq{nc}_{rr}_top AS (
      SELECT qid, vec_id FROM (
        SELECT s.qid, s.vec_id, ROW_NUMBER() OVER (
          PARTITION BY s.qid ORDER BY s.l2, s.vec_id) AS rk
        FROM pq{nc}_{rr}_short c
        JOIN scored s ON s.qid = c.qid AND s.vec_id = c.vec_id)
      WHERE rk <= {ANN_K}
    )""")
        rows.append(
            f"SELECT 'pq_adc_rerank', CAST({nc} AS BIGINT), "
            f"CAST({rr} AS BIGINT), 'l2', "
            f"(SELECT COUNT(*) FROM pq{nc}_{rr}_short), "
            f"(SELECT COUNT(*) FROM pq{nc}_{rr}_top t JOIN gt_l2 g "
            f"ON g.qid = t.qid AND g.vec_id = t.vec_id)")
    union = "\n      UNION ALL\n      ".join(rows)
    recall = duck_round_ratio("n_hits", f"{ANN_K} * n_queries", 6)
    return f"""{base}{"".join(parts)},
    report AS (
      {union}
    )
    SELECT variant, p1, p2, metric, CAST({ANN_K} AS BIGINT) AS k,
           nq.n_queries, CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_hits AS BIGINT) AS n_hits,
           {recall} AS recall_at_k
    FROM report CROSS JOIN nq
    """


@register(
    "ann_param_sweep",
    oracle=_duck_sweep_sql(),
    tags=("similarity", "ann", "X15", "report", "sweep"),
)
def ann_param_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See module docstring. One row per grid point: total candidate
    count across the query set (cost) + exact-integer recall@k
    against metric-matched brute-force ground truth."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"))
    qs = (e.filter(F.col("vec_id") % SWEEP_QUERY_MOD == 0)
          .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv")))
    nq = qs.agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
    l2 = ("round(aggregate(zip_with(v, qv, (x, y) -> (x - y) * (x - y)),"
          " 0D, (acc, t) -> acc + t), 6)")
    scored = (e.crossJoin(F.broadcast(qs))
              .filter(F.col("vec_id") != F.col("qid"))
              .select("qid", "vec_id",
                      F.expr(_spark_cos("v", "qv", 6)).alias("cosine"),
                      F.expr(l2).alias("l2")))
    w_cos = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    w_l2 = Window.partitionBy("qid").orderBy(F.asc("l2"), F.asc("vec_id"))
    gt_cos = (scored.withColumn("rk", F.row_number().over(w_cos))
              .filter(F.col("rk") <= ANN_K).select("qid", "vec_id"))
    gt_l2 = (scored.withColumn("rk", F.row_number().over(w_l2))
             .filter(F.col("rk") <= ANN_K).select("qid", "vec_id"))

    def topk_by(cand: DataFrame, metric_window) -> DataFrame:
        return (cand.join(scored, ["qid", "vec_id"])
                .withColumn("rk", F.row_number().over(metric_window))
                .filter(F.col("rk") <= ANN_K).select("qid", "vec_id"))

    def row(variant: str, p1: int, p2: int, metric: str,
            cand: DataFrame, top: DataFrame, gt: DataFrame) -> DataFrame:
        ncand = cand.agg(F.count(F.lit(1)).cast("long")
                         .alias("n_candidates"))
        nhits = (top.join(gt, ["qid", "vec_id"])
                 .agg(F.count(F.lit(1)).cast("long").alias("n_hits")))
        return (ncand.crossJoin(nhits).crossJoin(nq)
                .select(F.lit(variant).alias("variant"),
                        F.lit(p1).cast("long").alias("p1"),
                        F.lit(p2).cast("long").alias("p2"),
                        F.lit(metric).alias("metric"),
                        F.lit(ANN_K).cast("long").alias("k"),
                        "n_queries", "n_candidates", "n_hits",
                        spark_round_ratio("n_hits",
                                          f"{ANN_K} * n_queries", 6)
                        .alias("recall_at_k")))

    out: list[DataFrame] = []

    # IVF: one assignment pass, per-query centroid ranking, nprobe cuts
    cents = (e.filter(F.col("vec_id") % 53 == 1)
             .select(F.col("vec_id").alias("cent_id"),
                     F.col("v").alias("cv")))
    wv = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_vc"), F.asc("cent_id"))
    assign = (e.crossJoin(F.broadcast(cents))
              .withColumn("cos_vc", F.expr(_spark_cos("v", "cv", 9)))
              .withColumn("rk", F.row_number().over(wv))
              .filter(F.col("rk") == 1).select("vec_id", "cent_id"))
    wq = Window.partitionBy("qid").orderBy(F.desc("cos_qc"), F.asc("cent_id"))
    qc = (cents.crossJoin(F.broadcast(qs))
          .withColumn("cos_qc", F.expr(_spark_cos("cv", "qv", 9)))
          .withColumn("crk", F.row_number().over(wq))
          .select("qid", "cent_id", "crk"))
    for n in IVF_SWEEP:
        cand = (assign.join(qc.filter(F.col("crk") <= n)
                            .select("qid", "cent_id"), "cent_id")
                .filter(F.col("vec_id") != F.col("qid"))
                .select("qid", "vec_id"))
        out.append(row("ivf", n, 0, "cosine",
                       cand, topk_by(cand, w_cos), gt_cos))

    # RP-LSH multiprobe: one projection pass, per-plane-count folds,
    # Hamming-radius probes (bit_count of bucket XOR)
    planes = spark.range(8).select(F.col("id").cast("int").alias("j"))
    pdot = ("aggregate(transform(sequence(1, size(v)),"
            " d -> element_at(v, d)"
            "      * (cast(((j * 64 + d) * 2654435761) % 1000 as double)"
            "         / 500.0 - 1.0)),"
            " 0D, (a, b) -> a + b)")
    dots = (e.crossJoin(F.broadcast(planes))
            .select("vec_id", "j", F.expr(pdot).alias("dot")))
    bucks = {}
    for p in sorted({pl for pl, _ in RP_SWEEP}):
        bucks[p] = (dots.filter(F.col("j") < p).groupBy("vec_id")
                    .agg(F.sum(F.when(F.col("dot") > 0,
                                      F.pow(F.lit(2), F.col("j"))
                                      .cast("long"))
                               .otherwise(F.lit(0)))
                         .cast("long").alias("bucket")))
    for p, h in RP_SWEEP:
        qb = (qs.select("qid")
              .join(bucks[p].withColumnRenamed("vec_id", "qid"), "qid")
              .withColumnRenamed("bucket", "qbucket"))
        cand = (bucks[p].crossJoin(F.broadcast(qb))
                .filter((F.expr("bit_count(bucket ^ qbucket)") <= h)
                        & (F.col("vec_id") != F.col("qid")))
                .select("qid", "vec_id"))
        out.append(row("rp_multiprobe", p, h, "cosine",
                       cand, topk_by(cand, w_cos), gt_cos))

    # PQ: one sub-distance table for the largest codebook; smaller
    # books are prefix cuts (crk <= ncode); shortlist depth sweeps
    seeds0 = (e.orderBy("vec_id").limit(max(_PQ_NCODES))
              .select(F.col("vec_id").alias("code"), F.col("v").alias("sv")))
    # rank-within-seeds without a global window (the codebook is 64
    # rows — a broadcast triangular self-join, never a one-task sort)
    codes = seeds0.select("code")
    crk = (codes.join(F.broadcast(codes.withColumnRenamed("code", "c2")),
                      F.col("c2") <= F.col("code"))
           .groupBy("code").agg(F.count(F.lit(1)).cast("int").alias("crk")))
    seeds = seeds0.join(F.broadcast(crk), "code")
    subs = spark.range(8).select(F.col("id").cast("int").alias("s"))
    cb = (seeds.crossJoin(F.broadcast(subs))
          .select("s", "code", "crk",
                  F.expr("slice(sv, 8*s+1, 8)").alias("c")))
    subdist = ("aggregate(zip_with(slice({v}, 8*s+1, 8), c,"
               " (x, y) -> (x - y) * (x - y)),"
               " 0D, (acc, t) -> acc + t)")
    dv = (e.crossJoin(F.broadcast(cb))
          .select("vec_id", "s", "code", "crk",
                  F.expr(subdist.format(v="v")).alias("dv")))
    dqt = (qs.crossJoin(F.broadcast(cb))
           .select("qid", "s", "code", "crk",
                   F.expr(subdist.format(v="qv")).alias("dq")))
    chain = None
    for i in range(8):
        term = F.max(F.when(F.col("s") == i, F.col("dq")))
        chain = term if chain is None else chain + term
    adcs = {}
    for nc in _PQ_NCODES:
        wenc = Window.partitionBy("vec_id", "s").orderBy("dv", "code")
        enc = (dv.filter(F.col("crk") <= nc)
               .withColumn("rn", F.row_number().over(wenc))
               .filter(F.col("rn") == 1).select("vec_id", "s", "code"))
        adcs[nc] = (enc.join(F.broadcast(
                        dqt.filter(F.col("crk") <= nc)
                        .select("qid", "s", "code", "dq")),
                        ["s", "code"])
                    .filter(F.col("vec_id") != F.col("qid"))
                    .groupBy("qid", "vec_id")
                    .agg(F.round(chain, 6).alias("approx")))
    w_adc = Window.partitionBy("qid").orderBy("approx", "vec_id")
    for nc, rr in PQ_SWEEP:
        short = (adcs[nc].withColumn("rk", F.row_number().over(w_adc))
                 .filter(F.col("rk") <= rr).select("qid", "vec_id"))
        out.append(row("pq_adc_rerank", nc, rr, "l2",
                       short, topk_by(short, w_l2), gt_l2))

    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res
