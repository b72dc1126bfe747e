"""The 8values survey pipeline — reference entry point #3
(`run_8values_survey.py`, SURVEY §3.3) composed end-to-end from this
engine's operators:

    seed (cross join x anti join)                      J8 + J4
    -> RAG retrieval: chunk -> embed -> cosine top-k   F9/F6/F5
    -> answer (external LLM; deterministic fake here)  F6
    -> parse_answer fallback chain                     F7
    -> axis scores                                     A11

Each stage is an engine operator used elsewhere; this module is the
composition, mirroring the reference's per-run loop as one declarative
pipeline (no task queue, no FOR UPDATE SKIP LOCKED — the driver
schedules; incremental = anti-join of done).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transcript_analysis_spark.operators.chunking import token_bounded_chunks
from transcript_analysis_spark.operators.external import (
    DeterministicFakeTransport, embed_documents)

TOP_K = 6  # run_8values_survey.py:572 (--top-k default)


def seed_runs(docs: DataFrame, modes: list[str],
              done: DataFrame | None = None) -> DataFrame:
    """Expected-work seeding: modes x documents, minus already-done
    (reference `run_8values_survey.py:468-504`: INSERT ... ON CONFLICT
    DO NOTHING becomes crossJoin + left_anti)."""
    spark = docs.sparkSession
    mode_df = spark.createDataFrame([(m,) for m in modes], ["mode"])
    runs = (docs.select("doc_id").distinct()
            .crossJoin(F.broadcast(mode_df))
            .withColumn("run_id",
                        F.concat_ws("_", F.col("mode"), F.col("doc_id"))))
    if done is not None:
        runs = runs.join(done, ["run_id"], "left_anti")
    return runs


def rag_top_chunks(docs: DataFrame, question: str,
                   top_k: int = TOP_K) -> DataFrame:
    """Transcript-RAG context retrieval (reference
    `get_vid_chunks` + `cosine_top_k`, `run_8values_survey.py:269-288`):
    chunk every doc, embed chunks and the question through the
    external-service operator, take the per-doc cosine top-k.

    The question vector is computed once and broadcast (the
    reference's question-vector cache, :345-349, for free)."""
    spark = docs.sparkSession
    chunks = token_bounded_chunks(docs)
    # Composite chunk key as a delimited STRING — a packed numeric key
    # (doc_id*1000+chunk) silently collides once a document exceeds
    # 1000 chunks, which a 2-hour transcript can.
    chunk_docs = chunks.select(
        F.concat_ws(":", F.col("doc_id"), F.col("chunk_index"))
         .alias("doc_id"),
        F.col("text"))
    embedded = embed_documents(
        chunk_docs, hosts=["fake-host"],
        transport_factory=lambda: DeterministicFakeTransport())
    q_df = spark.createDataFrame([("q", question)], ["doc_id", "text"])
    q_vec = embed_documents(
        q_df, hosts=["fake-host"],
        transport_factory=lambda: DeterministicFakeTransport()
    ).select(F.col("embedding").alias("qv"))
    dot = "aggregate(zip_with(embedding, qv, (x, y) -> x * y), 0D, (a, x) -> a + x)"
    nv = "aggregate(zip_with(embedding, embedding, (x, y) -> x * y), 0D, (a, x) -> a + x)"
    nq = "aggregate(zip_with(qv, qv, (x, y) -> x * y), 0D, (a, x) -> a + x)"
    scored = (
        embedded.crossJoin(F.broadcast(q_vec))
        .select(
            F.split("doc_id", ":").getItem(0).cast("long").alias("doc_id"),
            F.split("doc_id", ":").getItem(1).cast("int").alias("chunk_index"),
            F.round(F.expr(dot) / (F.sqrt(F.expr(nv)) * F.sqrt(F.expr(nq))), 6)
             .alias("sim")))
    from pyspark.sql import Window
    w = Window.partitionBy("doc_id").orderBy(F.desc("sim"), F.asc("chunk_index"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= top_k)
            .drop("rk"))


def fake_llm_answer(runs_with_context: DataFrame) -> DataFrame:
    """Deterministic stand-in for the Ollama chat call: answer text
    embeds a JSON fragment derived from the run key (so the parse
    chain downstream is exercised on realistic-shaped text)."""
    return runs_with_context.withColumn(
        "llm_out",
        F.concat(F.lit('The assistant replies: {"answer": '),
                 (F.crc32(F.concat_ws("#", "run_id", "question_id")) % 5 + 1)
                  .cast("string"),
                 F.lit(', "confidence": 0.8}')))


def parse_answers(responses: DataFrame) -> DataFrame:
    """F7 parse chain (reference `parse_answer`,
    `run_8values_survey.py:222-262`): JSON object -> bare digit ->
    Neutral(3). `answer_source` records which rung matched ('json' |
    'digit' | 'default') — 'default' is the refusal/unparseable case
    the ROADMAP's calibration read-out counts per model."""
    ext = responses.withColumns({
        "json_str": F.regexp_extract("llm_out", r"\{[^}]*\}", 0),
        "digit_str": F.regexp_extract("llm_out", r"([1-5])", 1),
    })
    json_ans = F.when(
        F.col("json_str") != "",
        F.get_json_object("json_str", "$.answer").cast("long"))
    digit_ans = F.when(F.col("digit_str") != "",
                       F.col("digit_str").cast("long"))
    return (ext
            .withColumn("answer",
                        F.coalesce(json_ans, digit_ans, F.lit(3)))
            .withColumn("answer_source",
                        F.when(json_ans.isNotNull(), "json")
                         .when(digit_ans.isNotNull(), "digit")
                         .otherwise("default"))
            .drop("json_str", "digit_str"))


def axis_scores(answers: DataFrame, questions: DataFrame) -> DataFrame:
    """A11 reduction (reference `compute_axis_scores`,
    `run_8values_survey.py:306-324`) over parsed answers x question
    effect vectors; answer 1..5 -> multiplier {1,.5,0,-.5,-1}."""
    mult = (3 - F.col("answer")) / F.lit(2.0)
    joined = (answers.join(F.broadcast(questions), "question_id")
              .withColumn("mult", mult))
    agg = joined.groupBy("run_id").agg(
        *[F.sum(F.col(f"effect_{ax}") * F.col("mult")).alias(f"raw_{ax}")
          for ax in ("econ", "dipl", "govt", "scty")],
        *[F.sum(F.abs(F.col(f"effect_{ax}"))).alias(f"max_{ax}")
          for ax in ("econ", "dipl", "govt", "scty")])
    cols = [F.col("run_id")]
    for ax in ("econ", "dipl", "govt", "scty"):
        m, r = F.col(f"max_{ax}"), F.col(f"raw_{ax}")
        cols.append(F.when(m == 0, F.lit(50.0))
                    .otherwise(F.round(100 * (m + r) / (2 * m), 3))
                    .alias(f"score_{ax}"))
    return agg.select(*cols)


def survey_questions(spark: SparkSession, n_questions: int = 10) -> DataFrame:
    """Deterministic stand-in question bank with 4-axis effect vectors
    (shape of the reference's questions table, `run_8values_survey.py`
    §3.3)."""
    return spark.createDataFrame(
        [(q, f"Question {q}?",
          ((q * 7) % 9) - 4, ((q * 7 + 3) % 9) - 4,
          ((q * 7 + 6) % 9) - 4, ((q * 7 + 9) % 9) - 4)
         for q in range(n_questions)],
        ["question_id", "question_text",
         "effect_econ", "effect_dipl", "effect_govt", "effect_scty"])


def run_survey(spark: SparkSession, sf_dir: str,
               n_questions: int = 10,
               modes: list[str] = ("baseline", "transcript")) -> DataFrame:
    """End-to-end survey over the documents corpus: per (mode, doc)
    run, answer each question (RAG context in transcript mode), parse,
    reduce to 4-axis scores."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    questions = survey_questions(spark, n_questions)
    runs = seed_runs(docs, list(modes))
    pairs = runs.crossJoin(F.broadcast(questions.select("question_id")))
    responses = fake_llm_answer(pairs)
    answers = parse_answers(responses)
    return axis_scores(answers, questions)


FOR_PREFIX = "I strongly believe that "        # build_succinct_probes.py:26
AGAINST_PREFIX = "I strongly oppose the idea that "  # :27


def build_succinct_probes(questions: DataFrame,
                          text_col: str = "question_text") -> DataFrame:
    """Deterministic succinct probe statements (reference
    `build_succinct_probes.py:28-40`): lowercase the question, prepend
    the fixed stance phrases — no LLM."""
    q = F.lower(F.col(text_col))
    return questions.withColumns({
        "probe_for": F.concat(F.lit(FOR_PREFIX), q),
        "probe_against": F.concat(F.lit(AGAINST_PREFIX), q),
    })


# --- full §3.3 loop over real HTTP transports ----------------------------

def rag_contexts(docs: DataFrame, questions: DataFrame,
                 hosts: list[str], transport_factory,
                 top_k: int = TOP_K) -> DataFrame:
    """Per-(doc, question) RAG context over an external embedding
    service: chunk and embed the corpus ONCE, embed the question bank
    once, broadcast the (small) question vectors against the chunk
    vectors, take the per-(doc, question) cosine top-k, and concatenate
    the winning chunk texts rank-ordered. One embed pass however many
    questions — the reference re-queries pgvector per question
    (`run_8values_survey.py:269-288`); here the question side is the
    broadcast side so the big chunk relation never moves twice."""
    from pyspark.sql import Window

    from transcript_analysis_spark.operators.external import embed_documents

    chunks = token_bounded_chunks(docs)
    chunk_docs = chunks.select(
        F.concat_ws(":", F.col("doc_id"), F.col("chunk_index"))
         .alias("doc_id"),
        F.col("text"))
    embedded = (embed_documents(chunk_docs, hosts=hosts,
                                transport_factory=transport_factory)
                .join(chunk_docs.withColumnRenamed("text", "chunk_text"),
                      "doc_id"))
    q_vecs = (embed_documents(
        questions.select(
            F.col("question_id").cast("string").alias("doc_id"),
            F.col("question_text").alias("text")),
        hosts=hosts, transport_factory=transport_factory)
        .select(F.col("doc_id").cast("long").alias("question_id"),
                F.col("embedding").alias("qv")))
    dot = "aggregate(zip_with(embedding, qv, (x, y) -> x * y), 0D, (a, x) -> a + x)"
    nv = "aggregate(zip_with(embedding, embedding, (x, y) -> x * y), 0D, (a, x) -> a + x)"
    nq = "aggregate(zip_with(qv, qv, (x, y) -> x * y), 0D, (a, x) -> a + x)"
    scored = (embedded.crossJoin(F.broadcast(q_vecs))
              .select(
                  F.split("doc_id", ":").getItem(0).cast("long").alias("doc_id"),
                  F.split("doc_id", ":").getItem(1).cast("int").alias("chunk_index"),
                  "question_id", "chunk_text",
                  F.round(F.expr(dot) / (F.sqrt(F.expr(nv)) * F.sqrt(F.expr(nq))), 6)
                   .alias("sim")))
    w = (Window.partitionBy("doc_id", "question_id")
         .orderBy(F.desc("sim"), F.asc("chunk_index")))
    topk = (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= top_k))
    return (topk.groupBy("doc_id", "question_id")
            .agg(F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rk", "chunk_text"))),
                    lambda s: s["chunk_text"])).alias("context")))


def build_prompts(runs: DataFrame, questions: DataFrame,
                  contexts: DataFrame | None = None) -> DataFrame:
    """(run x question) prompts: transcript-mode runs carry their
    doc's RAG context, baseline runs the bare question — the prompt
    assembly of `answer_one_question` (`run_8values_survey.py:330-352`)
    as one declarative plan. Deterministic by construction so an
    oracle/test can rebuild byte-identical prompts."""
    pairs = runs.crossJoin(
        F.broadcast(questions.select("question_id", "question_text")))
    if contexts is not None:
        pairs = pairs.join(contexts, ["doc_id", "question_id"], "left")
    else:
        pairs = pairs.withColumn("context", F.lit(None).cast("string"))
    use_ctx = (F.col("mode") == "transcript") & F.col("context").isNotNull()
    return pairs.select(
        "run_id", "question_id", "mode", "doc_id",
        F.when(use_ctx,
               F.concat(F.lit("["), F.col("mode"), F.lit("] "),
                        F.col("question_text"),
                        F.lit(" || context: "), F.col("context")))
         .otherwise(F.concat(F.lit("["), F.col("mode"), F.lit("] "),
                             F.col("question_text")))
         .alias("prompt"))


def run_survey_http(spark: SparkSession, sf_dir: str,
                    hosts: list[str],
                    embed_transport_factory,
                    chat_transport_factory,
                    n_questions: int = 5,
                    modes: list[str] = ("baseline", "transcript"),
                    top_k: int = TOP_K,
                    max_docs: int | None = None) -> DataFrame:
    """The reference's full §3.3 survey loop
    (`run_8values_survey.py:416-436`) over REAL transports: seed ->
    RAG top-k contexts (embedding service) -> LLM answer (generate
    service) -> parse chain -> axis scores. Transport factories are
    injected (urllib Ollama transports in the socket-level integration
    test; any callable with the same shape in production), and both
    service stages inherit the round-robin failover / bounded-retry
    policy of the external operators."""
    from transcript_analysis_spark.operators.external import chat_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if max_docs is not None:
        docs = docs.orderBy("doc_id").limit(max_docs)
    questions = survey_questions(spark, n_questions)
    runs = seed_runs(docs, list(modes))
    contexts = rag_contexts(docs, questions, hosts,
                            embed_transport_factory, top_k)
    prompts = build_prompts(runs, questions, contexts).withColumn(
        "chat_key", F.concat_ws("|", "run_id", "question_id"))
    responses = chat_documents(
        prompts.select("chat_key", "prompt"), hosts=hosts,
        transport_factory=chat_transport_factory,
        prompt_col="prompt", id_col="chat_key")
    answered = (prompts.join(
        responses.withColumnRenamed("doc_id", "chat_key"), "chat_key")
        .select("run_id", "question_id",
                F.coalesce(F.col("response"), F.lit("")).alias("llm_out")))
    answers = parse_answers(answered)
    return axis_scores(answers, questions)


def calibration_report(answers: DataFrame) -> DataFrame:
    """The ROADMAP Workstream-3 calibration read-out ("per model,
    baseline lean + probe swing (for vs against) + refusal rate →
    choose the model(s) to trust for the transcript pass"): one
    grouped aggregate over parsed answers carrying (model, mode,
    answer, answer_source).

    - baseline_lean: mean answer in 'baseline' mode (1..5; 3 =
      neutral) — the model's unprompted position;
    - probe swing: mean('probe_for') - mean('probe_against'),
      computed as one exact rational over the common denominator — a
      steerable model swings strongly positive; a stuck one reads the
      same either way;
    - refusal_rate: share of answers that fell through the parse
      chain to the Neutral default ('default' answer_source).

    All ratios are exact-integer half-up rounded; empty modes report
    0.0 rather than dividing by zero. Driver-sized output (one row
    per model)."""
    from transcript_analysis_spark.functions.rounding import (
        spark_round_ratio, spark_round_ratio_wide)

    def mode_sum(mode: str) -> F.Column:
        return F.sum(F.when(F.col("mode") == mode, F.col("answer"))
                     .otherwise(0)).cast("long")

    def mode_n(mode: str) -> F.Column:
        return F.sum(F.when(F.col("mode") == mode, 1)
                     .otherwise(0)).cast("long")

    per = answers.groupBy("model").agg(
        mode_sum("baseline").alias("base_sum"),
        mode_n("baseline").alias("base_n"),
        mode_sum("probe_for").alias("for_sum"),
        mode_n("probe_for").alias("for_n"),
        mode_sum("probe_against").alias("against_sum"),
        mode_n("probe_against").alias("against_n"),
        F.sum(F.when(F.col("answer_source") == "default", 1)
              .otherwise(0)).cast("long").alias("n_refused"),
        F.count(F.lit(1)).cast("long").alias("n_answers"))

    def safe_mean(s: str, n: str) -> F.Column:
        return F.when(F.col(n) == 0, F.lit(0.0)).otherwise(
            spark_round_ratio(s, n, 4))

    # The swing is ONE exact rational on the raw sums —
    # (for_sum/for_n) - (against_sum/against_n) over the common
    # denominator — rounded once, never a float subtraction of two
    # already-rounded doubles (representation error near .00005
    # boundaries could flip the last digit; r8 advice item). An empty
    # mode contributes its guarded 0.0 mean.
    swing = (
        F.when((F.col("for_n") == 0) & (F.col("against_n") == 0),
               F.lit(0.0))
        .when(F.col("for_n") == 0,
              spark_round_ratio("-against_sum", "against_n", 4))
        .when(F.col("against_n") == 0,
              spark_round_ratio("for_sum", "for_n", 4))
        .otherwise(spark_round_ratio_wide(
            # Cross-multiplied products can exceed int64 once per-mode
            # answer counts reach ~1e7 (5*n^2*2e4 > 9.2e18); run the
            # whole rational in DECIMAL(38,0) per the rounding module's
            # caller contract (first factor cast wide so the multiply
            # itself is 128-bit).
            "cast(for_sum as decimal(38,0)) * against_n"
            " - cast(against_sum as decimal(38,0)) * for_n",
            "cast(for_n as decimal(38,0)) * against_n", 4)))

    return per.select(
        "model", "n_answers", "n_refused",
        safe_mean("base_sum", "base_n").alias("baseline_lean"),
        safe_mean("for_sum", "for_n").alias("mean_for"),
        safe_mean("against_sum", "against_n").alias("mean_against"),
        swing.alias("probe_swing"),
        spark_round_ratio("n_refused", "n_answers", 4)
         .alias("refusal_rate"))
