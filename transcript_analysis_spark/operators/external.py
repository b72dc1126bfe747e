"""External-service operators (SURVEY §2.1 S10, §2.10 F6).

The reference calls Ollama chat/embedding endpoints from worker
threads with a multi-host pool, probe, round-robin failover, and
bounded retries (`run_8values_survey.py:155-186,354-371`;
`embed_transcripts_to_vector_db.py:91-237`). The Spark-native form is
`mapInPandas`: each partition opens one client, batches requests, and
applies the same retry/failover policy — so concurrency is governed by
partition count, not hand-managed threads.

No network service exists in this environment, so the transport is an
injectable callable; `DeterministicFakeTransport` stands in for tests
(and mirrors the reference's own FakeModel test strategy,
`test_support.py:85-90`). These operators are deliberately NOT in the
oracle-checked query set (nondeterministic in production — SURVEY
§7.3 keeps external-service ops out of the oracle surface).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (ArrayType, DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType)

EMBED_DIM = 8

# The id travels as a STRING so any key shape — long doc_id or a
# composite like "doc:chunk" — passes through without lossy packing
# (a numeric doc_id*1000+chunk scheme silently aliases keys once a
# document exceeds 1000 chunks).
EMBED_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("embedding", ArrayType(DoubleType())),
    StructField("host", StringType()),
    StructField("attempts", IntegerType()),
])


class TransportError(Exception):
    pass


class DeterministicFakeTransport:
    """Stands in for an embedding/LLM HTTP endpoint: deterministic
    vectors from a content hash; optionally fails every Nth call to
    exercise retry/failover."""

    def __init__(self, fail_every: int = 0):
        self.fail_every = fail_every
        self.calls = 0

    def __call__(self, host: str, text: str) -> list[float]:
        self.calls += 1
        if self.fail_every and self.calls % self.fail_every == 0:
            raise TransportError(f"simulated failure from {host}")
        h = hashlib.sha256(text.encode("utf-8")).digest()
        return [round(b / 255.0, 6) for b in h[:EMBED_DIM]]


def embed_documents(docs: DataFrame,
                    hosts: list[str],
                    transport_factory: Callable[[], Callable[[str, str], list[float]]],
                    text_col: str = "text",
                    id_col: str = "doc_id",
                    max_retries: int = 5) -> DataFrame:
    """Batched external embedding with round-robin host failover and
    bounded retries (policy mirrored from `answer_one_question`,
    `run_8values_survey.py:354-371`: retry <= max_retries, rotate
    hosts, then give up -> null row, never crash the job)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        transport = transport_factory()   # one client per partition
        rr = 0
        for pdf in batches:
            ids, vecs, used_hosts, attempts = [], [], [], []
            for _, row in pdf.iterrows():
                vec, host_used, tries = None, None, 0
                for attempt in range(max_retries):
                    host = hosts[rr % len(hosts)]
                    rr += 1
                    tries = attempt + 1
                    try:
                        vec = transport(host, row[text_col])
                        host_used = host
                        break
                    except TransportError:
                        continue
                ids.append(row[id_col])
                vecs.append(vec)
                used_hosts.append(host_used)
                attempts.append(tries)
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="object"),
                "embedding": vecs,
                "host": used_hosts,
                "attempts": pd.Series(attempts, dtype="int32"),
            })

    from pyspark.sql import functions as F
    return (docs.select(F.col(id_col).cast("string").alias(id_col), text_col)
            .mapInPandas(run, EMBED_SCHEMA))


CHAT_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("response", StringType()),
    StructField("host", StringType()),
    StructField("attempts", IntegerType()),
])


def chat_documents(docs: DataFrame,
                   hosts: list[str],
                   transport_factory: Callable[[], Callable[[str, str], str]],
                   prompt_col: str = "prompt",
                   id_col: str = "doc_id",
                   max_retries: int = 5) -> DataFrame:
    """Batched external LLM chat — the F6 generate half of the
    Ollama client (reference `answer_one_question`,
    `run_8values_survey.py:354-371`) with the same round-robin host
    failover / bounded-retry policy as :func:`embed_documents`:
    rotate hosts per attempt, give up after `max_retries` -> null
    response row, never crash the job. One transport per partition;
    concurrency is partition count, exactly like the embed operator."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        transport = transport_factory()
        rr = 0
        for pdf in batches:
            ids, outs, used_hosts, attempts = [], [], [], []
            for _, row in pdf.iterrows():
                out, host_used, tries = None, None, 0
                for attempt in range(max_retries):
                    host = hosts[rr % len(hosts)]
                    rr += 1
                    tries = attempt + 1
                    try:
                        out = transport(host, row[prompt_col])
                        host_used = host
                        break
                    except TransportError:
                        continue
                ids.append(row[id_col])
                outs.append(out)
                used_hosts.append(host_used)
                attempts.append(tries)
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="object"),
                "response": pd.Series(outs, dtype="object"),
                "host": used_hosts,
                "attempts": pd.Series(attempts, dtype="int32"),
            })

    from pyspark.sql import functions as F
    return (docs.select(F.col(id_col).cast("string").alias(id_col), prompt_col)
            .mapInPandas(run, CHAT_SCHEMA))
