"""8values survey end-to-end over REAL HTTP sockets (r6 verdict #7):
seed -> RAG top-k (urllib embed transport) -> LLM answer (urllib
generate transport) -> parse chain -> axis scores, against a local
http.server fake Ollama — including one dead host in the pool so the
round-robin failover fires mid-survey at the socket level, mirroring
the reference's full §3.3 loop (`run_8values_survey.py:416-436`).
"""

from __future__ import annotations

import hashlib
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from transcript_analysis_spark.operators import eightvalues as ev
from transcript_analysis_spark.operators.http_transport import (
    OllamaChatTransport, OllamaEmbedTransport)

SF_DIR = "/root/testdata/sf0.001"
EMBED_DIM = 8


def _embed_vec(text: str) -> list[float]:
    """The fake server's embedding function — replicated in the test's
    engine-side expectation so HTTP and local pipelines must agree."""
    h = hashlib.sha256(text.encode("utf-8")).digest()
    return [round(b / 255.0, 6) for b in h[:EMBED_DIM]]


def _answer_for(prompt: str) -> int:
    return len(prompt) % 5 + 1


class _Counters:
    def __init__(self):
        self.lock = threading.Lock()
        self.fail = 0
        self.embed = 0
        self.generate = 0

    def bump(self, name):
        with self.lock:
            setattr(self, name, getattr(self, name) + 1)


class _OllamaHandler(BaseHTTPRequestHandler):
    counters: _Counters = None  # set by fixture

    def log_message(self, *a):
        pass

    def _send(self, code, payload):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        if self.path.startswith("/fail"):
            self.counters.bump("fail")
            return self._send(500, {"error": "simulated outage"})
        n = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(n) or b"{}")
        if self.path == "/api/embed":
            self.counters.bump("embed")
            return self._send(
                200, {"embeddings": [_embed_vec(payload.get("input", ""))]})
        if self.path == "/api/generate":
            self.counters.bump("generate")
            ans = _answer_for(payload.get("prompt", ""))
            return self._send(
                200, {"response": f'I think {{"answer": {ans}}} overall.'})
        return self._send(404, {"error": "no such endpoint"})


@pytest.fixture(scope="module")
def ollama_server():
    counters = _Counters()
    _OllamaHandler.counters = counters
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _OllamaHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{srv.server_address[1]}", counters
    srv.shutdown()


def test_survey_end_to_end_over_sockets_with_failover(spark, ollama_server):
    addr, counters = ollama_server
    dead, live = f"{addr}/fail", addr   # path-prefix dead host -> 500s

    got = ev.run_survey_http(
        spark, SF_DIR,
        hosts=[dead, live],
        embed_transport_factory=lambda: OllamaEmbedTransport(),
        chat_transport_factory=lambda: OllamaChatTransport(),
        n_questions=4, max_docs=4, top_k=2,
    ).collect()

    # every (mode, doc) run scored, all four axes in [0, 100]
    assert len(got) == 8    # 4 docs x 2 modes
    for r in got:
        for ax in ("econ", "dipl", "govt", "scty"):
            assert 0.0 <= r[f"score_{ax}"] <= 100.0

    # failover really fired over sockets: the dead host absorbed >= 1
    # request from EACH stage's round-robin, and both live endpoints
    # served the rest of the survey
    assert counters.fail > 0
    assert counters.embed > 0
    assert counters.generate > 0

    # engine-side expectation: rebuild the identical prompts through a
    # LOCAL (no-HTTP) twin of the server's deterministic functions and
    # push the implied answers through the same scoring tail — the
    # HTTP pipeline must agree exactly
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .orderBy("doc_id").limit(4))
    questions = ev.survey_questions(spark, 4)
    # self-contained (no test-module references): executors can't
    # import the test module, so the transport is defined by value
    def local_embed():
        def transport(host, text):
            import hashlib as _h
            d = _h.sha256(text.encode("utf-8")).digest()
            return [round(b / 255.0, 6) for b in d[:8]]
        return transport
    contexts = ev.rag_contexts(docs, questions, hosts=["local"],
                               transport_factory=local_embed, top_k=2)
    runs = ev.seed_runs(docs, ["baseline", "transcript"])
    prompts = ev.build_prompts(runs, questions, contexts)
    expected_answers = prompts.withColumn(
        "answer", F.length("prompt") % 5 + 1)
    want = ev.axis_scores(expected_answers, questions).collect()

    key = lambda r: (r.run_id, r.score_econ, r.score_dipl,
                     r.score_govt, r.score_scty)
    assert sorted(map(key, got)) == sorted(map(key, want))


def test_chat_documents_gives_up_to_null_after_retries(spark, ollama_server):
    """All-dead host pool: the chat operator exhausts its retries and
    emits null responses (never crashes the job) — same give-up
    contract as the embed operator."""
    from transcript_analysis_spark.operators.external import chat_documents

    addr, _ = ollama_server
    df = spark.createDataFrame([("a", "p1"), ("b", "p2")],
                               ["doc_id", "prompt"])
    out = chat_documents(df, hosts=[f"{addr}/fail"],
                         transport_factory=lambda: OllamaChatTransport(),
                         max_retries=2).collect()
    assert len(out) == 2
    assert all(r.response is None and r.attempts == 2 for r in out)
