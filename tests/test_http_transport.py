"""The stdlib urllib reference transports, driven end-to-end against a
local http.server fake (VERDICT r5 item 6): the REAL clients must
exercise the operators' retry / failover / fallback policies exactly
as the deterministic fakes do. No external network is touched."""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from transcript_analysis_spark.operators.external import (TransportError,
                                                          embed_documents)
from transcript_analysis_spark.operators.http_transport import (
    OllamaChatTransport,
    OllamaEmbedTransport,
    UrlTubeTransport,
    http_json,
    parse_iso8601_duration_sec,
)
from transcript_analysis_spark.sources.ingest import (
    PlaylistNotFoundError,
    QuotaExhaustedError,
    list_channel_videos,
)


class _Handler(BaseHTTPRequestHandler):
    """Fake Ollama + YouTube Data API in one server.

    Path prefix `/fail` -> 500 on everything (a dead host for
    failover tests). Playlist 'PL404' -> 404. Query `key=quota` ->
    403. State (call counts) lives on the server object."""

    def log_message(self, *a):   # silence request logging
        pass

    def _send(self, code: int, payload: dict | str):
        body = (json.dumps(payload) if isinstance(payload, dict)
                else payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        if self.path.startswith("/fail"):
            return self._send(500, {"error": "simulated outage"})
        n = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(n) or b"{}")
        if self.path == "/api/embed":
            text = payload.get("input", "")
            vec = [round((ord(c) % 10) / 10.0, 1) for c in text[:4]]
            return self._send(200, {"embeddings": [vec]})
        if self.path == "/api/embed-legacy":
            return self._send(200, {"embedding": [0.5, 0.25]})
        if self.path == "/api/generate":
            return self._send(200, {"response": "ANSWER: agree"})
        if self.path == "/api/badjson":
            return self._send(200, "this is not json {")
        if self.path == "/api/notdict":
            return self._send(200, "[]")
        return self._send(404, {"error": "no such endpoint"})

    def do_GET(self):
        parsed = urllib.parse.urlparse(self.path)
        q = dict(urllib.parse.parse_qsl(parsed.query))
        if q.get("key") == "quota":
            return self._send(403, {"error": "quotaExceeded"})
        if parsed.path.endswith("/playlistItems"):
            pid = q.get("playlistId", "")
            if pid == "PL404":
                return self._send(404, {"error": "playlistNotFound"})
            token = q.get("pageToken")
            if token is None:
                return self._send(200, {
                    "items": [{"contentDetails": {"videoId": f"{pid}_v{i}"}}
                              for i in range(3)],
                    "nextPageToken": "p2"})
            return self._send(200, {
                "items": [{"contentDetails": {"videoId": f"{pid}_v{i}"}}
                          for i in range(3, 5)]})
        if parsed.path.endswith("/search"):
            cid = q.get("channelId", "")
            return self._send(200, {
                "items": [{"id": {"videoId": f"{cid}_s{i}"}}
                          for i in range(2)]})
        if parsed.path.endswith("/videos"):
            ids = q.get("id", "").split(",")
            return self._send(200, {"items": [
                {"id": v,
                 "snippet": {"title": f"T {v}",
                             "publishedAt": "2024-03-01T00:00:00Z"},
                 "contentDetails": {"duration": "PT1H2M3S"}}
                for v in ids if v]})
        return self._send(404, {"error": "no such endpoint"})


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


# --- generic client ------------------------------------------------------

def test_http_json_maps_every_failure_to_transport_error(server):
    with pytest.raises(TransportError) as e:
        http_json(f"http://{server}/fail/api/embed", {"x": 1})
    assert e.value.status == 500
    with pytest.raises(TransportError) as e:
        http_json(f"http://{server}/api/badjson", {"x": 1})
    assert e.value.status is None
    with pytest.raises(TransportError):
        http_json("http://127.0.0.1:9/nothing", timeout=0.5)  # closed port
    # valid JSON that is not an object must also stay inside the
    # TransportError contract (no AttributeError escaping into tasks)
    with pytest.raises(TransportError, match="non-object"):
        http_json(f"http://{server}/api/notdict", {"x": 1})


def test_ollama_shapes_and_malformed(server):
    emb = OllamaEmbedTransport(model="m")
    assert emb(server, "abcd") == [round((ord(c) % 10) / 10.0, 1)
                                   for c in "abcd"]
    chat = OllamaChatTransport(model="m")
    assert chat(server, "Q?") == "ANSWER: agree"
    # legacy single-embedding shape
    legacy = OllamaEmbedTransport()
    out = http_json(f"http://{server}/api/embed-legacy", {})
    assert out["embedding"] == [0.5, 0.25]
    # 404 endpoint -> TransportError (engages retry, never crashes)
    with pytest.raises(TransportError):
        emb(f"{server}/fail", "x")
    assert parse_iso8601_duration_sec("PT1H2M3S") == 3723
    assert parse_iso8601_duration_sec("garbage") == 0


# --- failover through the real operator ---------------------------------

def test_embed_documents_fails_over_to_healthy_host(spark, server):
    """The real urllib client, driven by embed_documents' round-robin
    retry policy from inside mapInPandas workers: the first host is a
    dead endpoint (HTTP 500), the second is healthy — every row must
    land on the healthy host with attempts > 1."""
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "bbbb"), (3, "cccc")],
        "doc_id long, text string").coalesce(1)
    out = embed_documents(
        docs,
        hosts=[f"{server}/fail", server],
        transport_factory=lambda: OllamaEmbedTransport(model="m"),
    ).collect()
    assert len(out) == 3
    for r in sorted(out, key=lambda r: r.doc_id):
        assert r.host == server          # never the dead host
        assert r.attempts == 2           # exactly one failover hop
        assert r.embedding and all(0 <= x <= 1 for x in r.embedding)


# --- YouTube surface through the real ingest control plane --------------

def test_tube_transport_pagination_and_fallbacks(spark, server):
    base = f"http://{server}/yt/v3"
    tr = UrlTubeTransport("k", base_url=base)
    # two-page playlist drive through the real ingest control plane
    vids = list_channel_videos(spark, tr, "UCchan").collect()
    assert [r.vid_id for r in vids] == [f"UUchan_v{i}" for i in range(5)]
    # playlist 404 -> PlaylistNotFoundError -> search fallback
    with pytest.raises(PlaylistNotFoundError):
        tr.playlist_page("PL404", None)
    assert [i["videoId"] for i in tr.search_page("UCx", None)["items"]] == \
        ["UCx_s0", "UCx_s1"]
    # 403 -> QuotaExhaustedError (crawl abort semantics)
    with pytest.raises(QuotaExhaustedError):
        UrlTubeTransport("quota", base_url=base).playlist_page("UUy", None)
    # details parse incl. ISO-8601 duration
    d = tr.video_details(["v1", "v2"])
    assert d[0]["title"] == "T v1" and d[0]["duration_sec"] == 3723
    # official API serves no transcripts: NoTranscriptError engages
    # the ingest marker-row path
    from transcript_analysis_spark.sources.ingest import NoTranscriptError
    with pytest.raises(NoTranscriptError):
        tr.transcript("v1")
    with pytest.raises(NoTranscriptError):
        tr.vtt("v1")
