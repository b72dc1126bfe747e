"""Reference HTTP transports for the engine's injectable interfaces —
stdlib `urllib` only, zero third-party HTTP dependencies.

The reference ships working network clients (Ollama pool:
`run_8values_survey.py:155-186`; YouTube Data API:
`maintain_database.py:32-107`). This engine keeps every external
operator behind an injectable transport so the distributed plumbing is
testable without a network; this module supplies the production-shaped
implementations of those interfaces so a user does not have to write
the HTTP layer themselves:

- :class:`OllamaEmbedTransport` / :class:`OllamaChatTransport` plug
  into ``operators/external.py`` (``transport(host, text)``), speaking
  Ollama's public ``POST /api/embed`` / ``POST /api/generate`` JSON.
- :class:`UrlTubeTransport` plugs into ``sources/ingest.py``
  (playlist_page / search_page / video_details), speaking the YouTube
  Data API v3 JSON surface, with the reference's error mapping:
  HTTP 403 -> QuotaExhaustedError (abort the crawl), playlist 404 ->
  PlaylistNotFoundError (search fallback).

Every transport failure surfaces as the interface's exception types so
the retry / failover / fallback policies in the calling operators
engage unchanged — proven in tests/test_http_transport.py against a
local ``http.server`` fake (no real network in tests; these classes
are never constructed on an import path the oracle queries touch).

The official Data API serves no transcript bodies (the reference uses
third-party scrapers for that part: `update_missing_transcripts.py`),
so ``transcript``/``vtt`` raise :class:`NoTranscriptError` — callers
fall through to their marker-row path; a production user overrides
just those two methods with their scraper of choice.
"""

from __future__ import annotations

import json
import re
import urllib.error
import urllib.parse
import urllib.request

from transcript_analysis_spark.operators.external import TransportError
from transcript_analysis_spark.sources.ingest import (
    DETAILS_BATCH,
    NoTranscriptError,
    PlaylistNotFoundError,
    QuotaExhaustedError,
)

DEFAULT_TIMEOUT_SEC = 30.0


def http_json(url: str, payload: dict | None = None, *,
              timeout: float = DEFAULT_TIMEOUT_SEC) -> dict:
    """One JSON request (GET when `payload` is None, POST otherwise).
    Every failure mode — connect/timeout, non-2xx, non-JSON body —
    raises :class:`TransportError` carrying ``.status`` (the HTTP code
    or None), so callers can translate specific codes into their
    interface's semantics and generic retry policies treat the rest
    uniformly."""
    data = None if payload is None else json.dumps(payload).encode("utf-8")
    req = urllib.request.Request(
        url, data=data, headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            body = resp.read()
    except urllib.error.HTTPError as exc:
        err = TransportError(f"HTTP {exc.code} from {url}")
        err.status = exc.code
        raise err from exc
    except (urllib.error.URLError, OSError) as exc:
        err = TransportError(f"unreachable {url}: {exc}")
        err.status = None
        raise err from exc
    try:
        out = json.loads(body)
    except ValueError as exc:
        err = TransportError(f"non-JSON body from {url}: {body[:80]!r}")
        err.status = None
        raise err from exc
    if not isinstance(out, dict):
        # a 200 with '"ok"' or '[]' (e.g. an intercepting proxy) must
        # engage the callers' retry policy, not escape as a later
        # AttributeError that crashes the Spark task
        err = TransportError(
            f"non-object JSON from {url}: {type(out).__name__}")
        err.status = None
        raise err
    return out


class OllamaEmbedTransport:
    """``transport(host, text) -> list[float]`` against Ollama's
    public ``POST /api/embed`` (accepts both the modern ``embeddings``
    batch shape and the legacy single ``embedding``). One instance per
    partition via ``transport_factory`` in
    :func:`operators.external.embed_documents`."""

    def __init__(self, model: str = "nomic-embed-text", *,
                 scheme: str = "http",
                 timeout: float = DEFAULT_TIMEOUT_SEC):
        self.model = model
        self.scheme = scheme
        self.timeout = timeout

    def __call__(self, host: str, text: str) -> list[float]:
        out = http_json(f"{self.scheme}://{host}/api/embed",
                        {"model": self.model, "input": text},
                        timeout=self.timeout)
        embs = out.get("embeddings")
        if isinstance(embs, list) and embs and isinstance(embs[0], list):
            return [float(x) for x in embs[0]]
        emb = out.get("embedding")
        if isinstance(emb, list):
            return [float(x) for x in emb]
        raise TransportError(
            f"malformed embed response from {host}: keys={sorted(out)}")


class OllamaChatTransport:
    """``transport(host, prompt) -> str`` against Ollama's public
    ``POST /api/generate`` (non-streaming)."""

    def __init__(self, model: str = "llama3", *,
                 scheme: str = "http",
                 timeout: float = DEFAULT_TIMEOUT_SEC):
        self.model = model
        self.scheme = scheme
        self.timeout = timeout

    def __call__(self, host: str, prompt: str) -> str:
        out = http_json(f"{self.scheme}://{host}/api/generate",
                        {"model": self.model, "prompt": prompt,
                         "stream": False},
                        timeout=self.timeout)
        resp = out.get("response")
        if not isinstance(resp, str):
            raise TransportError(
                f"malformed generate response from {host}: "
                f"keys={sorted(out)}")
        return resp


_ISO_DUR = re.compile(
    r"^P(?:(?P<d>\d+)D)?T?(?:(?P<h>\d+)H)?(?:(?P<m>\d+)M)?(?:(?P<s>\d+)S)?$")


def parse_iso8601_duration_sec(s: str) -> int:
    """YouTube's ``PT#H#M#S`` contentDetails.duration -> seconds
    (0 for unparseable, mirroring the reference's defensive default)."""
    m = _ISO_DUR.match(s or "")
    if not m:
        return 0
    g = {k: int(v) if v else 0 for k, v in m.groupdict().items()}
    return g["d"] * 86400 + g["h"] * 3600 + g["m"] * 60 + g["s"]


class UrlTubeTransport:
    """The ``sources/ingest.py`` transport surface over the YouTube
    Data API v3 JSON endpoints (playlistItems / search / videos).
    `base_url` is injectable so tests point it at a local fake server;
    production uses the public default."""

    def __init__(self, api_key: str, *,
                 base_url: str = "https://www.googleapis.com/youtube/v3",
                 timeout: float = DEFAULT_TIMEOUT_SEC):
        self.api_key = api_key
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def _get(self, resource: str, params: dict) -> dict:
        qs = urllib.parse.urlencode(
            {k: v for k, v in {**params, "key": self.api_key}.items()
             if v is not None})
        try:
            return http_json(f"{self.base_url}/{resource}?{qs}",
                             timeout=self.timeout)
        except TransportError as exc:
            if getattr(exc, "status", None) == 403:
                raise QuotaExhaustedError(str(exc)) from exc
            raise

    @staticmethod
    def _ids(page: dict, kind: str) -> list[dict]:
        # normalize both playlistItems (contentDetails.videoId) and
        # search (id.videoId) shapes into ingest's {"videoId": ...}
        items = []
        for it in page.get("items", []):
            vid = (it.get(kind, {}) or {}).get("videoId")
            if vid:
                items.append({"videoId": vid})
        return items

    def playlist_page(self, playlist_id: str, token: str | None) -> dict:
        try:
            page = self._get("playlistItems", {
                "part": "contentDetails", "playlistId": playlist_id,
                "maxResults": 50, "pageToken": token})
        except TransportError as exc:
            if getattr(exc, "status", None) == 404:
                raise PlaylistNotFoundError(playlist_id) from exc
            raise
        out = {"items": self._ids(page, "contentDetails")}
        if page.get("nextPageToken"):
            out["nextPageToken"] = page["nextPageToken"]
        return out

    def search_page(self, channel_id: str, token: str | None) -> dict:
        page = self._get("search", {
            "part": "id", "channelId": channel_id, "type": "video",
            "order": "date", "maxResults": 50, "pageToken": token})
        out = {"items": self._ids(page, "id")}
        if page.get("nextPageToken"):
            out["nextPageToken"] = page["nextPageToken"]
        return out

    def video_details(self, vid_ids: list[str]) -> list[dict]:
        if len(vid_ids) > DETAILS_BATCH:
            raise AssertionError(
                f"API contract violated: {len(vid_ids)} ids > "
                f"{DETAILS_BATCH}")
        page = self._get("videos", {
            "part": "snippet,contentDetails", "id": ",".join(vid_ids)})
        out = []
        for it in page.get("items", []):
            sn = it.get("snippet", {}) or {}
            cd = it.get("contentDetails", {}) or {}
            out.append({
                "vid_id": it.get("id"),
                "title": sn.get("title", ""),
                "published_at": sn.get("publishedAt", ""),
                "duration_sec": parse_iso8601_duration_sec(
                    cd.get("duration", "")),
            })
        return out

    def channel_info(self, channel_ids: list[str]) -> list[dict]:
        """Channel snippet + handle for the repair job
        (`sources/ingest.repair_channel_info`). Handle comes from the
        snippet's customUrl, normalized the way the reference does
        (`fix_missing_channel_info.py:39-44`: strip '@', the site
        prefix, and 'c/'); None when the channel has none."""
        if len(channel_ids) > DETAILS_BATCH:
            raise AssertionError(
                f"API contract violated: {len(channel_ids)} ids > "
                f"{DETAILS_BATCH}")
        page = self._get("channels", {
            "part": "snippet", "id": ",".join(channel_ids)})
        out = []
        for it in page.get("items", []):
            sn = it.get("snippet", {}) or {}
            custom = sn.get("customUrl", "") or ""
            handle = (custom.replace("@", "")
                      .replace("https://www.youtube.com/", "")
                      .replace("c/", "")) or None
            out.append({"channel_id": it.get("id"),
                        "handle": handle, "snippet": sn})
        return out

    def transcript(self, vid_id: str):
        raise NoTranscriptError(
            f"{vid_id}: the YouTube Data API serves no transcript "
            f"bodies; override transcript()/vtt() with a scraper")

    def vtt(self, vid_id: str) -> str:
        raise NoTranscriptError(
            f"{vid_id}: the YouTube Data API serves no caption bodies; "
            f"override transcript()/vtt() with a scraper")
