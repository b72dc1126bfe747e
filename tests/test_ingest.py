"""S5/S6 ingestion operators (sources/ingest.py) against the
deterministic fake transport: pagination, quota abort, 404 fallback,
batched details, transcript retry / VTT fallback / failure markers,
and idempotent re-crawl. Mirrors the reference's own fake-transport
test strategy (`test_support.py:85-90`) — no network anywhere."""

from __future__ import annotations

import pytest

from transcript_analysis_spark.sources.ingest import (
    DETAILS_BATCH,
    FakeTubeTransport,
    QuotaExhaustedError,
    fetch_transcripts,
    fetch_video_details,
    format_segment_text,
    list_channel_videos,
    missing_video_ids,
    new_segments_only,
    parse_vtt_text,
    uploads_playlist_id,
)

CHANNEL = "UCabcdef0123456789"


def test_uploads_playlist_id_transform():
    assert uploads_playlist_id("UCxyz") == "UUxyz"
    assert uploads_playlist_id("HCxyz") is None


def test_list_channel_videos_paginates_fully(spark):
    t = FakeTubeTransport(videos_per_channel=120)
    df = list_channel_videos(spark, t, CHANNEL)
    rows = df.collect()
    assert len(rows) == 120
    assert len({r.vid_id for r in rows}) == 120     # all distinct
    assert all(r.channel_id == CHANNEL for r in rows)
    # 120 videos at page size 50 = 3 playlist calls
    assert t.calls == 3


def test_list_channel_videos_quota_aborts(spark):
    t = FakeTubeTransport(videos_per_channel=120, quota_after=1)
    with pytest.raises(QuotaExhaustedError):
        list_channel_videos(spark, t, CHANNEL)


def test_playlist_404_falls_back_to_search(spark):
    t = FakeTubeTransport(
        videos_per_channel=70,
        playlist_404={uploads_playlist_id(CHANNEL)})
    df = list_channel_videos(spark, t, CHANNEL)
    assert df.count() == 70
    # 1 failed playlist call + 2 search pages
    assert t.calls == 3


def test_missing_video_ids_anti_join(spark):
    t = FakeTubeTransport(videos_per_channel=10)
    listed = list_channel_videos(spark, t, CHANNEL)
    existing = listed.limit(4)
    missing = missing_video_ids(listed, existing)
    assert missing.count() == 6
    got = {r.vid_id for r in missing.collect()}
    had = {r.vid_id for r in existing.collect()}
    assert not got & had


def test_fetch_video_details_batches_and_types(spark):
    t = FakeTubeTransport(videos_per_channel=120)
    vids = list_channel_videos(spark, t, CHANNEL)
    # the fake transport RAISES if any call exceeds the API's 50-id
    # limit, so completion itself proves batching held in the executors
    out = fetch_video_details(vids, FakeTubeTransport).collect()
    assert len(out) == 120
    assert all(r.title == f"Video {r.vid_id}" for r in out)
    assert all(60 <= r.duration_sec < 3660 for r in out)


def test_format_segment_text_matches_reference_rules():
    t, wc = format_segment_text("Hello, [Music] World! {applause} Yes.")
    assert t == "hello  world  yes"
    assert wc == 3


def test_parse_vtt_roundtrip_matches_api_lines():
    """The fake's VTT doc is generated from the same lines its API
    returns — the parser must recover text and timing exactly (text
    joins multi-line cues; timings to ms)."""
    t = FakeTubeTransport()
    vid = "v_deadbeef0"
    parsed = parse_vtt_text(t.vtt(vid))
    expected = t._lines(vid)
    assert len(parsed) == len(expected)
    for (pt, ps, pd_), (et, es, ed) in zip(parsed, expected):
        assert pt == et
        assert ps == pytest.approx(es, abs=1e-3)
        assert pd_ == pytest.approx(ed, abs=1e-3)


def _vid_at(transport, i):
    pid = uploads_playlist_id(CHANNEL)
    return transport._vid(pid, i)


def test_fetch_transcripts_api_path_with_cumulative_counts(spark):
    t = FakeTubeTransport(videos_per_channel=6, lines_per_video=3)
    vids = list_channel_videos(spark, t, CHANNEL)
    out = fetch_transcripts(
        vids, lambda: FakeTubeTransport(lines_per_video=3)).collect()
    assert len(out) == 6 * 3
    assert all(r.status == "api" for r in out)
    by_vid: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r.vid_id, r.start)):
        by_vid.setdefault(r.vid_id, []).append(r)
    for rows in by_vid.values():
        cum = 0
        for r in rows:
            formatted, wc = format_segment_text(r.text)
            assert r.text_formatted == formatted
            assert r.word_count == wc
            cum += wc
            assert r.cum_word_count == cum


def test_fetch_transcripts_retries_then_vtt_then_marker(spark):
    base = FakeTubeTransport(videos_per_channel=5)
    vids = list_channel_videos(spark, base, CHANNEL)
    flaky = _vid_at(base, 0)       # fails twice, succeeds on retry 3
    no_api = _vid_at(base, 1)      # VTT fallback
    dead = _vid_at(base, 2)        # marker row

    def factory():
        return FakeTubeTransport(
            videos_per_channel=5,
            flaky_vids={flaky: 2},
            no_api_vids={no_api, dead},
            no_vtt_vids={dead})

    out = fetch_transcripts(vids, factory, max_retries=3).collect()
    status = {}
    for r in out:
        status.setdefault(r.vid_id, set()).add(r.status)
    assert status[flaky] == {"api"}
    assert status[no_api] == {"vtt"}
    assert status[dead] == {"failed"}
    markers = [r for r in out if r.vid_id == dead]
    assert len(markers) == 1 and markers[0].start == -1.0
    # VTT fallback recovered full timing/text, not just presence
    vtt_rows = sorted((r for r in out if r.vid_id == no_api),
                      key=lambda r: r.start)
    expected = base._lines(no_api)
    assert [r.text for r in vtt_rows] == [e[0] for e in expected]


def test_fetch_transcripts_quota_fails_job_loudly(spark):
    t = FakeTubeTransport(videos_per_channel=8)
    vids = list_channel_videos(spark, t, CHANNEL)

    def factory():
        return FakeTubeTransport(videos_per_channel=8, quota_after=2)

    # one partition so a single client sees all 8 calls (quota state
    # is per transport client, as it is for a real per-key quota)
    with pytest.raises(Exception, match="[Qq]uota"):
        fetch_transcripts(vids.coalesce(1), factory).collect()


def test_new_segments_only_idempotent_recrawl(spark):
    t = FakeTubeTransport(videos_per_channel=4, lines_per_video=4)
    vids = list_channel_videos(spark, t, CHANNEL)
    first = fetch_transcripts(vids, FakeTubeTransport)
    again = fetch_transcripts(vids, FakeTubeTransport)
    assert new_segments_only(again, first.select("vid_id", "start")) \
        .count() == 0
    # a fresh video's rows all survive the anti-join
    more = FakeTubeTransport(videos_per_channel=5, lines_per_video=4)
    vids5 = list_channel_videos(spark, more, CHANNEL)
    second = fetch_transcripts(vids5, lambda: FakeTubeTransport(
        videos_per_channel=5, lines_per_video=4))
    fresh = new_segments_only(second, first.select("vid_id", "start"))
    assert fresh.count() == 4
    assert {r.vid_id for r in fresh.collect()} == {_vid_at(more, 4)}


# --- channel-metadata repair (fix_missing_channel_info.py parity) -------

def _channels_df(spark):
    """Five channels: complete, NULL handle, 'nan' handle, NULL
    snippet, snippet-without-title."""
    import json
    rows = [
        ("UCok", "goodhandle", json.dumps({"title": "Fine", "k": 1})),
        ("UCnullhandle", None, json.dumps({"title": "HasTitle"})),
        ("UCnanhandle", "nan", json.dumps({"title": "AlsoTitled"})),
        ("UCnullsnippet", "keepme", None),
        ("UCnotitle", "alsokeep", json.dumps({"country": "DE"})),
    ]
    return spark.createDataFrame(
        rows, "channel_id string, channel_handle string, "
              "channel_snippet string")


def test_repair_selects_only_broken_channels(spark):
    from transcript_analysis_spark.sources.ingest import (
        channels_needing_repair)
    got = {r.channel_id
           for r in channels_needing_repair(_channels_df(spark)).collect()}
    assert got == {"UCnullhandle", "UCnanhandle", "UCnullsnippet",
                   "UCnotitle"}


def test_repair_fetches_merges_and_is_idempotent(spark, tmp_path):
    """Only NULL/nan rows are touched; snippet merge keeps existing
    keys; API-less handles fall back to the current value; gone
    channels are skipped; after upsert a re-run selects nothing."""
    import json

    from transcript_analysis_spark.sources.ingest import (
        channels_needing_repair, repair_channel_info)
    from transcript_analysis_spark.sources.sinks import upsert_by_key

    chans = _channels_df(spark)

    def factory():
        return FakeTubeTransport(gone_channels={"UCnanhandle"},
                                 handleless_channels={"UCnullsnippet"})

    fixed = repair_channel_info(chans, factory)
    rows = {r.channel_id: r for r in fixed.collect()}
    # gone channel skipped, complete channel never fetched
    assert set(rows) == {"UCnullhandle", "UCnullsnippet", "UCnotitle"}
    # fetched handle lands; handleless keeps the current handle
    assert rows["UCnullhandle"].channel_handle is not None
    assert rows["UCnullsnippet"].channel_handle == "keepme"
    # merge: new snippet keys overlay, existing keys survive
    sn = json.loads(rows["UCnotitle"].channel_snippet)
    assert sn["title"] == "Channel UCnotitle" and sn["country"] in ("US", "GB")
    # repaired rows no longer match the predicate
    assert channels_needing_repair(fixed).count() == 0

    # upsert + re-run = no-op on everything but the gone channel
    path = str(tmp_path / "channels")
    chans.write.parquet(path)
    upsert_by_key(fixed, path, keys=["channel_id"])
    after = spark.read.parquet(path)
    assert after.count() == 5
    kept = {r.channel_id: r.channel_handle for r in after.collect()}
    assert kept["UCok"] == "goodhandle"          # untouched
    todo2 = channels_needing_repair(after)
    assert {r.channel_id for r in todo2.collect()} == {"UCnanhandle"}
    assert repair_channel_info(after, factory).count() == 0


def test_repair_respects_details_batch_limit(spark):
    """151 broken channels through one partition must split into 50-id
    API calls (the fake transport asserts the contract)."""
    from transcript_analysis_spark.sources.ingest import (
        repair_channel_info)
    rows = [(f"UCbulk{i:04d}", None, None) for i in range(151)]
    chans = spark.createDataFrame(
        rows, "channel_id string, channel_handle string, "
              "channel_snippet string")
    fixed = repair_channel_info(chans.coalesce(1), FakeTubeTransport)
    assert fixed.count() == 151


def test_url_transport_channel_info_normalizes_handle():
    """UrlTubeTransport.channel_info strips @/site-prefix/c from
    customUrl the way the reference does (no network: fake http)."""
    from transcript_analysis_spark.operators import http_transport as ht

    t = ht.UrlTubeTransport("k", base_url="http://x")
    calls = {}

    def fake_get(resource, params):
        calls["resource"], calls["params"] = resource, params
        return {"items": [
            {"id": "UC1", "snippet": {"customUrl": "@MyHandle",
                                      "title": "T1"}},
            {"id": "UC2", "snippet": {"customUrl":
                                      "https://www.youtube.com/c/Other",
                                      "title": "T2"}},
            {"id": "UC3", "snippet": {"title": "NoUrl"}},
        ]}

    t._get = fake_get
    got = t.channel_info(["UC1", "UC2", "UC3"])
    assert calls["resource"] == "channels"
    assert calls["params"]["id"] == "UC1,UC2,UC3"
    by_id = {g["channel_id"]: g for g in got}
    assert by_id["UC1"]["handle"] == "MyHandle"
    assert by_id["UC2"]["handle"] == "Other"
    assert by_id["UC3"]["handle"] is None
    with pytest.raises(AssertionError):
        t.channel_info([f"UC{i}" for i in range(51)])


def test_repair_null_handle_without_api_custom_url_stays_selectable(spark):
    """A NULL-handle channel whose API snippet has no customUrl gets
    the snippet value but remains broken-by-predicate — it is retried
    on the next run (the reference's own semantics: its SELECT
    re-picks such rows every run). The retry converges the moment the
    API starts serving a handle."""
    import json

    from transcript_analysis_spark.sources.ingest import (
        channels_needing_repair, repair_channel_info)

    chans = spark.createDataFrame(
        [("UCnohandleanywhere", None, None)],
        "channel_id string, channel_handle string, channel_snippet string")

    fixed = repair_channel_info(
        chans, lambda: FakeTubeTransport(
            handleless_channels={"UCnohandleanywhere"}))
    row = fixed.collect()[0]
    assert row.channel_handle is None            # API had none
    assert json.loads(row.channel_snippet)["title"]   # snippet repaired
    assert channels_needing_repair(fixed).count() == 1  # retried next run

    # ...and once the API serves a handle, the retry converges
    healed = repair_channel_info(fixed, FakeTubeTransport)
    assert healed.collect()[0].channel_handle is not None
    assert channels_needing_repair(healed).count() == 0
