"""Invariant tests for plans/selection.py (oracle parity is covered
by the parametrized sweep in test_oracle_parity.py; these pin the
algorithmic properties the SQL oracle can't express — greedy-replay
fidelity, measure bounds, and cross-query consistency)."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from transcript_analysis_spark.plans import selection


# --- DSIR ----------------------------------------------------------------

def test_dsir_matches_python_replay(spark):
    """Importance sums replayed exactly in pure Python from the raw
    parquet (counts -> quantized weights -> integer dot product)."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    tgt_counts: dict[str, int] = {}
    raw_counts: dict[str, int] = {}
    doc_words: dict[int, list[str]] = {}
    for r in docs:
        words = r.text.split(" ")
        if r.source == selection.DSIR_TARGET:
            for w in words:
                tgt_counts[w] = tgt_counts.get(w, 0) + 1
        else:
            doc_words[r.doc_id] = words
            for w in words:
                raw_counts[w] = raw_counts.get(w, 0) + 1
    vocab = set(tgt_counts) | set(raw_counts)
    nt, nr, v = sum(tgt_counts.values()), sum(raw_counts.values()), len(vocab)
    wt = {w: round(math.log((float(tgt_counts.get(w, 0) + 1) * float(nr + v))
                            / (float(raw_counts.get(w, 0) + 1)
                               * float(nt + v))) * 1e9)
          for w in vocab}
    expect = {d: sum(wt[w] for w in words)
              for d, words in doc_words.items()}
    got = {r.doc_id: r.importance_e9
           for r in selection.dsir_importance_weights(spark, SF_SMOKE)
           .collect()}
    assert got == expect


def test_dsir_target_docs_excluded_and_flag_consistent(spark):
    out = selection.dsir_importance_weights(spark, SF_SMOKE).collect()
    assert out
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    tgt_ids = {r.doc_id for r in docs.filter(
        F.col("source") == selection.DSIR_TARGET).collect()}
    assert not ({r.doc_id for r in out} & tgt_ids)
    for r in out:
        assert r.target_like == (r.avg_logratio > 0.0)


# --- MMR ------------------------------------------------------------------

def _quant(vec):
    return [math.floor(float(x) * selection.MMR_SCALE + 0.5) for x in vec]


def test_mmr_matches_python_greedy_replay(spark):
    """The full greedy trajectory — candidate pool, every argmax, the
    maxsim bookkeeping — equals an independent Python replay."""
    emb = {r.vec_id: _quant(r.embedding)
           for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
           .collect()}
    qv = emb[0]
    dot = lambda a, b: sum(x * y for x, y in zip(a, b))  # noqa: E731
    rel = {i: dot(v, qv) for i, v in emb.items() if i != 0}
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:selection.MMR_N]
    picked, expect = [], []
    for t in range(selection.MMR_K):
        if not picked:
            best = min(cand, key=lambda i: (-rel[i], i))
            expect.append((t, best, rel[best], 0, rel[best]))
        else:
            rem = [i for i in cand if i not in picked]
            if not rem:
                break
            scored = {}
            for i in rem:
                ms = max(dot(emb[i], emb[s]) for s in picked)
                scored[i] = (rel[i] - ms, ms)
            best = min(rem, key=lambda i: (-scored[i][0], i))
            expect.append((t, best, rel[best], scored[best][1],
                           scored[best][0]))
        picked.append(best)
    got = [(r.sel_order, r.vec_id, r.rel_q, r.maxsim_q, r.mmr2_q)
           for r in selection.mmr_diverse_topk(spark, SF_SMOKE)
           .orderBy("sel_order").collect()]
    assert got == expect


def test_mmr_diversifies_vs_plain_topk(spark):
    """Selected ids are distinct and the first pick is the global
    relevance argmax (lambda=1/2 never demotes the top-1)."""
    out = selection.mmr_diverse_topk(spark, SF_SMOKE).collect()
    ids = [r.vec_id for r in out]
    assert len(ids) == len(set(ids)) == selection.MMR_K
    top1 = max(out, key=lambda r: r.rel_q)
    first = next(r for r in out if r.sel_order == 0)
    assert first.rel_q == top1.rel_q


# --- event paths ----------------------------------------------------------

def test_event_paths_match_python_regex(spark):
    out = selection.event_path_pattern_match(spark, SF_SMOKE).collect()
    assert out
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    by_user: dict[int, list] = {}
    for e in events:
        by_user.setdefault(e.user_id, []).append(e)
    for r in out:
        evs = sorted(by_user[r.user_id], key=lambda e: (e.ts, e.event_id))
        path = "".join(e.event_type[0] for e in evs)
        assert r.path == path
        assert r.n_events == len(path)
        assert r.funnel_hit == bool(re.search("v.*c.*p", path))
        assert r.n_vcp_adjacent == len(re.findall("vcp", path))
        runs = re.findall("v+", path)
        assert r.longest_view_run == (max(len(x) for x in runs) if runs else 0)
        m = re.search(r"^[^p]*p", path)
        assert r.first_purchase_pos == (len(m.group(0)) if m else 0)


# --- triangles ------------------------------------------------------------

def test_triangle_census_matches_python(spark):
    li = (spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
          .select("l_orderkey", "l_partkey").distinct().collect())
    orders: dict[int, set[int]] = {}
    for r in li:
        orders.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    from collections import Counter
    pair_counts: Counter = Counter()
    for parts in orders.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_counts[(ps[i], ps[j])] += 1
    edges = {p for p, m in pair_counts.items()
             if m >= selection.TRI_MIN_SUPPORT}
    deg: Counter = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    tris = 0
    by_low: dict[int, list[int]] = {}
    for a, b in edges:
        by_low.setdefault(a, []).append(b)
    for a, nbrs in by_low.items():
        nbrs = sorted(nbrs)
        for i in range(len(nbrs)):
            for j in range(i + 1, len(nbrs)):
                if (nbrs[i], nbrs[j]) in edges:
                    tris += 1
    row = selection.part_triangle_count(spark, SF_SMOKE).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles) == \
        (len(deg), len(edges), wedges, tris)
    assert 0.0 <= row.transitivity <= 1.0


# --- containment ----------------------------------------------------------

def test_containment_dominates_jaccard_and_is_bounded(spark):
    """For every pair: both containment directions in [0, 1], flag
    consistent with the threshold, flags imply real overlap."""
    cont = {(r.doc_a, r.doc_b): r
            for r in selection.ngram_containment_pairs(spark, SF_SMOKE)
            .collect()}
    assert cont
    for r in cont.values():
        assert 0.0 <= r.containment_ab <= 1.0
        assert 0.0 <= r.containment_ba <= 1.0
        assert r.near_dup == (max(r.containment_ab, r.containment_ba)
                              >= selection.CONTAIN_THRESHOLD)
    # jaccard query uses 2-gram shingles vs containment's 3-grams, so
    # compare against a containment-side jaccard derived from counts
    # is not possible row-wise; instead check the algebraic bound on
    # the containment query's own numbers: n_common <= min-size side
    # implied by each ratio being <= 1 (covered above) and that at
    # least one genuinely-contained pair exists in the fixture only if
    # flagged — sanity: flags are a subset of positive-overlap pairs.
    for r in cont.values():
        if r.near_dup:
            assert r.n_common > 0


# --- PMI ------------------------------------------------------------------

def test_pmi_matches_python_replay(spark):
    from collections import Counter
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    pc: Counter = Counter()
    for r in docs:
        ws = r.text.split(" ")
        for o in (1, 2):
            for i in range(len(ws) - o):
                pc[(ws[i], ws[i + o])] += 1
    lm, rm = Counter(), Counter()
    for (w1, w2), c in pc.items():
        lm[w1] += c
        rm[w2] += c
    n = sum(pc.values())
    scored = [(round(math.log((float(c) * n) / (float(lm[w1]) * rm[w2]))
                     * 1e9), w1, w2, c)
              for (w1, w2), c in pc.items()
              if c >= selection.PMI_MIN_COUNT]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    expect = [(w1, w2, c, p) for p, w1, w2, c in scored[:selection.PMI_TOP]]
    got = [(r.w1, r.w2, r.n_pair, r.pmi_e9)
           for r in selection.skipgram_pmi_pairs(spark, SF_SMOKE)
           .orderBy(F.desc("pmi_e9"), "w1", "w2").collect()]
    assert got == expect


# --- session paths --------------------------------------------------------

def test_session_paths_match_python_sessionizer(spark):
    """Top paths equal a pure-Python replay of the 30-min-gap
    sessionizer over the raw events."""
    from collections import Counter
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    by_user: dict[int, list] = {}
    for e in events:
        by_user.setdefault(e.user_id, []).append(e)
    paths: Counter = Counter()
    users_per_path: dict[str, set] = {}
    for uid, evs in by_user.items():
        evs = sorted(evs, key=lambda e: (e.ts, e.event_id))
        cur, last_us = [], None
        for e in evs:
            ts_us = int(e.ts.timestamp() * 1e6) if hasattr(e.ts, "timestamp") \
                else int(e.ts)
            if last_us is not None and \
                    ts_us - last_us > selection.PATH_GAP_US:
                p = "".join(cur)
                paths[p] += 1
                users_per_path.setdefault(p, set()).add(uid)
                cur = []
            cur.append(e.event_type[0])
            last_us = ts_us
        if cur:
            p = "".join(cur)
            paths[p] += 1
            users_per_path.setdefault(p, set()).add(uid)
    ranked = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))
    expect = [(p, n, len(users_per_path[p]), len(p))
              for p, n in ranked[:selection.PATH_TOP]]
    got = [(r.path, r.n_sessions, r.n_users, r.path_len)
           for r in selection.top_session_paths(spark, SF_SMOKE)
           .orderBy(F.desc("n_sessions"), "path").collect()]
    assert got == expect


# --- point-in-time join ---------------------------------------------------

def test_pit_join_matches_python_asof(spark):
    """Every purchase carries the status of the latest PRIOR
    non-purchase event run — replayed in Python, including the
    run-start `since` (a purchase inside a status run must NOT reset
    it) and NULL for purchases before any status."""
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    by_user: dict[int, list] = {}
    for e in events:
        by_user.setdefault(e.user_id, []).append(e)
    expect = {}
    for uid, evs in by_user.items():
        evs = sorted(evs, key=lambda e: (e.ts, e.event_id))
        state, since = None, None
        for e in evs:
            ts_us = int(e.ts.timestamp() * 1e6)
            if e.event_type == "purchase":
                expect[e.event_id] = (uid, state, since)
            else:
                if e.event_type != state:
                    state, since = e.event_type, ts_us
    got = {r.event_id: (r.user_id, r.state_at_purchase, r.state_since_us)
           for r in selection.scd2_point_in_time_join(spark, SF_SMOKE)
           .collect()}
    assert got == expect
    # every purchase appears exactly once (left join, no interval dup)
    n_purchases = (spark.read.parquet(f"{SF_SMOKE}/events.parquet")
                   .filter(F.col("event_type") == "purchase").count())
    assert len(got) == n_purchases


def test_pit_join_same_microsecond_tie_semantics(spark, tmp_path):
    """The generated corpus has no status/purchase pair sharing a
    microsecond, so the (ts_us, event_id) tie-break was latent: this
    fixture forces collisions on BOTH interval bounds and pins the
    contract — a status with lower event_id than a same-instant
    purchase is visible to it, a higher one is not — on the Spark
    plan AND the DuckDB oracle (whose intervals now carry
    lexicographic (ts_us, event_id) bounds)."""
    import duckdb

    from transcript_analysis_spark.plans.registry import get_query

    t0 = 1_000_000_000_000_000
    t1, t2 = t0 + 1_000, t0 + 2_000
    rows = [
        (1, t0, 1, "signup", 0.0),
        (10, t1, 1, "active", 0.0),
        (9, t1, 1, "purchase", 5.0),     # same us, eid < status 10
        (11, t1, 1, "purchase", 6.0),    # same us, eid > status 10
        (0, t0 - 5, 1, "purchase", 7.0),  # before any status
        (20, t2, 1, "idle", 0.0),
        (19, t2, 1, "purchase", 8.0),    # ties the 'active' TO-bound
        (21, t2, 1, "purchase", 9.0),    # after the 'idle' FROM-bound
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long, "
              "event_type string, value double")
    (df.select("event_id", F.timestamp_micros("ts_us").alias("ts"),
               "user_id", "event_type", "value",
               F.lit("{}").alias("props"))
       .coalesce(1).write.parquet(f"{tmp_path}/events.parquet"))

    expect = {9: ("signup", t0), 11: ("active", t1), 0: (None, None),
              19: ("active", t1), 21: ("idle", t2)}

    got = {r.event_id: (r.state_at_purchase, r.state_since_us)
           for r in selection.scd2_point_in_time_join(
               spark, str(tmp_path)).collect()}
    assert got == expect

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{tmp_path}/events.parquet/*.parquet'")
    oracle = get_query("scd2_point_in_time_join").oracle
    duck = {r[0]: (r[4], r[5]) for r in con.execute(oracle).fetchall()}
    assert duck == expect


# --- minhash estimate accuracy -------------------------------------------

def test_minhash_estimate_grid_and_exact_dup_property(spark):
    """Estimates live on the k-step grid (m/8), identical shingle
    sets estimate exactly 1 (identical signatures), and the reported
    abs_err is |est - exact| of the row's own columns."""
    rows = selection.minhash_jaccard_estimate_error(spark, SF_SMOKE).collect()
    assert rows
    grid = {round(m / 8, 6) for m in range(9)}
    for r in rows:
        assert r.jaccard_est in grid
        assert abs(r.abs_err - abs(r.jaccard_est - r.jaccard_exact)) < 1e-9
        if r.jaccard_exact == 1.0:
            assert r.jaccard_est == 1.0 and r.n_match_components == 8
