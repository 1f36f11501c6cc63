"""Property-based checks (hypothesis) for operator invariants that must
hold on ANY input, not just the fixtures — SURVEY.md §5.2 item 4.

Spark round-trips are expensive, so examples are capped and deadlines
disabled; the properties target the invariants that would corrupt data
silently at scale if a refactor broke them.
"""

from __future__ import annotations

import pytest

from hypothesis import given, settings, strategies as st

from dend_spark_data_lake_spark.operators import sampling as SAMP

# ---------------------------------------------------------------------------
# Pure-Python properties (fast, many examples)
# ---------------------------------------------------------------------------


@given(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
def test_threshold_hex_monotone_and_bounded(f):
    t = SAMP.threshold_hex(f)
    if t == "g":  # the keep-everything sentinel, above all 4-hex buckets
        assert f == 1.0 or int(f * SAMP._BUCKETS) >= SAMP._BUCKETS
    else:
        assert len(t) == SAMP.PREFIX_DIGITS and t <= "ffff"
    # monotone: a larger fraction never yields a smaller threshold
    # ('g' > every 4-hex string, so lexicographic order still holds)
    assert SAMP.threshold_hex(min(1.0, f + 0.1)) >= t


@given(
    st.lists(
        st.floats(min_value=0.01, max_value=0.5, allow_nan=False), min_size=1, max_size=4
    )
)
def test_split_label_weights_cover_unit_interval(ws):
    total = sum(ws)
    weights = {f"s{i}": w / max(total, 1.0) for i, w in enumerate(ws)}
    # cumulative thresholds are nondecreasing and the last label absorbs the rest
    cum, prev = 0.0, "0000"
    for label, w in list(weights.items())[:-1]:
        cum += w
        t = SAMP.threshold_hex(cum)
        assert t >= prev
        prev = t


# ---------------------------------------------------------------------------
# Spark properties (few examples, session reused)
# ---------------------------------------------------------------------------

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key (forces collisions)
        st.integers(min_value=0, max_value=100),  # ts
        st.text(alphabet="abc ", min_size=0, max_size=12),  # payload
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=12, deadline=None)
@given(ROWS)
def test_keyed_dedup_invariants(spark, rows):
    """keep-latest: ≤1 row per key, and it carries the max ts for the key
    (ties broken deterministically — reruns give byte-identical output)."""
    from dend_spark_data_lake_spark.operators.dedup import dedup_keep_latest

    df = spark.createDataFrame(rows, "k int, ts int, v string")
    out = dedup_keep_latest(df, ["k"], "ts", tie_break=["v"]).collect()
    assert len({r.k for r in out}) == len(out)  # unique keys
    by_key_max = {}
    for k, ts, _ in rows:
        by_key_max[k] = max(by_key_max.get(k, -1), ts)
    for r in out:
        assert r.ts == by_key_max[r.k]
    again = dedup_keep_latest(df, ["k"], "ts", tie_break=["v"]).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


@settings(max_examples=10, deadline=None)
@given(ROWS)
def test_normalize_text_idempotent(spark, rows):
    from pyspark.sql import functions as F
    from dend_spark_data_lake_spark.functions.text import normalize_text

    df = spark.createDataFrame(rows, "k int, ts int, v string")
    once = normalize_text("v")
    bad = df.select(
        once.alias("a"), normalize_text(once).alias("b")
    ).filter(F.col("a") != F.col("b"))
    assert bad.count() == 0


@settings(max_examples=10, deadline=None)
@given(ROWS)
def test_word_ngrams_shape(spark, rows):
    """Every emitted shingle has exactly n tokens; short docs emit none."""
    from pyspark.sql import functions as F
    from dend_spark_data_lake_spark.functions.similarity import word_ngrams

    df = spark.createDataFrame(rows, "k int, ts int, v string")
    sh = df.select(F.explode(word_ngrams(F.col("v"), 3)).alias("s"))
    bad = sh.filter(F.size(F.split(F.col("s"), r"\s+")) != 3)
    assert bad.count() == 0


@settings(max_examples=8, deadline=None)
@given(st.integers(min_value=2, max_value=40))
def test_sample_subset_property(spark, n):
    """A 30% hash sample is a strict subset of the 60% sample on any key
    range — nested thresholds must nest row sets (enables reproducible
    progressive sampling at scale)."""
    df = spark.range(n).withColumnRenamed("id", "k")
    small = {r.k for r in SAMP.deterministic_sample(df, "k", 0.3).collect()}
    big = {r.k for r in SAMP.deterministic_sample(df, "k", 0.6).collect()}
    assert small <= big


# ---------------------------------------------------------------------------
# Spark-backed properties (few examples, invariants that matter at scale)
# ---------------------------------------------------------------------------


def _uf_components(edges):
    """Inline union-find reference: vertex -> min vertex id of component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {x: find(x) for x in parent}


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_matches_union_find(edges):
    from pyspark.sql import SparkSession

    from dend_spark_data_lake_spark.operators.graph import connected_components

    spark = SparkSession.getActiveSession()
    edges = [(u, v) for u, v in edges if u != v]
    if not edges:
        return
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.vertex: r.component for r in connected_components(df).collect()}
    assert got == _uf_components(edges)


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10), st.integers(0, 100)), min_size=1, max_size=15
    )
)
def test_merge_upsert_laws(pairs):
    """Empty source is identity; merging the same source twice equals
    merging it once (idempotence); every source key ends with the source
    row."""
    from pyspark.sql import SparkSession

    from dend_spark_data_lake_spark.operators.merge import merge_upsert

    spark = SparkSession.getActiveSession()
    target = spark.createDataFrame(
        [(k, v) for k, v in dict(pairs).items()], "k long, v long"
    )
    source = spark.createDataFrame(
        [(k, v + 1000) for k, v in list(dict(pairs).items())[: len(pairs) // 2]]
        + [(999, 1)],
        "k long, v long",
    )
    empty = spark.createDataFrame([], "k long, v long")

    base = {r.k: r.v for r in target.collect()}
    assert {r.k: r.v for r in merge_upsert(target, empty, ["k"]).collect()} == base

    once = {r.k: r.v for r in merge_upsert(target, source, ["k"]).collect()}
    twice = {
        r.k: r.v
        for r in merge_upsert(merge_upsert(target, source, ["k"]), source, ["k"]).collect()
    }
    assert once == twice
    for r in source.collect():
        assert once[r.k] == r.v


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 200), st.integers(0, 80)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(30, 120),
)
def test_greedy_pack_matches_reference_fold(rows, budget):
    """On ANY (id, weight) set and budget, the Catalyst fold must equal the
    Python greedy recurrence — including zero weights and oversize rows."""
    from pyspark.sql import SparkSession

    from dend_spark_data_lake_spark.operators.packing import greedy_pack

    spark = SparkSession.getActiveSession()
    dps = 64
    expected = {}
    shards: dict[int, list[tuple[int, int]]] = {}
    for rid, w in sorted(rows):
        shards.setdefault(rid // dps, []).append((rid, w))
    for shard, docs in shards.items():
        pack, acc = -1, budget + 1
        for rid, w in docs:
            if acc + w <= budget:
                acc += w
            else:
                pack, acc = pack + 1, w
            expected[rid] = (shard, pack)
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {
        r["doc_id"]: (r["shard"], r["pack_id"])
        for r in greedy_pack(df, "doc_id", "w", budget, dps).collect()
    }
    assert got == expected


@settings(max_examples=4, deadline=None)
@given(
    token_lists=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=3, max_size=12),
        min_size=2,
        max_size=10,
    )
)
def test_containment_pairs_match_brute_force(spark, token_lists):
    """containment_pairs (asymmetric prefix filter + hashed verify) must
    equal the brute-force definition on arbitrary small corpora — the
    prefix filter is an optimization, never allowed to change the answer."""
    from dend_spark_data_lake_spark.functions.similarity import containment_pairs

    docs = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_inner, r.doc_outer, r.containment_ppm)
        for r in containment_pairs(df, n=3, threshold_ppm=700_000).collect()
    }

    def shingles(toks):
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sets = {i: shingles(toks) for i, toks in enumerate(token_lists)}
    want = set()
    for i in sets:
        for j in sets:
            if i >= j:
                continue
            # orientation: inner = smaller shingle set, tie -> lower id
            inner, outer = (i, j)
            if (len(sets[j]), j) < (len(sets[i]), i):
                inner, outer = (j, i)
            ni = len(sets[inner] & sets[outer])
            ppm = ni * 1_000_000 // len(sets[inner])
            if ppm >= 700_000:
                want.add((inner, outer, ppm))
    assert got == want


@settings(max_examples=4, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),  # key
            st.integers(0, 400),  # start hour
            st.integers(-5, 72),  # length in hours (<= 0: inverted/empty)
        ),
        min_size=1,
        max_size=15,
    )
)
def test_interval_overlap_matches_brute_force(spark, rows):
    """The bucket-exploded interval join must equal the quadratic
    definition for any intervals — including SUB-DAY overlaps (second
    granularity, not day truncation) — and must DROP inverted/empty
    intervals instead of exploding them across buckets."""
    import datetime

    from dend_spark_data_lake_spark.operators.joins import interval_overlap_self_join

    d0 = datetime.datetime(2020, 1, 1)
    data = [
        (
            k,
            i,
            d0 + datetime.timedelta(hours=sh),
            d0 + datetime.timedelta(hours=sh + ln),
        )
        for i, (k, sh, ln) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "key long, id long, s timestamp, e timestamp")
    got = {
        (r.key, r.id_a, r.id_b, r.overlap_seconds)
        for r in interval_overlap_self_join(df, "key", "id", "s", "e", 7).collect()
    }
    want = set()
    valid = [(k, i, s_, e_) for k, i, s_, e_ in data if e_ > s_]
    for k1, i1, s1, e1 in valid:
        for k2, i2, s2, e2 in valid:
            if k1 == k2 and i1 < i2 and s1 < e2 and s2 < e1:
                ov = int((min(e1, e2) - max(s1, s2)).total_seconds())
                want.add((k1, i1, i2, ov))
    assert got == want


def test_substring_spans_match_bruteforce(spark):
    """dedup_substring_spans' windowed-hash construction must agree with a
    direct Python enumeration of shared 20-token spans on a corpus built
    to exercise the edges: exact duplicates, partial overlap in the middle
    of longer docs, docs shorter than the window, and non-overlapping
    text."""
    base = [f"w{i}" for i in range(60)]
    docs = {
        1: base[:40],                          # shares a 25-token run with 2
        2: base[15:60],                        # overlap: tokens 15..39
        3: [f"x{i}" for i in range(30)],       # unique - must not appear
        4: base[:40],                          # exact duplicate of 1
        5: base[:10],                          # shorter than the window
    }
    k = 20
    from collections import defaultdict

    span_docs = defaultdict(set)
    for d, w in docs.items():
        for i in range(len(w) - k + 1):
            span_docs[" ".join(w[i : i + k])].add(d)
    want = {}
    for d, w in docs.items():
        spans = [" ".join(w[i : i + k]) for i in range(len(w) - k + 1)]
        dup = sum(1 for s in spans if len(span_docs[s]) > 1)
        if dup:
            want[d] = (len(spans), dup)

    from dend_spark_data_lake_spark.queries import REGISTRY
    import tempfile, os

    df = spark.createDataFrame(
        [(d, " ".join(w), "en", "src", len(" ".join(w))) for d, w in docs.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "documents.parquet"))
        got = {
            r.doc_id: (r.n_spans, r.n_dup_spans)
            for r in REGISTRY["dedup_substring_spans"].fn(spark, tmp).collect()
        }
    assert got == want, (got, want)


def test_asof_tiebreak_picks_min_right_id(spark):
    """Duplicate (key, ts) right rows: the tiebreak column must select the
    MINIMUM right id deterministically, in both directions (the r3 flake
    class: without it the winner depended on partition-internal order)."""
    from datetime import datetime

    from dend_spark_data_lake_spark.operators.joins import asof_join

    t = lambda m: datetime(2024, 1, 1, 12, m)
    left = spark.createDataFrame(
        [(1, t(10), 100)], ["k", "ts", "lid"]
    )
    # three right rows at the SAME (key, ts) before/at the left ts
    right = spark.createDataFrame(
        [(1, t(5), 7), (1, t(5), 3), (1, t(5), 5)], ["k", "ts", "rid"]
    )
    back = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["rid"], tiebreak="rid",
    ).collect()
    assert len(back) == 1 and back[0].rid_right == 3
    fwd_right = spark.createDataFrame(
        [(1, t(15), 9), (1, t(15), 2), (1, t(15), 4)], ["k", "ts", "rid"]
    )
    fwd = asof_join(
        left, fwd_right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["rid"], direction="forward", tiebreak="rid",
    ).collect()
    assert len(fwd) == 1 and fwd[0].rid_right == 2


def test_bucketed_range_join_matches_bruteforce(spark):
    """The bucket-explode + equi-join + residual-filter range join must
    emit EXACTLY the rows of the naive inequality join — including
    intervals that span bucket boundaries and exact-boundary timestamps."""
    import random
    from datetime import datetime, timedelta

    from dend_spark_data_lake_spark.operators.joins import bucketed_range_join

    rng = random.Random(7)
    base = datetime(2024, 5, 1)
    left_rows = [
        (i, base + timedelta(seconds=rng.randrange(0, 7200)))
        for i in range(40)
    ]
    right_rows = [
        (j, base + timedelta(seconds=rng.randrange(0, 7200)))
        for j in range(60)
    ]
    left = spark.createDataFrame(left_rows, "lid long, lts timestamp")
    right = spark.createDataFrame(right_rows, "rid long, rts timestamp")
    got = {
        (r.lid, r.rid)
        for r in bucketed_range_join(
            left, right,
            left_ts="lts", right_ts="rts",
            lower_expr="lts - INTERVAL 10 MINUTES",
            upper_expr="lts + INTERVAL 10 MINUTES",
            bucket_seconds=600,
        ).collect()
    }
    want = {
        (lid, rid)
        for lid, lts in left_rows
        for rid, rts in right_rows
        if lts - timedelta(minutes=10) <= rts <= lts + timedelta(minutes=10)
    }
    assert got == want


def test_asof_nearest_matches_bruteforce(spark):
    """direction="nearest" must pick, per left row, the right row with
    the minimum |gap| — backward winning equidistant ties and supplying
    the min-tiebreak row within a duplicated timestamp — exactly the
    brute-force scan over all candidates."""
    from datetime import datetime

    from dend_spark_data_lake_spark.operators.joins import asof_join

    def ts(m):
        return datetime(2024, 1, 1, 0, m)

    # key 1: right rows around each left; key 2: duplicates at one ts;
    # key 3: no right rows at all (NULL match)
    left = [(1, ts(10), 100), (1, ts(30), 101), (2, ts(20), 102), (3, ts(5), 103)]
    right = [
        (1, ts(8), 200),   # 2m before left@10
        (1, ts(11), 201),  # 1m after left@10  -> nearest for 100
        (1, ts(29), 202),  # 1m before left@30
        (1, ts(31), 203),  # 1m after left@30: EQUIDISTANT -> backward 202
        (2, ts(19), 204),  # dup ts pair: min event_id must win
        (2, ts(19), 205),
    ]
    ldf = spark.createDataFrame(left, "k long, ts timestamp, lid long")
    rdf = spark.createDataFrame(right, "k long, ts timestamp, rid long")
    got = {
        r.lid: r.rid_right
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="ts", right_ts="ts",
            right_cols=["rid"], direction="nearest", tiebreak="rid",
        ).collect()
    }

    def brute(k, lts):
        cands = [(abs((rts - lts).total_seconds()), rts > lts, rid)
                 for rk, rts, rid in right if rk == k]
        if not cands:
            return None
        # min |gap|; backward (rts <= lts -> False sorts first) on ties;
        # then min rid
        return sorted(cands)[0][2]

    want = {lid: brute(k, lts) for k, lts, lid in left}
    assert got == want == {100: 201, 101: 202, 102: 204, 103: None}


def test_interval_merge_matches_bruteforce(spark):
    """intervals_merge_coverage's running-max island trick must equal the
    classic sort-and-merge interval union — a formula bug shared with
    the SQL oracle would survive cross-engine parity, so pin the
    semantics against a plain-Python merge."""
    from collections import defaultdict
    from datetime import timedelta

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, ts FROM read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    con.close()
    per_user = defaultdict(list)
    width = timedelta(minutes=10)
    for uid, ts in rows:
        per_user[uid].append((ts, ts + width))
    expect = {}
    for uid, ivs in per_user.items():
        ivs.sort()
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        # the query floors ONCE over the summed microsecond spans, not
        # per island — replicate that exactly
        micros = sum(
            (e - s) // timedelta(microseconds=1) for s, e in merged
        )
        expect[uid] = (len(merged), micros // 1_000_000)

    got = {
        r.user_id: (r.n_islands, r.covered_seconds)
        for r in REGISTRY["intervals_merge_coverage"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_open_backlog_matches_bruteforce(spark):
    """orders_open_backlog's sweep-line running sum must equal direct
    per-day interval membership counting on every emitted day."""
    from datetime import timedelta

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    spans = con.sql(
        f"""SELECT CAST(o.o_orderdate AS DATE),
                   greatest(CAST(max(l.l_shipdate) AS DATE),
                            CAST(o.o_orderdate AS DATE))
            FROM read_parquet('{SF_SMOKE}/orders.parquet') o
            JOIN read_parquet('{SF_SMOKE}/lineitem.parquet') l
              ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderkey, o.o_orderdate"""
    ).fetchall()
    con.close()

    got = {
        r.d: r.open_orders
        for r in REGISTRY["orders_open_backlog"].fn(spark, SF_SMOKE).collect()
    }
    # spot-check a spread of emitted days against direct membership
    days = sorted(got)
    for d in days[:: max(1, len(days) // 40)]:
        want = sum(1 for sd, ed in spans if sd <= d <= ed)
        assert got[d] == want, (d, got[d], want)
    # the series must end at zero open orders (every order eventually ships)
    assert got[days[-1]] == 0


def test_attribution_credit_matches_bruteforce(spark):
    """attribution_linear_credit's bucketed-range-join + floor-division
    credit math must equal a direct per-purchase scan: for each purchase,
    count the same user's views in [p_ts - 1h, p_ts), credit each view
    1e6 DIV nv ppm — pinned independently of the SQL oracle."""
    from collections import defaultdict
    from datetime import timedelta

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT event_id, user_id, event_type, ts FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet') "
        "WHERE event_type IN ('purchase', 'view')"
    ).fetchall()
    con.close()
    views = defaultdict(list)
    for eid, uid, et, ts in rows:
        if et == "view":
            views[uid].append(ts)
    expect = defaultdict(lambda: [0, 0, 0])  # n_attributed, credits, ppm
    hour = timedelta(hours=1)
    for eid, uid, et, ts in rows:
        if et != "purchase":
            continue
        nv = sum(1 for vt in views[uid] if ts - hour <= vt < ts)
        if nv:
            e = expect[uid]
            e[0] += 1
            e[1] += nv
            e[2] += nv * (1_000_000 // nv)

    got = {
        r.user_id: [r.n_attributed, r.n_view_credits, r.distributed_ppm]
        for r in REGISTRY["attribution_linear_credit"].fn(spark, SF_SMOKE).collect()
    }
    assert got == {k: list(v) for k, v in expect.items()}


def test_gaps_islands_matches_bruteforce(spark):
    """window_gaps_islands' date-minus-row_number constancy trick must
    equal a direct consecutive-day scan per user."""
    from collections import defaultdict
    from datetime import timedelta

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT DISTINCT user_id, CAST(ts AS DATE) FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    con.close()
    days = defaultdict(set)
    for uid, d in rows:
        days[uid].add(d)
    expect = {}
    one = timedelta(days=1)
    for uid, ds in days.items():
        ds = sorted(ds)
        streaks, cur = [], 1
        for a, b in zip(ds, ds[1:]):
            if b - a == one:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        expect[uid] = (len(streaks), max(streaks), len(ds))

    got = {
        r.user_id: (r.n_streaks, r.longest_streak, r.n_active_days)
        for r in REGISTRY["window_gaps_islands"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_hhi_matches_bruteforce(spark):
    """supplier_share_hhi's floor-basis-point squared-share sum must
    equal the direct per-nation computation."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT n.n_name, s.s_suppkey,
                   CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                        AS BIGINT)
            FROM read_parquet('{SF_SMOKE}/lineitem.parquet') l
            JOIN read_parquet('{SF_SMOKE}/supplier.parquet') s
              ON l.l_suppkey = s.s_suppkey
            JOIN read_parquet('{SF_SMOKE}/nation.parquet') n
              ON s.s_nationkey = n.n_nationkey
            GROUP BY 1, 2"""
    ).fetchall()
    con.close()
    per_nation = defaultdict(dict)
    for name, sk, cents in rows:
        per_nation[name][sk] = cents
    expect = {}
    for name, sups in per_nation.items():
        t = sum(sups.values())
        hhi = sum((c * 10000 // t) ** 2 for c in sups.values())
        expect[name] = (len(sups), hhi)

    got = {
        r.n_name: (r.n_suppliers, r.hhi_bp2)
        for r in REGISTRY["supplier_share_hhi"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_lagged_correlation_matches_bruteforce(spark):
    """ts_lagged_correlation must equal a direct per-lag Pearson r over
    the paired daily counts (numpy replica, rounded at 6)."""
    from collections import defaultdict
    from datetime import timedelta

    import duckdb
    import numpy as np

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT CAST(ts AS DATE) AS d,
                   CAST(count_if(event_type = 'click') AS BIGINT),
                   CAST(count_if(event_type = 'purchase') AS BIGINT)
            FROM read_parquet('{SF_SMOKE}/events.parquet') GROUP BY 1"""
    ).fetchall()
    con.close()
    clicks, purchases = {}, {}
    for d, c, p in rows:
        clicks[d], purchases[d] = c, p
    expect = {}
    for lag in range(8):
        pairs = [
            (clicks[d], purchases.get(d + timedelta(days=lag)))
            for d in clicks
            if d + timedelta(days=lag) in purchases
        ]
        xs = np.array([a for a, _ in pairs], dtype=float)
        ys = np.array([b for _, b in pairs], dtype=float)
        r = float(np.corrcoef(xs, ys)[0, 1])
        expect[lag] = (len(pairs), round(r, 6))

    got = {
        r.lag_days: (r.n_days, r.correlation)
        for r in REGISTRY["ts_lagged_correlation"].fn(spark, SF_SMOKE).collect()
    }
    for lag in range(8):
        assert got[lag][0] == expect[lag][0], lag
        assert abs(got[lag][1] - expect[lag][1]) <= 2e-6, (lag, got[lag], expect[lag])


def test_source_divergence_matches_bruteforce(spark):
    """profile_source_divergence must equal a direct Jensen-Shannon
    computation over the per-source token frequency dicts (math.log
    replica; tolerance one round(6) ulp for float-sum ordering)."""
    import math
    from collections import Counter, defaultdict
    from itertools import combinations

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        rf"""SELECT source,
                    unnest(string_split_regex(trim(lower(text)), '\s+'))
             FROM read_parquet('{SF_SMOKE}/documents.parquet')
             WHERE trim(text) <> ''"""
    ).fetchall()
    con.close()
    counts = defaultdict(Counter)
    for src, tok in rows:
        counts[src][tok] += 1
    totals = {s: sum(c.values()) for s, c in counts.items()}
    expect = {}
    for a, b in combinations(sorted(counts), 2):
        js = 0.0
        for tok in counts[a].keys() | counts[b].keys():
            pa = counts[a][tok] / totals[a]
            pb = counts[b][tok] / totals[b]
            m = 0.5 * pa + 0.5 * pb
            if pa > 0:
                js += 0.5 * pa * math.log(pa / m)
            if pb > 0:
                js += 0.5 * pb * math.log(pb / m)
        expect[(a, b)] = js

    got = {
        (r.src_a, r.src_b): r.js_nats
        for r in REGISTRY["profile_source_divergence"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expect)
    for k in expect:
        assert abs(got[k] - expect[k]) <= 2e-6, (k, got[k], expect[k])


def test_type_transitions_match_bruteforce(spark):
    """events_type_transitions must equal a direct per-user sequence
    walk: counts of adjacent (type -> next_type) under the (ts,
    event_id) ordering, with exact floor-ppm row normalization."""
    from collections import Counter, defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, ts, event_id, event_type FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    con.close()
    seqs = defaultdict(list)
    for uid, ts, eid, et in rows:
        seqs[uid].append((ts, eid, et))
    trans = Counter()
    for uid, evs in seqs.items():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            trans[(a, b)] += 1
    row_tot = Counter()
    for (a, _), n in trans.items():
        row_tot[a] += n
    expect = {
        k: (n, n * 1_000_000 // row_tot[k[0]]) for k, n in trans.items()
    }

    got = {
        (r.event_type, r.next_type): (r.n, r.prob_ppm)
        for r in REGISTRY["events_type_transitions"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_rfm_segments_match_bruteforce(spark):
    """customer_rfm_segments' fixed integer bands must equal a direct
    per-customer computation of recency/frequency/monetary and the band
    edges."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT o_custkey, CAST(max(o_orderdate) AS DATE),
                   CAST(count(*) AS BIGINT),
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            FROM read_parquet('{SF_SMOKE}/orders.parquet')
            GROUP BY o_custkey"""
    ).fetchall()
    mx = con.sql(
        f"SELECT CAST(max(o_orderdate) AS DATE) FROM "
        f"read_parquet('{SF_SMOKE}/orders.parquet')"
    ).fetchone()[0]
    con.close()

    def r_band(d):
        return 5 if d <= 90 else 4 if d <= 365 else 3 if d <= 730 else 2 if d <= 1460 else 1

    def f_band(n):
        return 5 if n >= 25 else 4 if n >= 10 else 3 if n >= 4 else 2 if n >= 2 else 1

    def m_band(c):
        return (
            5 if c >= 50_000_000 else 4 if c >= 20_000_000
            else 3 if c >= 5_000_000 else 2 if c >= 1_000_000 else 1
        )

    cells = defaultdict(int)
    for ck, last, freq, cents in rows:
        cells[(r_band((mx - last).days), f_band(freq), m_band(cents))] += 1

    got = {
        (r.r_score, r.f_score, r.m_score): r.n_customers
        for r in REGISTRY["customer_rfm_segments"].fn(spark, SF_SMOKE).collect()
    }
    assert got == dict(cells)


def test_rolling_distinct_users_matches_bruteforce(spark):
    """ts_rolling_distinct_users' 7x-explode rewrite must equal the
    direct definition: for each active day d, |distinct users active in
    [d-6, d]|."""
    from collections import defaultdict
    from datetime import timedelta

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT DISTINCT CAST(ts AS DATE), user_id FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    con.close()
    by_day = defaultdict(set)
    for d, uid in rows:
        by_day[d].add(uid)
    expect = {}
    for d in by_day:
        users = set()
        for k in range(7):
            users |= by_day.get(d - timedelta(days=k), set())
        expect[d] = len(users)

    got = {
        r.day: r.rolling_users
        for r in REGISTRY["ts_rolling_distinct_users"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_cumulative_distinct_matches_bruteforce(spark):
    """window_cumulative_distinct's first-appearance rewrite must equal
    the direct definition: per (nation, month), |distinct customers with
    any order in months <= m| — on every emitted month."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT n.n_name, date_trunc('month', o.o_orderdate), o.o_custkey
            FROM read_parquet('{SF_SMOKE}/orders.parquet') o
            JOIN read_parquet('{SF_SMOKE}/customer.parquet') c
              ON o.o_custkey = c.c_custkey
            JOIN read_parquet('{SF_SMOKE}/nation.parquet') n
              ON c.c_nationkey = n.n_nationkey"""
    ).fetchall()
    con.close()
    months = defaultdict(lambda: defaultdict(set))
    for name, m, ck in rows:
        months[name][m].add(ck)
    expect = {}
    for name, mm in months.items():
        seen = set()
        for m in sorted(mm):
            before = len(seen)
            seen |= mm[m]
            if len(seen) > before:  # emitted only when new customers appear
                expect[(name, m)] = len(seen)

    got = {
        (r.n_name, r.month): r.cumulative_customers
        for r in REGISTRY["window_cumulative_distinct"].fn(spark, SF_SMOKE).collect()
    }
    assert {(n, m.date() if hasattr(m, "date") else m): v for (n, m), v in got.items()} \
        == {(n, m.date() if hasattr(m, "date") else m): v for (n, m), v in expect.items()}


def test_ltv_deciles_match_bruteforce(spark):
    """customer_ltv_deciles' ntile(10) must equal the definition: sort
    customers by (cents, custkey), split into 10 buckets where the first
    n mod 10 buckets get the extra row."""
    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT o_custkey,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            FROM read_parquet('{SF_SMOKE}/orders.parquet') GROUP BY 1"""
    ).fetchall()
    con.close()
    ordered = sorted(rows, key=lambda t: (t[1], t[0]))
    n = len(ordered)
    base, extra = divmod(n, 10)
    expect = {}
    i = 0
    for dec in range(1, 11):
        size = base + (1 if dec <= extra else 0)
        chunk = ordered[i : i + size]
        i += size
        cents = [c for _, c in chunk]
        expect[dec] = (len(chunk), sum(cents), min(cents), max(cents))

    got = {
        r.decile: (r.n_customers, r.total_cents, r.min_cents, r.max_cents)
        for r in REGISTRY["customer_ltv_deciles"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_percent_change_matches_bruteforce(spark):
    """window_percent_change's basis-point month-over-month delta must
    equal direct consecutive-month arithmetic per nation. NOTE the
    division semantics this pin documents: Spark's DIV (and the DuckDB
    oracle) truncate toward ZERO, unlike Python's flooring // — negative
    deltas differ by one bp between the two conventions."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT n.n_name, date_trunc('month', o.o_orderdate),
                   CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
            FROM read_parquet('{SF_SMOKE}/orders.parquet') o
            JOIN read_parquet('{SF_SMOKE}/customer.parquet') c
              ON o.o_custkey = c.c_custkey
            JOIN read_parquet('{SF_SMOKE}/nation.parquet') n
              ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2"""
    ).fetchall()
    con.close()
    monthly = defaultdict(dict)
    for name, m, cents in rows:
        monthly[name][m] = cents
    def trunc_div(a, b):
        return abs(a) // b if a >= 0 else -(abs(a) // b)

    expect = {}
    for name, mm in monthly.items():
        ms = sorted(mm)
        for prev_m, m in zip(ms, ms[1:]):
            expect[(name, m)] = trunc_div(
                (mm[m] - mm[prev_m]) * 10000, mm[prev_m]
            )

    got = {
        (r.n_name, r.month): r.mom_change_bp
        for r in REGISTRY["window_percent_change"].fn(spark, SF_SMOKE).collect()
        if r.mom_change_bp is not None
    }
    norm = lambda m: m.date() if hasattr(m, "date") else m  # noqa: E731
    assert {(n_, norm(m)): v for (n_, m), v in got.items()} == {
        (n_, norm(m)): v for (n_, m), v in expect.items()
    }


def test_equidepth_histogram_matches_bruteforce(spark):
    """agg_histogram_equidepth must equal the direct computation: the
    i-th boundary is the smallest value whose cumulative count reaches
    i/10 of the rows; a row's bucket is 1 + #(boundaries strictly below
    it)."""
    from collections import Counter, defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    vals = [
        r[0]
        for r in duckdb.sql(
            f"SELECT l_extendedprice FROM "
            f"read_parquet('{SF_SMOKE}/lineitem.parquet')"
        ).fetchall()
    ]
    con.close()
    n = len(vals)
    grid = sorted(Counter(vals).items())
    bounds = []
    for i in range(1, 10):
        cum = 0
        for v, c in grid:
            cum += c
            if cum * 10 >= i * n:
                bounds.append(v)
                break
    agg = defaultdict(lambda: [0, float("inf"), float("-inf")])
    for v in vals:
        b = 1 + sum(1 for bd in bounds if v > bd)
        a = agg[b]
        a[0] += 1
        a[1] = min(a[1], v)
        a[2] = max(a[2], v)
    expect = {
        b: (cnt, round(lo, 2), round(hi, 2)) for b, (cnt, lo, hi) in agg.items()
    }

    got = {
        r.bucket: (r.n_rows, r.lo, r.hi)
        for r in REGISTRY["agg_histogram_equidepth"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_mad_anomaly_matches_bruteforce(spark):
    """ts_anomaly_mad must equal the direct definition: per type, median
    of cents (smallest value where 2*cum >= n), MAD = median of absolute
    deviations from it, anomalies = rows with |x - med| > 5*MAD."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT event_type, CAST(round(value * 100) AS BIGINT) FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    con.close()
    by_type = defaultdict(list)
    for et, c in rows:
        by_type[et].append(c)

    def disc_median(vals):
        vals = sorted(vals)
        n = len(vals)
        cum = 0
        last = None
        for v in vals:
            cum += 1
            if 2 * cum >= n:
                return v
        return last

    expect = {}
    for et, vals in by_type.items():
        med = disc_median(vals)
        mad = disc_median([abs(v - med) for v in vals])
        n_anom = sum(1 for v in vals if abs(v - med) > 5 * mad)
        expect[et] = (med, mad, n_anom, len(vals))

    got = {
        r.event_type: (r.med_cents, r.mad_cents, r.n_anomalies, r.n_events)
        for r in REGISTRY["ts_anomaly_mad"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_shingle_novelty_matches_bruteforce(spark):
    """text_shingle_novelty must equal the direct computation over each
    doc's DISTINCT 3-gram set: a shingle is novel iff this doc_id is the
    minimum doc_id containing it."""
    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    con.close()
    doc_shingles = {}
    for did, text in rows:
        toks = text.strip().lower().split()
        doc_shingles[did] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    first = {}
    for did in sorted(doc_shingles):
        for s in doc_shingles[did]:
            first.setdefault(s, did)
    expect = {}
    for did, ss in doc_shingles.items():
        if not ss:
            continue
        novel = sum(1 for s in ss if first[s] == did)
        expect[did] = (len(ss), novel, novel * 1_000_000 // len(ss))

    got = {
        r.doc_id: (r.n_shingles, r.n_novel, r.novelty_ppm)
        for r in REGISTRY["text_shingle_novelty"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_oov_rate_matches_bruteforce(spark):
    """vocab_oov_rate must equal the direct computation: top-20 vocab by
    (freq DESC, token) over all occurrences, then per-doc OOV occurrence
    counts in exact ppm."""
    from collections import Counter, defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_SMOKE}/documents.parquet') "
        "WHERE trim(text) <> ''"
    ).fetchall()
    con.close()
    doc_toks = {did: text.strip().lower().split() for did, text in rows}
    freq = Counter()
    for toks in doc_toks.values():
        freq.update(toks)
    vocab = {
        t for t, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    }
    expect = {}
    for did, toks in doc_toks.items():
        oov = sum(1 for t in toks if t not in vocab)
        expect[did] = (len(toks), oov, oov * 1_000_000 // len(toks))

    got = {
        r.doc_id: (r.n_tokens, r.n_oov, r.oov_ppm)
        for r in REGISTRY["vocab_oov_rate"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_geometric_mean_matches_bruteforce(spark):
    """agg_geometric_mean must equal exp(mean(ln cents)) computed in
    plain Python (tolerance one round(4) ulp for summation order)."""
    import math
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) "
        f"FROM read_parquet('{SF_SMOKE}/orders.parquet')"
    ).fetchall()
    con.close()
    groups = defaultdict(list)
    for p, c in rows:
        groups[p].append(c)
    expect = {
        p: (len(cs), math.exp(sum(math.log(c) for c in cs) / len(cs)))
        for p, cs in groups.items()
    }

    got = {
        r.o_orderpriority: (r.n_orders, r.geo_mean_cents)
        for r in REGISTRY["agg_geometric_mean"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expect)
    for p in expect:
        assert got[p][0] == expect[p][0]
        assert abs(got[p][1] - expect[p][1]) <= 2e-4, (p, got[p], expect[p])


def test_burst_detection_matches_bruteforce(spark):
    """events_burst_detection must equal the direct per-(user, minute)
    histogram: max/total/active-minute counts and the >= 5 flag."""
    from collections import Counter, defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, date_trunc('minute', ts) FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    con.close()
    per_user = defaultdict(Counter)
    for uid, m in rows:
        per_user[uid][m] += 1
    expect = {
        uid: (
            max(c.values()),
            sum(c.values()),
            len(c),
            1 if max(c.values()) >= 5 else 0,
        )
        for uid, c in per_user.items()
    }

    got = {
        r.user_id: (
            r.max_events_per_minute,
            r.n_events,
            r.n_active_minutes,
            r.burst_flag,
        )
        for r in REGISTRY["events_burst_detection"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_winsorize_matches_bruteforce(spark):
    """winsorize_prices must equal the direct definition: per group,
    clamp to [percentile_disc(.01), percentile_disc(.99)] (smallest
    value whose cumulative frequency reaches q) and report clamp counts
    and the exact winsorized cents sum."""
    import math
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT l_returnflag, l_extendedprice FROM "
        f"read_parquet('{SF_SMOKE}/lineitem.parquet')"
    ).fetchall()
    con.close()
    groups = defaultdict(list)
    for f, v in rows:
        groups[f].append(v)

    def pdisc(vals, q):
        return vals[max(0, math.ceil(q * len(vals)) - 1)]

    expect = {}
    for f, vs in groups.items():
        vs.sort()
        p01, p99 = pdisc(vs, 0.01), pdisc(vs, 0.99)
        n_clamped = sum(1 for v in vs if v < p01 or v > p99)
        s = sum(int(round(100 * min(max(v, p01), p99))) for v in vs)
        expect[f] = (len(vs), n_clamped, s)

    got = {
        r.l_returnflag: (r.n_rows, r.n_clamped, r.sum_winsorized_cents)
        for r in REGISTRY["winsorize_prices"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_join_fanout_matches_bruteforce(spark):
    """profile_join_fanout's count-table join must equal the direct
    per-user view x click product, top-10 by contribution with the key
    tie-break."""
    from collections import Counter

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, event_type FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet') "
        "WHERE event_type IN ('view', 'click')"
    ).fetchall()
    con.close()
    views, clicks = Counter(), Counter()
    for uid, et in rows:
        (views if et == "view" else clicks)[uid] += 1
    prods = [
        (uid, views[uid], clicks[uid], views[uid] * clicks[uid])
        for uid in views.keys() & clicks.keys()
    ]
    expect = sorted(prods, key=lambda t: (-t[3], t[0]))[:10]

    got = [
        (r.key_value, r.n_left, r.n_right, r.out_rows)
        for r in REGISTRY["profile_join_fanout"].fn(spark, SF_SMOKE).collect()
    ]
    assert got == expect


def test_gap_stats_match_bruteforce(spark):
    """orders_gap_stats must equal direct consecutive-order day gaps per
    customer under the (orderdate, orderkey) ordering, with the x100
    fixed-point truncating mean."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT o_custkey, CAST(o_orderdate AS DATE), o_orderkey FROM "
        f"read_parquet('{SF_SMOKE}/orders.parquet')"
    ).fetchall()
    con.close()
    per_cust = defaultdict(list)
    for ck, d, ok in rows:
        per_cust[ck].append((d, ok))
    expect = {}
    for ck, orders in per_cust.items():
        orders.sort()
        gaps = [
            (b[0] - a[0]).days for a, b in zip(orders, orders[1:])
        ]
        if gaps:
            expect[ck] = (
                len(gaps),
                min(gaps),
                max(gaps),
                sum(gaps) * 100 // len(gaps),
            )

    got = {
        r.o_custkey: (r.n_gaps, r.min_gap_days, r.max_gap_days, r.avg_gap_days_x100)
        for r in REGISTRY["orders_gap_stats"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_dataset_card_matches_bruteforce(spark):
    """corpus_dataset_card's eight long-format metrics must equal a
    direct Python computation over the normalized corpus (trim+lower,
    whitespace tokens, md5 exact-dup accounting)."""
    from collections import Counter

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, lang, source, text, n_chars FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet') WHERE trim(text) <> ''"
    ).fetchall()
    con.close()
    norm = [(d, l, s, t.strip().lower(), nc) for d, l, s, t, nc in rows]
    toks = [t.split() for _, _, _, t, _ in norm]
    n_docs = len(norm)
    n_tokens = sum(len(ts) for ts in toks)
    dup_counter = Counter(t for _, _, _, t, _ in norm)
    extra = sum(n - 1 for n in dup_counter.values() if n > 1)
    expect = {
        "n_docs": n_docs,
        "n_tokens": n_tokens,
        "n_chars": sum(nc for *_, nc in norm),
        "n_langs": len({l for _, l, *_ in norm}),
        "n_sources": len({s for _, _, s, *_ in norm}),
        "vocab_size": len({tk for ts in toks for tk in ts}),
        "mean_doc_tokens_x100": n_tokens * 100 // n_docs,
        "exact_dup_ppm": extra * 1_000_000 // n_docs,
    }

    got = {
        r.metric: r.value
        for r in REGISTRY["corpus_dataset_card"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_psi_terms_match_bruteforce(spark):
    """profile_psi_event_types must equal a direct PSI computation over
    the two time windows: bins present in only one window excluded from
    terms AND totals, psi_term = (pa-pb)*ln(pa/pb) (math.log replica,
    one round(6) ulp tolerance), counts exact."""
    from datetime import datetime
    import math

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT event_type, ts FROM read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    con.close()
    cut = datetime(2024, 1, 16)
    na, nb = {}, {}
    for et, ts in rows:
        if ts < cut:
            na[et] = na.get(et, 0) + 1
        else:
            nb[et] = nb.get(et, 0) + 1
    both = sorted(set(na) & set(nb))
    ta = sum(na[e] for e in both)
    tb = sum(nb[e] for e in both)
    expect = {}
    for e in both:
        pa, pb = na[e] / ta, nb[e] / tb
        expect[e] = (na[e], nb[e], (pa - pb) * math.log(pa / pb))

    got = {
        r.event_type: (r.n_a, r.n_b, r.psi_term)
        for r in REGISTRY["profile_psi_event_types"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expect)
    for e in expect:
        assert got[e][:2] == expect[e][:2], e
        assert abs(got[e][2] - expect[e][2]) <= 2e-6, (e, got[e], expect[e])


def test_bigram_surprisal_matches_bruteforce(spark):
    """text_bigram_surprisal must equal a direct add-one-smoothed bigram
    LM walk: corpus counts c(w1,w2) and c(w1.) from the bigram table, V
    = distinct second tokens, per-doc mean of ln(c(w1.)+V) - ln(c+1)."""
    import math
    from collections import Counter

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        f" WHERE trim(text) <> ''"
    ).fetchall()
    con.close()
    doc_bigrams = {
        d: list(zip(t.strip().lower().split(), t.strip().lower().split()[1:]))
        for d, t in rows
    }
    cb = Counter(b for bs in doc_bigrams.values() for b in bs)
    cu = Counter()
    for (w1, _), n in cb.items():
        cu[w1] += n
    vocab = len({w2 for _, w2 in cb})
    expect = {}
    for d, bs in doc_bigrams.items():
        if not bs:
            continue
        s = sum(math.log(cu[w1] + vocab) - math.log(cb[(w1, w2)] + 1) for w1, w2 in bs)
        expect[d] = (len(bs), s / len(bs))

    got = {
        r.doc_id: (r.n_bigrams, r.surprisal_nats)
        for r in REGISTRY["text_bigram_surprisal"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expect)
    for d in expect:
        assert got[d][0] == expect[d][0], d
        assert abs(got[d][1] - expect[d][1]) <= 2e-6, (d, got[d], expect[d])


def test_benford_matches_bruteforce(spark):
    """dq_benford_first_digit must equal a direct leading-digit count
    over integer cents, exact floor-ppm shares, and the closed-form
    log10(1 + 1/d) expectation in integer ppm."""
    import math
    from collections import Counter

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT o_totalprice FROM read_parquet('{SF_SMOKE}/orders.parquet')"
        f" WHERE o_totalprice > 0"
    ).fetchall()
    con.close()
    digits = Counter(int(str(int(round(p * 100)))[0]) for (p,) in rows)
    total = sum(digits.values())
    expect = {
        d: (
            n,
            n * 1_000_000 // total,
            int(round(math.log10(1 + 1 / d) * 1_000_000)),
        )
        for d, n in digits.items()
    }

    got = {
        r.digit: (r.n, r.observed_ppm, r.benford_ppm)
        for r in REGISTRY["dq_benford_first_digit"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_higher_moments_match_bruteforce(spark):
    """agg_higher_moments must equal exact integer power sums (python
    bigints — overflow-proof) fed through the same double central-moment
    formulas; tolerance one round(6) ulp for the pow() seam."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT o_orderpriority, o_totalprice FROM "
        f"read_parquet('{SF_SMOKE}/orders.parquet')"
    ).fetchall()
    con.close()
    sums = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, s1..s4
    for pri, p in rows:
        c = int(round(p * 100))
        s = sums[pri]
        s[0] += 1
        s[1] += c
        s[2] += c * c
        s[3] += c * c * c
        s[4] += c * c * c * c
    expect = {}
    for pri, (n, s1, s2, s3, s4) in sums.items():
        m1 = float(s1) / n
        d2 = float(s2) / n
        d3 = float(s3) / n
        d4 = float(s4) / n
        m2 = d2 - m1 * m1
        m3 = d3 - 3 * m1 * d2 + 2 * m1 * m1 * m1
        m4 = d4 - 4 * m1 * d3 + 6 * m1 * m1 * d2 - 3 * m1 * m1 * m1 * m1
        expect[pri] = (n, m3 / m2**1.5, m4 / (m2 * m2) - 3)

    got = {
        r.o_orderpriority: (r.n, r.skewness, r.excess_kurtosis)
        for r in REGISTRY["agg_higher_moments"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expect)
    for pri in expect:
        assert got[pri][0] == expect[pri][0], pri
        assert abs(got[pri][1] - expect[pri][1]) <= 2e-6, (pri, got[pri], expect[pri])
        assert abs(got[pri][2] - expect[pri][2]) <= 2e-6, (pri, got[pri], expect[pri])


def test_linear_regression_matches_bruteforce(spark):
    """agg_linear_regression must equal the normal equations over exact
    integer sums (python bigints) computed independently per return
    flag; tolerance one round(6) ulp."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT l_returnflag, l_discount, l_quantity FROM "
        f"read_parquet('{SF_SMOKE}/lineitem.parquet')"
    ).fetchall()
    con.close()
    sums = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, sx, sy, sxy, sxx
    for rf, disc, qty in rows:
        x, y = int(round(disc * 100)), int(round(qty))
        s = sums[rf]
        s[0] += 1
        s[1] += x
        s[2] += y
        s[3] += x * y
        s[4] += x * x
    expect = {}
    for rf, (n, sx, sy, sxy, sxx) in sums.items():
        slope = (float(n) * sxy - float(sx) * sy) / (float(n) * sxx - float(sx) * sx)
        intercept = (float(sy) - slope * sx) / n
        expect[rf] = (n, slope, intercept)

    got = {
        r.l_returnflag: (r.n, r.slope, r.intercept)
        for r in REGISTRY["agg_linear_regression"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expect)
    for rf in expect:
        assert got[rf][0] == expect[rf][0], rf
        assert abs(got[rf][1] - expect[rf][1]) <= 2e-6, (rf, got[rf], expect[rf])
        assert abs(got[rf][2] - expect[rf][2]) <= 2e-6, (rf, got[rf], expect[rf])


def test_ood_maxcos_matches_bruteforce(spark):
    """embed_ood_maxcos must equal a direct computation: 2^20-quantized
    elements, per-(label,pos) floor-mean centroids, integer dot products,
    argmax over ROUNDED cosines with label tie-break, ood at 0.5."""
    import math
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT vec_id, label, embedding FROM "
        f"read_parquet('{SF_SMOKE}/embeddings.parquet')"
    ).fetchall()
    con.close()
    vecs = {
        vid: (lab, [int(math.floor(float(x) * 1048576 + 0.5)) for x in emb])
        for vid, lab, emb in rows
    }
    by_label = defaultdict(list)
    for _, (lab, v) in vecs.items():
        by_label[lab].append(v)
    cents = {
        lab: [int(math.floor(sum(col) / len(vs))) for col in zip(*vs)]
        for lab, vs in by_label.items()
    }
    expect = {}
    for vid, (_, v) in vecs.items():
        best = None
        for lab in sorted(cents):
            c = cents[lab]
            cos = round(
                sum(a * b for a, b in zip(v, c))
                / (
                    math.sqrt(sum(a * a for a in v))
                    * math.sqrt(sum(b * b for b in c))
                ),
                6,
            )
            if best is None or cos > best[1]:
                best = (lab, cos)
        expect[vid] = (int(best[0]), best[1], 1 if best[1] < 0.5 else 0)

    got = {
        r.vec_id: (r.best_label, r.max_cos, r.ood_flag)
        for r in REGISTRY["embed_ood_maxcos"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expect)
    for vid in expect:
        assert got[vid][0] == expect[vid][0], vid
        assert abs(got[vid][1] - expect[vid][1]) <= 2e-6, (vid, got[vid], expect[vid])
        assert got[vid][2] == expect[vid][2], vid


def test_seasonal_backtest_matches_bruteforce(spark):
    """ts_seasonal_backtest must equal a direct seasonal-naive MAE:
    each day scored against the same weekday last week, exact integers."""
    from collections import Counter
    from datetime import timedelta

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT CAST(ts AS DATE) FROM read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    con.close()
    daily = Counter(d for (d,) in rows)
    scored = [
        abs(daily[d] - daily[d - timedelta(days=7)])
        for d in daily
        if d - timedelta(days=7) in daily
    ]
    expect = (len(scored), sum(scored), sum(scored) * 100 // len(scored))

    r = REGISTRY["ts_seasonal_backtest"].fn(spark, SF_SMOKE).collect()[0]
    assert (r.n_days_scored, r.total_abs_err, r.mae_x100) == expect


def test_weighted_median_matches_bruteforce(spark):
    """agg_weighted_median must equal the smallest price whose cumulative
    quantity weight reaches half the total (exact integer sweep)."""
    from collections import Counter

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT l_extendedprice, l_quantity FROM "
        f"read_parquet('{SF_SMOKE}/lineitem.parquet')"
    ).fetchall()
    con.close()
    w = Counter()
    for p, q in rows:
        w[int(round(p * 100))] += int(q)
    total = sum(w.values())
    cum = 0
    median = None
    for cents in sorted(w):
        cum += w[cents]
        if 2 * cum >= total:
            median = cents
            break

    r = REGISTRY["agg_weighted_median"].fn(spark, SF_SMOKE).collect()[0]
    assert (r.weighted_median_cents, r.total_weight) == (median, total)


def test_largest_remainder_matches_bruteforce(spark):
    """alloc_largest_remainder must equal a direct Hamilton-method
    allocation: floor quotas, leftovers to the largest remainders with
    lexicographic tie-break, quotas summing exactly to the budget."""
    from collections import Counter

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT lang FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    con.close()
    counts = Counter(l for (l,) in rows)
    total = sum(counts.values())
    floor_q = {l: 10_000 * n // total for l, n in counts.items()}
    rem = {l: 10_000 * n % total for l, n in counts.items()}
    leftover = 10_000 - sum(floor_q.values())
    order = sorted(counts, key=lambda l: (-rem[l], l))
    expect = {
        l: (counts[l], floor_q[l] + (1 if i < leftover else 0))
        for i, l in enumerate(order)
    }
    assert sum(q for _, q in expect.values()) == 10_000  # exactness law

    got = {
        r.lang: (r.n_docs, r.quota)
        for r in REGISTRY["alloc_largest_remainder"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_intervals_coverage_matches_bruteforce(spark):
    """intervals_merge_coverage must equal a direct per-user sweep-line
    union of the 10-minute activity intervals (touching intervals merge;
    coverage in whole seconds via integer microsecond floors)."""
    from collections import defaultdict
    from datetime import timedelta

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, ts FROM read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    con.close()
    per_user = defaultdict(list)
    ten = timedelta(minutes=10)
    for u, ts in rows:
        per_user[u].append((ts, ts + ten))
    expect = {}
    for u, iv in per_user.items():
        iv.sort()
        islands = []
        cs, ce = iv[0]
        for s, e in iv[1:]:
            if s > ce:
                islands.append((cs, ce))
                cs, ce = s, e
            else:
                ce = max(ce, e)
        islands.append((cs, ce))
        us = sum(
            (e - s) // timedelta(microseconds=1) for s, e in islands
        )
        expect[u] = (len(islands), us // 1_000_000)

    got = {
        r.user_id: (r.n_islands, r.covered_seconds)
        for r in REGISTRY["intervals_merge_coverage"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_proportional_carve_matches_bruteforce(spark):
    """sample_proportional_carve must equal a direct largest-remainder
    carve of a total//10 budget, with n_sampled = min(quota, n_docs) and
    zero-quota languages absent from the output."""
    from collections import Counter

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT lang FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    con.close()
    counts = Counter(l for (l,) in rows)
    total = sum(counts.values())
    budget = total // 10
    floor_q = {l: budget * n // total for l, n in counts.items()}
    rem = {l: budget * n % total for l, n in counts.items()}
    leftover = budget - sum(floor_q.values())
    order = sorted(counts, key=lambda l: (-rem[l], l))
    quota = {
        l: floor_q[l] + (1 if i < leftover else 0) for i, l in enumerate(order)
    }
    assert sum(quota.values()) == budget  # exactness law
    expect = {
        l: (min(q, counts[l]), q) for l, q in quota.items() if q > 0
    }

    got = {
        r.lang: (r.n_sampled, r.quota)
        for r in REGISTRY["sample_proportional_carve"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_snapshot_diff_matches_bruteforce(spark):
    """dq_snapshot_diff must equal a direct old-vs-new aggregate diff
    with exact integer value folding."""
    from collections import Counter, defaultdict
    from datetime import datetime

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, event_type, ts, value FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    con.close()
    cut = datetime(2024, 1, 28)
    old, new = defaultdict(lambda: [0, 0]), defaultdict(lambda: [0, 0])
    for u, et, ts, v in rows:
        cents = int(round(v * 100))
        new[(u, et)][0] += 1
        new[(u, et)][1] += cents
        if ts < cut:
            old[(u, et)][0] += 1
            old[(u, et)][1] += cents
    classes = Counter()
    for k, nv in new.items():
        if k not in old:
            classes["inserted"] += 1
        elif old[k] == nv:
            classes["unchanged"] += 1
        else:
            classes["changed"] += 1

    got = {
        r.change_type: r.n_keys
        for r in REGISTRY["dq_snapshot_diff"].fn(spark, SF_SMOKE).collect()
    }
    assert got == dict(classes)


def test_zipf_fit_matches_bruteforce(spark):
    """text_zipf_fit must equal a direct OLS of ln(freq) on ln(rank)
    over the deterministic top-100 terms, negated."""
    import math
    from collections import Counter

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        f" WHERE trim(text) <> ''"
    ).fetchall()
    con.close()
    freq = Counter(tok for (t,) in rows for tok in t.strip().lower().split())
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    n = len(top)
    sx = sum(math.log(r) for r in range(1, n + 1))
    sy = sum(math.log(f) for _, f in top)
    sxy = sum(math.log(r) * math.log(f) for r, (_, f) in enumerate(top, 1))
    sxx = sum(math.log(r) ** 2 for r in range(1, n + 1))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)

    r = REGISTRY["text_zipf_fit"].fn(spark, SF_SMOKE).collect()[0]
    assert r.n == n
    assert abs(r.zipf_exponent - (-slope)) <= 2e-6, (r.zipf_exponent, -slope)


def test_lead_time_percentiles_match_bruteforce(spark):
    """supplier_lead_time_percentiles must equal a direct per-supplier
    grid sweep: p50/p90 as the smallest day-gap whose cumulative count
    crosses the integer rank (percentile_disc semantics)."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT l.l_suppkey, CAST(l.l_shipdate AS DATE),
                   CAST(o.o_orderdate AS DATE)
            FROM read_parquet('{SF_SMOKE}/lineitem.parquet') l
            JOIN read_parquet('{SF_SMOKE}/orders.parquet') o
              ON o.o_orderkey = l.l_orderkey"""
    ).fetchall()
    con.close()
    per_supp = defaultdict(list)
    for sk, ship, od in rows:
        per_supp[sk].append((ship - od).days)
    expect = {}
    for sk, days in per_supp.items():
        days.sort()
        t = len(days)
        p50 = next(d for i, d in enumerate(days, 1) if 2 * i >= t)
        p90 = next(d for i, d in enumerate(days, 1) if 10 * i >= 9 * t)
        expect[sk] = (t, p50, p90)

    got = {
        r.s_suppkey: (r.n_lines, r.p50_days, r.p90_days)
        for r in REGISTRY["supplier_lead_time_percentiles"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_length_percentiles_by_lang_match_bruteforce(spark):
    """text_length_percentiles_by_lang must equal the direct per-language
    token-length grid sweep."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT lang, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        f" WHERE trim(text) <> ''"
    ).fetchall()
    con.close()
    per_lang = defaultdict(list)
    for lang, t in rows:
        per_lang[lang].append(len(t.strip().lower().split()))
    expect = {}
    for lang, lens in per_lang.items():
        lens.sort()
        t = len(lens)
        p50 = next(v for i, v in enumerate(lens, 1) if 2 * i >= t)
        p90 = next(v for i, v in enumerate(lens, 1) if 10 * i >= 9 * t)
        expect[lang] = (t, p50, p90)

    got = {
        r.lang: (r.n_docs, r.p50_tokens, r.p90_tokens)
        for r in REGISTRY["text_length_percentiles_by_lang"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_sessions_detail_matches_bruteforce(spark):
    """events_sessions_detail must equal a direct per-user walk with the
    30-minute-gap break under the (ts, event_id) ordering."""
    from collections import defaultdict
    from datetime import timedelta

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, ts, event_id FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    con.close()
    per_user = defaultdict(list)
    for u, ts, eid in rows:
        per_user[u].append((ts, eid))
    gap = timedelta(minutes=30)
    expect = {}
    for u, evs in per_user.items():
        evs.sort()
        sid = 0
        prev = None
        sessions = defaultdict(list)
        for ts, _ in evs:
            if prev is None or ts - prev > gap:
                sid += 1
            sessions[sid].append(ts)
            prev = ts
        for sid, tss in sessions.items():
            expect[(u, sid)] = (min(tss), max(tss), len(tss))

    got = {
        (r.user_id, r.session_id): (r.session_start, r.session_end, r.n_events)
        for r in REGISTRY["events_sessions_detail"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_adjacent_dedup_matches_bruteforce(spark):
    """events_adjacent_dedup must equal a direct per-user run-length walk
    with exact floor-ppm collapse ratios."""
    from collections import Counter, defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, ts, event_id, event_type FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    con.close()
    per_user = defaultdict(list)
    for u, ts, eid, et in rows:
        per_user[u].append((ts, eid, et))
    n_events, n_runs = Counter(), Counter()
    for u, evs in per_user.items():
        evs.sort(key=lambda x: (x[0], x[1]))
        prev = object()
        for _, _, et in evs:
            n_events[et] += 1
            if et != prev:
                n_runs[et] += 1
            prev = et
    expect = {
        et: (
            n_events[et],
            n_runs[et],
            (n_events[et] - n_runs[et]) * 1_000_000 // n_events[et],
        )
        for et in n_events
    }

    got = {
        r.event_type: (r.n_events, r.n_runs, r.collapse_ppm)
        for r in REGISTRY["events_adjacent_dedup"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_time_range_frame_matches_bruteforce(spark):
    """window_time_range_frame must equal a direct trailing-30-day
    inclusion sweep per customer (RANGE semantics: same-date peers share
    frames; the bound is orderdate - 30 days inclusive)."""
    from collections import defaultdict
    from datetime import timedelta

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM "
        f"read_parquet('{SF_SMOKE}/orders.parquet')"
    ).fetchall()
    con.close()
    per_cust = defaultdict(list)
    for ck, ok, od, p in rows:
        per_cust[ck].append((od, ok, int(round(p * 100))))
    expect = {}
    back = timedelta(days=30)
    for ck, orders in per_cust.items():
        for od, ok, _ in orders:
            in_frame = [c for d, _, c in orders if od - back <= d <= od]
            expect[(ck, ok)] = (sum(in_frame), len(in_frame))

    got = {
        (r.o_custkey, r.o_orderkey): (r.trail30_cents, r.trail30_orders)
        for r in REGISTRY["window_time_range_frame"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_topk_with_ties_matches_bruteforce(spark):
    """topk_with_ties must equal the direct rank()<=3 cut: rank = 1 +
    count of strictly greater balances in the nation, keeping ALL
    boundary ties."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT n.n_name, c.c_custkey, c.c_acctbal
            FROM read_parquet('{SF_SMOKE}/customer.parquet') c
            JOIN read_parquet('{SF_SMOKE}/nation.parquet') n
              ON c.c_nationkey = n.n_nationkey"""
    ).fetchall()
    con.close()
    per_nation = defaultdict(list)
    for nn, ck, bal in rows:
        per_nation[nn].append((int(round(bal * 100)), ck))
    expect = set()
    for nn, cs in per_nation.items():
        bals = [b for b, _ in cs]
        for b, ck in cs:
            rnk = 1 + sum(1 for x in bals if x > b)
            if rnk <= 3:
                expect.add((nn, ck, b, rnk))

    got = {
        (r.n_name, r.c_custkey, r.bal_cents, r.rnk)
        for r in REGISTRY["topk_with_ties"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_boolean_family_matches_bruteforce(spark):
    """agg_boolean_family must equal direct conditional counts and
    ALL/ANY reductions per priority."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT o_orderpriority, o_totalprice, o_orderstatus FROM "
        f"read_parquet('{SF_SMOKE}/orders.parquet')"
    ).fetchall()
    con.close()
    groups = defaultdict(list)
    for pri, p, st in rows:
        groups[pri].append((p, st))
    expect = {
        pri: (
            len(g),
            sum(1 for p, _ in g if p > 400000),
            sum(1 for _, s in g if s == "F"),
            all(p > 1000 for p, _ in g),
            any(s == "P" for _, s in g),
        )
        for pri, g in groups.items()
    }

    got = {
        r.o_orderpriority: (r.n_orders, r.n_big, r.n_fulfilled, r.all_above_1k, r.any_pending)
        for r in REGISTRY["agg_boolean_family"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_dup_source_matrix_matches_bruteforce(spark):
    """profile_dup_source_matrix must equal a direct fingerprint-pair
    count: md5 of the first 8 normalized tokens per doc, per-source
    counts, and for each source pair the shared-fingerprint count plus
    the implied cross-source duplicate pairs sum(n_a * n_b)."""
    import hashlib
    from collections import Counter, defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT source, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    con.close()
    per = Counter()
    for src, t in rows:
        fp = hashlib.md5(
            " ".join(t.strip().lower().split()[:8]).encode()
        ).hexdigest()
        per[(fp, src)] += 1
    by_fp = defaultdict(list)
    for (fp, src), n in per.items():
        by_fp[fp].append((src, n))
    shared, pairs = Counter(), Counter()
    for fp, srcs in by_fp.items():
        srcs.sort()
        for i in range(len(srcs)):
            for j in range(i + 1, len(srcs)):
                key = (srcs[i][0], srcs[j][0])
                shared[key] += 1
                pairs[key] += srcs[i][1] * srcs[j][1]
    expect = {k: (shared[k], pairs[k]) for k in shared}

    got = {
        (r.source_a, r.source_b): (r.shared_fingerprints, r.dup_pairs)
        for r in REGISTRY["profile_dup_source_matrix"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_chunk_dedup_matches_bruteforce(spark):
    """multimodal_chunk_dedup must equal direct 256-byte chunk hashing
    over the doc_id<100 slice with exact floor-ppm savings."""
    import hashlib
    from collections import Counter

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        f" WHERE doc_id < 100"
    ).fetchall()
    con.close()
    hashes = Counter()
    for (t,) in rows:
        b = t.encode()
        for i in range(0, len(b), 256):
            hashes[hashlib.md5(b[i : i + 256]).hexdigest()] += 1
    n_chunks = sum(hashes.values())
    dedupable = sum(c - 1 for c in hashes.values() if c > 1)
    expect = (
        n_chunks,
        len(hashes),
        dedupable,
        dedupable * 1_000_000 // n_chunks,
    )

    r = REGISTRY["multimodal_chunk_dedup"].fn(spark, SF_SMOKE).collect()[0]
    assert (
        r.n_chunks,
        r.n_distinct_chunks,
        r.n_dedupable_chunks,
        r.dedup_savings_ppm,
    ) == expect


def test_ivf_index_stats_match_bruteforce(spark):
    """sim_ivf_index_stats must equal a direct inverted-file build:
    centroids are vec_id % 100 == 0, each vector assigned to the argmax
    of ROUND(cosine, 6) with cid tie-break, bucket sizes and exact
    floor-ppm shares."""
    import math

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{SF_SMOKE}/embeddings.parquet')"
    ).fetchall()
    con.close()
    vecs = {vid: [float(x) for x in emb] for vid, emb in rows}
    cents = {vid: v for vid, v in vecs.items() if vid % 100 == 0}
    norms = {vid: math.sqrt(sum(x * x for x in v)) for vid, v in vecs.items()}
    sizes = {}
    for vid, v in vecs.items():
        best = None
        for cid in sorted(cents):
            cos = round(
                sum(a * b for a, b in zip(v, cents[cid]))
                / (norms[vid] * norms[cid]),
                6,
            )
            if best is None or cos > best[1]:
                best = (cid, cos)
        sizes[best[0]] = sizes.get(best[0], 0) + 1
    total = sum(sizes.values())
    expect = {
        cid: (n, n * 1_000_000 // total) for cid, n in sizes.items()
    }

    got = {
        r.cid: (r.n_vecs, r.share_ppm)
        for r in REGISTRY["sim_ivf_index_stats"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_nth_value_matches_bruteforce(spark):
    """window_nth_value must equal the direct 2nd/3rd-highest pick per
    customer under the (cents DESC, orderkey) ordering."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT o_custkey, o_orderkey, o_totalprice FROM "
        f"read_parquet('{SF_SMOKE}/orders.parquet')"
    ).fetchall()
    con.close()
    per_cust = defaultdict(list)
    for ck, ok, p in rows:
        per_cust[ck].append((-int(round(p * 100)), ok))
    expect = {}
    for ck, orders in per_cust.items():
        if len(orders) < 3:
            continue
        orders.sort()
        expect[ck] = (len(orders), -orders[1][0], -orders[2][0])

    got = {
        r.o_custkey: (r.n_orders, r.second_cents, r.third_cents)
        for r in REGISTRY["window_nth_value"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_stream_hygiene_matches_bruteforce(spark):
    """pipeline_stream_hygiene's five metrics must equal a direct walk:
    event count, adjacent-run starts, 30-minute sessions, bursty users
    (any minute with >3 events), and total PSI in micro-units (per-bin
    terms rounded at 6 BEFORE summing, matching both engines)."""
    import math
    from collections import Counter, defaultdict
    from datetime import datetime, timedelta

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, ts, event_id, event_type FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    con.close()
    per_user = defaultdict(list)
    for u, ts, eid, et in rows:
        per_user[u].append((ts, eid, et))
    n_runs = n_sess = 0
    gap = timedelta(minutes=30)
    for evs in per_user.values():
        evs.sort(key=lambda x: (x[0], x[1]))
        prev_t, prev_ts = object(), None
        for ts, _, et in evs:
            if et != prev_t:
                n_runs += 1
            if prev_ts is None or ts - prev_ts > gap:
                n_sess += 1
            prev_t, prev_ts = et, ts
    minute_counts = Counter(
        (u, ts.replace(second=0, microsecond=0)) for u, ts, _, _ in rows
    )
    bursty = len({u for (u, _), c in minute_counts.items() if c > 3})
    cut = datetime(2024, 1, 16)
    na, nb = Counter(), Counter()
    for _, ts, _, et in rows:
        (na if ts < cut else nb)[et] += 1
    both = set(na) & set(nb)
    ta, tb = sum(na[e] for e in both), sum(nb[e] for e in both)
    psi = sum(
        round((na[e] / ta - nb[e] / tb) * math.log((na[e] / ta) / (nb[e] / tb)), 6)
        for e in both
    )
    expect = {
        "n_events": len(rows),
        "n_adjacent_runs": n_runs,
        "n_sessions": n_sess,
        "n_bursty_users": bursty,
        "psi_microunits": int(round(psi * 1_000_000)),
    }

    got = {
        r.metric: r.value
        for r in REGISTRY["pipeline_stream_hygiene"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_ivf_recall_eval_matches_bruteforce(spark):
    """sim_ivf_recall_eval must equal a direct end-to-end IVF replica:
    nearest-centroid inverted file, 2-probe bucket search, top-5 by
    rounded cosine with id tie-breaks, recall@5 vs the exact top-5."""
    import math

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{SF_SMOKE}/embeddings.parquet')"
    ).fetchall()
    con.close()
    vecs = {vid: [float(x) for x in emb] for vid, emb in rows}
    norms = {vid: math.sqrt(sum(x * x for x in v)) for vid, v in vecs.items()}
    cents = sorted(vid for vid in vecs if vid % 100 == 0)

    def rcos(a, b):
        return round(
            sum(x * y for x, y in zip(vecs[a], vecs[b])) / (norms[a] * norms[b]), 6
        )

    asg = {}
    for vid in vecs:
        best = max(cents, key=lambda c: (rcos(vid, c), -c))
        asg.setdefault(best, []).append(vid)
    queries = sorted(v for v in vecs if v < 10)
    expect = {}
    for q in queries:
        probes = sorted(cents, key=lambda c: (-rcos(q, c), c))[:2]
        cand = {n for c in probes for n in asg.get(c, []) if n != q}
        ivf5 = set(sorted(cand, key=lambda n: (-rcos(q, n), n))[:5])
        exact5 = set(
            sorted((n for n in vecs if n != q), key=lambda n: (-rcos(q, n), n))[:5]
        )
        hits = len(ivf5 & exact5)
        expect[q] = (hits, hits * 1_000_000 // 5)

    got = {
        r.query_id: (r.n_hits, r.recall_ppm)
        for r in REGISTRY["sim_ivf_recall_eval"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def _minhash_replica(sf_dir):
    """Shared direct MinHash machinery for the calibration/report pins:
    3-gram shingle sets, 8 md5-derived min-hashes, 4 bands of 2 rows.
    Returns (shingle_sets, sigs, banded candidate pairs)."""
    import hashlib
    from collections import defaultdict

    import duckdb

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()
    sets, sigs = {}, {}
    for did, t in rows:
        toks = t.strip().lower().split()
        sh = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
        if not sh:
            continue
        sets[did] = sh
        sigs[did] = [
            min(
                int(hashlib.md5(f"{k}:{s}".encode()).hexdigest()[:15], 16)
                for s in sh
            )
            for k in range(8)
        ]
    buckets = defaultdict(set)
    for did, m in sigs.items():
        for band in range(4):
            buckets[(band, f"{m[2*band]}_{m[2*band+1]}")].add(did)
    cand = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    return sets, sigs, cand


def test_minhash_calibration_matches_bruteforce(spark):
    """dedup_minhash_calibration must equal the direct estimator-vs-exact
    table: signature-agreement ppm, exact shingle Jaccard ppm, abs error
    — for every banded candidate pair sharing at least one shingle."""
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    sets, sigs, cand = _minhash_replica(SF_SMOKE)
    expect = {}
    for a, b in cand:
        ni = len(sets[a] & sets[b])
        if ni == 0:
            continue
        est = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y) * 1_000_000 // 8
        exact = ni * 1_000_000 // (len(sets[a]) + len(sets[b]) - ni)
        expect[(a, b)] = (est, exact, abs(est - exact))

    got = {
        (r.doc_a, r.doc_b): (r.est_ppm, r.exact_ppm, r.abs_err_ppm)
        for r in REGISTRY["dedup_minhash_calibration"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_dedup_report_matches_bruteforce(spark):
    """pipeline_dedup_report's three method rows must equal direct
    computations: exact normalized-hash groups, first-8-token prefix
    groups, and verified (Jaccard >= 0.5) MinHash pairs with the
    distinct-doc vs distinct-anchor removable bound."""
    import hashlib
    from collections import Counter

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        f" WHERE trim(text) <> ''"
    ).fetchall()
    con.close()
    norm = {d: t.strip().lower() for d, t in rows}
    exact_groups = Counter(
        hashlib.md5(t.encode()).hexdigest() for t in norm.values()
    )
    eg = [n for n in exact_groups.values() if n > 1]
    prefix_groups = Counter(
        hashlib.md5(" ".join(t.split()[:8]).encode()).hexdigest()
        for t in norm.values()
    )
    pg = [n for n in prefix_groups.values() if n > 1]

    sets, sigs, cand = _minhash_replica(SF_SMOKE)
    verified = [
        (a, b)
        for a, b in cand
        if len(sets[a] & sets[b])
        / (len(sets[a]) + len(sets[b]) - len(sets[a] & sets[b]))
        >= 0.5
    ]
    docs = {d for p in verified for d in p}
    anchors = {min(a, b) for a, b in verified}
    expect = {
        "exact": (len(eg), sum(eg), sum(n - 1 for n in eg)),
        "prefix_fingerprint": (len(pg), sum(pg), sum(n - 1 for n in pg)),
        "minhash_jaccard": (
            len(verified),
            len(docs),
            max(len(docs) - len(anchors), 0),
        ),
    }

    got = {
        r.method: (r.n_groups_or_pairs, r.n_docs_involved, r.n_removable)
        for r in REGISTRY["pipeline_dedup_report"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_leakage_safe_split_matches_bruteforce(spark):
    """split_leakage_safe must equal the direct computation: exact-dup
    groups by md5(normalized text), 80/10/10 bucket on md5 of the GROUP
    hash, per-split group/doc/dup-doc counts."""
    import hashlib
    from collections import Counter, defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        f" WHERE trim(text) <> ''"
    ).fetchall()
    con.close()
    groups = Counter(
        hashlib.md5(t.strip().lower().encode()).hexdigest() for (t,) in rows
    )
    agg = defaultdict(lambda: [0, 0, 0])
    for h, n in groups.items():
        b = hashlib.md5(h.encode()).hexdigest()[:4]
        split = "train" if b < "cccc" else ("valid" if b < "e666" else "test")
        a = agg[split]
        a[0] += 1
        a[1] += n
        a[2] += n if n > 1 else 0
    expect = {s: tuple(v) for s, v in agg.items()}

    got = {
        r.split: (r.n_groups, r.n_docs, r.dup_docs)
        for r in REGISTRY["split_leakage_safe"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_cluster_safe_split_matches_bruteforce(spark):
    """split_cluster_safe must equal a direct union-find over the exact
    n-gram-Jaccard >= 0.5 pair graph: min-id cluster labels, singleton
    clusters for unpaired docs, 80/10/10 bucket on md5 of the cluster
    id, per-split doc/cluster/clustered-doc counts."""
    import hashlib
    from collections import Counter, defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    con.close()
    sh = {}
    for did, t in rows:
        toks = t.strip().lower().split()
        s = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        if s:
            sh[did] = s
    parent = {d: d for d, _ in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    by_shingle = defaultdict(list)
    for did, s in sh.items():
        for g in s:
            by_shingle[g].append(did)
    cand = {
        (a, b)
        for ids in by_shingle.values()
        for a in ids
        for b in ids
        if a < b
    }
    for a, b in cand:
        ni = len(sh[a] & sh[b])
        if ni / (len(sh[a]) + len(sh[b]) - ni) >= 0.5:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    clusters = Counter(find(d) for d, _ in rows)
    agg = defaultdict(lambda: [0, 0, 0])
    for cid, n in clusters.items():
        b = hashlib.md5(str(cid).encode()).hexdigest()[:4]
        split = "train" if b < "cccc" else ("valid" if b < "e666" else "test")
        a = agg[split]
        a[0] += n
        a[1] += 1
        a[2] += n if n > 1 else 0
    expect = {s: tuple(v) for s, v in agg.items()}

    got = {
        r.split: (r.n_docs, r.n_clusters, r.clustered_docs)
        for r in REGISTRY["split_cluster_safe"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_band_stats_match_bruteforce(spark):
    """dedup_band_stats must equal the direct per-band bucket profile of
    the same MinHash banding replica."""
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    _, sigs, _ = _minhash_replica(SF_SMOKE)
    buckets = Counter()
    for did, m in sigs.items():
        for band in range(4):
            buckets[(band, f"{m[2*band]}_{m[2*band+1]}")] += 1
    expect = {}
    for band in range(4):
        sizes = [n for (b, _), n in buckets.items() if b == band]
        expect[band] = (
            len(sizes),
            sum(sizes),
            max(sizes),
            sum(1 for n in sizes if n >= 2),
            sum(n for n in sizes if n >= 2),
        )

    got = {
        r.band: (r.n_buckets, r.n_docs, r.max_bucket, r.n_buckets_ge2, r.n_docs_colliding)
        for r in REGISTRY["dedup_band_stats"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_prefix_fingerprint_matches_bruteforce(spark):
    """dedup_prefix_fingerprint must equal the direct first-8-token md5
    grouping with source counts and min-doc canonicals."""
    import hashlib
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, source, text FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet') WHERE trim(text) <> ''"
    ).fetchall()
    con.close()
    groups = defaultdict(list)
    for did, src, t in rows:
        h = hashlib.md5(
            " ".join(t.strip().lower().split()[:8]).encode()
        ).hexdigest()
        groups[h].append((did, src))
    expect = {
        h: (len(g), len({s for _, s in g}), min(d for d, _ in g))
        for h, g in groups.items()
        if len(g) > 1
    }

    got = {
        r.prefix_hash: (r.n_docs, r.n_sources, r.canonical_doc)
        for r in REGISTRY["dedup_prefix_fingerprint"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_ohlc_matches_bruteforce(spark):
    """ts_ohlc_hourly must equal the direct per-(user, hour) OHLC pick
    under the (ts, event_id) ordering — values copied, so floats compare
    bit-exact."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, ts, event_id, value FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    con.close()
    per = defaultdict(list)
    for u, ts, eid, v in rows:
        per[(u, ts.replace(minute=0, second=0, microsecond=0))].append((ts, eid, v))
    expect = {}
    for k, evs in per.items():
        evs.sort(key=lambda x: (x[0], x[1]))
        vals = [v for _, _, v in evs]
        expect[k] = (evs[0][2], max(vals), min(vals), evs[-1][2], len(evs))

    got = {
        (r.user_id, r.h): (r.open, r.high, r.low, r.close, r.n_events)
        for r in REGISTRY["ts_ohlc_hourly"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_market_basket_matches_bruteforce(spark):
    """market_basket_pairs must equal the direct per-order pair count
    with the deterministic (n desc, a, b) top-50 cut."""
    from collections import Counter, defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM "
        f"read_parquet('{SF_SMOKE}/lineitem.parquet')"
    ).fetchall()
    con.close()
    baskets = defaultdict(list)
    for ok, pk in rows:
        baskets[ok].append(pk)
    pairs = Counter()
    for parts in baskets.values():
        parts.sort()
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                pairs[(parts[i], parts[j])] += 1
    top = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    expect = [(a, b, n) for (a, b), n in top]

    got = [
        (r.part_a, r.part_b, r.n_orders)
        for r in REGISTRY["market_basket_pairs"].fn(spark, SF_SMOKE).collect()
    ]
    assert got == expect


def test_revenue_share_matches_bruteforce(spark):
    """sql_revenue_share_window must equal the direct per-nation revenue
    roll-up with exact floor-ppm shares of the global total."""
    from collections import Counter

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT n.n_name, l.l_extendedprice, l.l_discount
            FROM read_parquet('{SF_SMOKE}/lineitem.parquet') l
            JOIN read_parquet('{SF_SMOKE}/supplier.parquet') s
              ON s.s_suppkey = l.l_suppkey
            JOIN read_parquet('{SF_SMOKE}/nation.parquet') n
              ON n.n_nationkey = s.s_nationkey"""
    ).fetchall()
    con.close()
    # p*(1-d)*100 can land exactly on .5: Spark/DuckDB round HALF_UP over
    # the double's shortest decimal repr, Python round() is banker's —
    # replicate the engines' rule exactly via Decimal(repr(x))
    from decimal import ROUND_HALF_UP, Decimal

    rev = Counter()
    for nn, p, d in rows:
        v = p * (1 - d) * 100
        rev[nn] += int(
            Decimal(repr(v)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
        )
    total = sum(rev.values())
    expect = {
        nn: (c, c * 1_000_000 // total) for nn, c in rev.items()
    }

    got = {
        r.n_name: (r.rev_cents, r.share_ppm)
        for r in REGISTRY["sql_revenue_share_window"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_dow_hour_heatmap_matches_bruteforce(spark):
    """events_dow_hour_heatmap must equal direct (ISO weekday, hour,
    type) counting."""
    from collections import Counter

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT ts, event_type FROM read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    con.close()
    expect = Counter((ts.isoweekday(), ts.hour, et) for ts, et in rows)

    got = {
        (r.dow, r.hour, r.event_type): r.n
        for r in REGISTRY["events_dow_hour_heatmap"].fn(spark, SF_SMOKE).collect()
    }
    assert got == dict(expect)


def test_referential_orphans_match_bruteforce(spark):
    """dq_referential_orphans must equal direct set-difference counts
    for every FK relationship."""
    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rels = [
        ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ]
    con = duckdb.connect()
    expect = {}
    for name, child, fk, parent, pk in rels:
        fks = [
            v
            for (v,) in con.sql(
                f"SELECT {fk} FROM read_parquet('{SF_SMOKE}/{child}.parquet')"
            ).fetchall()
        ]
        pks = {
            v
            for (v,) in con.sql(
                f"SELECT {pk} FROM read_parquet('{SF_SMOKE}/{parent}.parquet')"
            ).fetchall()
        }
        expect[name] = sum(1 for v in fks if v not in pks)
    con.close()

    got = {
        r.relation: r.n_orphans
        for r in REGISTRY["dq_referential_orphans"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_entropy_matches_bruteforce(spark):
    """doc_entropy_unigram must equal the direct H = ln(n) - sum c·ln(c)/n
    over exact per-doc token counts."""
    import math
    from collections import Counter

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        f" WHERE trim(text) <> ''"
    ).fetchall()
    con.close()
    expect = {}
    for did, t in rows:
        c = Counter(t.strip().lower().split())
        n = sum(c.values())
        h = math.log(n) - sum(v * math.log(v) for v in c.values()) / n
        expect[did] = (n, len(c), h)

    got = {
        r.doc_id: (r.n_tokens, r.n_types, r.entropy_nats)
        for r in REGISTRY["doc_entropy_unigram"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expect)
    for did in expect:
        assert got[did][:2] == expect[did][:2], did
        assert abs(got[did][2] - expect[did][2]) <= 2e-6, did


def test_pmi_matches_bruteforce(spark):
    """text_cooccurrence_pmi must equal the direct PMI over exact
    distinct-token co-occurrence counts with the deterministic top-100
    cut."""
    import math
    from collections import Counter
    from itertools import combinations

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        f" WHERE trim(text) <> ''"
    ).fetchall()
    con.close()
    doc_toks = {d: sorted(set(t.strip().lower().split())) for d, t in rows}
    df = Counter(tok for ts in doc_toks.values() for tok in ts)
    n_docs = len(doc_toks)
    pairs = Counter(p for ts in doc_toks.values() for p in combinations(ts, 2))
    top = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    expect = {
        (a, b): (n, math.log(n * n_docs / (df[a] * df[b])))
        for (a, b), n in top
    }

    got = {
        (r.tok_a, r.tok_b): (r.n_ab, r.pmi)
        for r in REGISTRY["text_cooccurrence_pmi"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expect)
    for k in expect:
        assert got[k][0] == expect[k][0], k
        assert abs(got[k][1] - expect[k][1]) <= 2e-6, k


def test_label_distance_matrix_matches_bruteforce(spark):
    """embed_label_distance_matrix must equal direct integer-quantized
    centroid L2 distances — exact BIGINT arithmetic end to end."""
    import math
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT label, embedding FROM "
        f"read_parquet('{SF_SMOKE}/embeddings.parquet')"
    ).fetchall()
    con.close()
    by_label = defaultdict(list)
    for lab, emb in rows:
        by_label[lab].append(
            [int(math.floor(float(x) * 1048576 + 0.5)) for x in emb]
        )
    cents = {
        lab: [int(math.floor(sum(col) / len(vs))) for col in zip(*vs)]
        for lab, vs in by_label.items()
    }
    labs = sorted(cents)
    expect = {
        (a, b): sum((x - y) ** 2 for x, y in zip(cents[a], cents[b]))
        for i, a in enumerate(labs)
        for b in labs[i + 1 :]
    }

    got = {
        (r.label_a, r.label_b): r.dist_sq_q
        for r in REGISTRY["embed_label_distance_matrix"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_upsample_fractional_matches_bruteforce(spark):
    """corpus_upsample_fractional must equal the direct md5-bucket
    replication arithmetic per language."""
    import hashlib
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    weights = {"en": (1, 0), "zh": (2, 32768), "fr": (1, 32768),
               "es": (2, 0), "de": (1, 16384)}
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, lang FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    con.close()
    agg = defaultdict(lambda: [0, 0])
    for did, lang in rows:
        if lang not in weights:
            continue
        base, frac = weights[lang]
        bucket = int(hashlib.md5(str(did).encode()).hexdigest()[:4], 16)
        agg[lang][0] += 1
        agg[lang][1] += base + (1 if bucket < frac else 0)
    expect = {l: tuple(v) for l, v in agg.items()}

    got = {
        r.lang: (r.n_docs_in, r.n_docs_out)
        for r in REGISTRY["corpus_upsample_fractional"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_freq_spectrum_matches_bruteforce(spark):
    """vocab_freq_spectrum must equal the direct counts-of-counts with
    the first-50 k cut."""
    from collections import Counter

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        f" WHERE trim(text) <> ''"
    ).fetchall()
    con.close()
    freq = Counter(tok for (t,) in rows for tok in t.strip().lower().split())
    spectrum = Counter(freq.values())
    expect = [
        (k, n, k * n) for k, n in sorted(spectrum.items())
    ][:50]

    got = [
        (r.occurrences, r.n_types_with_k, r.mass)
        for r in REGISTRY["vocab_freq_spectrum"].fn(spark, SF_SMOKE).collect()
    ]
    assert got == expect


def test_cluster_sizes_match_bruteforce(spark):
    """dedup_cluster_sizes must equal the union-find component-size
    histogram over the Jaccard>=0.5 pair graph (clustered vertices
    only)."""
    from collections import Counter, defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    con.close()
    sh = {}
    for did, t in rows:
        toks = t.strip().lower().split()
        s = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        if s:
            sh[did] = s
    by_shingle = defaultdict(list)
    for did, s in sh.items():
        for g in s:
            by_shingle[g].append(did)
    edges = set()
    for ids in by_shingle.values():
        for a in ids:
            for b in ids:
                if a < b:
                    edges.add((a, b))
    edges = {
        (a, b)
        for a, b in edges
        if len(sh[a] & sh[b]) / (len(sh[a]) + len(sh[b]) - len(sh[a] & sh[b])) >= 0.5
    }
    verts = {d for p in edges for d in p}
    parent = {d: d for d in verts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_sizes = Counter(find(v) for v in verts)
    expect = dict(Counter(comp_sizes.values()))

    got = {
        r.cluster_size: r.n_clusters
        for r in REGISTRY["dedup_cluster_sizes"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_gopher_rules_match_bruteforce(spark):
    """quality_gopher_rules must equal the direct rule evaluation: word
    count band, mean-word-length band (round-6 seam), exact 80%
    alpha-word cross-multiplication."""
    import re

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, lang, text FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet') WHERE trim(text) <> ''"
    ).fetchall()
    con.close()
    alpha = re.compile(r"[A-Za-z]")
    expect = {}
    for did, lang, t in rows:
        words = t.strip().split()
        n = len(words)
        mean_len = sum(len(w) for w in words) / n
        n_alpha = sum(1 for w in words if alpha.search(w))
        keep = (50 <= n <= 100000) and (3 <= round(mean_len, 6) <= 10) and (
            n_alpha * 5 >= n * 4
        )
        expect[did] = (lang, n, mean_len, n_alpha, keep)

    got = {
        r.doc_id: (r.lang, r.n_words, r.mean_word_len_r6, r.n_alpha_words, r.keep)
        for r in REGISTRY["quality_gopher_rules"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expect)
    for did in expect:
        g, e = got[did], expect[did]
        assert (g[0], g[1], g[3], g[4]) == (e[0], e[1], e[3], e[4]), did
        assert abs(g[2] - e[2]) <= 2e-6, did


def test_feature_hash_matches_bruteforce(spark):
    """feature_hash_bow must equal direct md5-prefix bucket counting."""
    import hashlib
    from collections import Counter

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        f" WHERE trim(text) <> ''"
    ).fetchall()
    con.close()
    counts = Counter()
    for did, t in rows:
        for tok in t.strip().lower().split():
            b = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 64
            counts[(did, b)] += 1

    got = {
        (r.doc_id, r.bucket): r.n
        for r in REGISTRY["feature_hash_bow"].fn(spark, SF_SMOKE).collect()
    }
    assert got == dict(counts)


def test_threshold_curve_matches_bruteforce(spark):
    """embed_threshold_curve must equal direct pairwise-cosine threshold
    counting over the capped slice (same left-fold double arithmetic)."""
    import math

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{SF_SMOKE}/embeddings.parquet') WHERE vec_id < 200"
    ).fetchall()
    con.close()
    vecs = {vid: [float(x) for x in emb] for vid, emb in rows}
    norms = {vid: math.sqrt(sum(x * x for x in v)) for vid, v in vecs.items()}
    ids = sorted(vecs)
    cosines = [
        sum(x * y for x, y in zip(vecs[a], vecs[b])) / (norms[a] * norms[b])
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
    ]
    expect = {
        t: sum(1 for c in cosines if c >= t / 100.0)
        for t in (80, 85, 90, 95, 99)
    }

    got = {
        r.thr_pct: r.n_pairs_at_or_above
        for r in REGISTRY["embed_threshold_curve"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_substring_spans_match_bruteforce(spark):
    """dedup_substring_spans must equal the direct rolling 20-token span
    hashing with cross-doc-shared scoring."""
    import hashlib
    from collections import Counter, defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        f" WHERE trim(text) <> ''"
    ).fetchall()
    con.close()
    k = 20
    doc_spans = {}
    for did, t in rows:
        w = t.strip().lower().split()
        if len(w) < k:
            continue
        doc_spans[did] = [
            hashlib.md5(" ".join(w[i : i + k]).encode()).hexdigest()
            for i in range(len(w) - k + 1)
        ]
    docs_per_hash = defaultdict(set)
    for did, hs in doc_spans.items():
        for h in hs:
            docs_per_hash[h].add(did)
    shared = {h for h, ds in docs_per_hash.items() if len(ds) > 1}
    expect = {}
    for did, hs in doc_spans.items():
        n_dup = sum(1 for h in hs if h in shared)
        if n_dup > 0:
            expect[did] = (len(hs), n_dup)

    got = {
        r.doc_id: (r.n_spans, r.n_dup_spans)
        for r in REGISTRY["dedup_substring_spans"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_fertility_matches_bruteforce(spark):
    """tokenizer_fertility_by_lang must equal direct per-language token/
    char/byte sums and their round-6 ratios."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT lang, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        f" WHERE trim(text) <> ''"
    ).fetchall()
    con.close()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for lang, t in rows:
        a = agg[lang]
        a[0] += 1
        a[1] += len(t.strip().lower().split())
        a[2] += len(t)
        a[3] += len(t.encode("utf-8"))
    expect = {
        lang: (n, tt, tc, tb, tc / tt, tb / tt)
        for lang, (n, tt, tc, tb) in agg.items()
    }

    got = {
        r.lang: (
            r.n_docs, r.total_tokens, r.total_chars, r.total_bytes,
            r.chars_per_token_r6, r.bytes_per_token_r6,
        )
        for r in REGISTRY["tokenizer_fertility_by_lang"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expect)
    for lang in expect:
        assert got[lang][:4] == expect[lang][:4], lang
        assert abs(got[lang][4] - expect[lang][4]) <= 2e-6, lang
        assert abs(got[lang][5] - expect[lang][5]) <= 2e-6, lang


def test_q6_forecast_matches_bruteforce(spark):
    """sql_forecast_revenue must equal the direct filtered integer-e4
    revenue sum (engine HALF_UP rounding replicated via Decimal(repr))."""
    from decimal import ROUND_HALF_UP, Decimal

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT l_extendedprice, l_discount FROM
            read_parquet('{SF_SMOKE}/lineitem.parquet')
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24"""
    ).fetchall()
    con.close()
    total = sum(
        int(
            Decimal(repr(p * d * 10000)).quantize(
                Decimal("1"), rounding=ROUND_HALF_UP
            )
        )
        for p, d in rows
    )
    r = REGISTRY["sql_forecast_revenue"].fn(spark, SF_SMOKE).collect()[0]
    assert (r.n_lines, r.forecast_e4) == (len(rows), total)


def test_ship_lateness_matches_bruteforce(spark):
    """sql_ship_lateness_priority must equal direct band and priority
    counting over the orderkey join."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT CAST(l.l_shipdate AS DATE), CAST(o.o_orderdate AS DATE),
                   o.o_orderpriority
            FROM read_parquet('{SF_SMOKE}/lineitem.parquet') l
            JOIN read_parquet('{SF_SMOKE}/orders.parquet') o
              ON o.o_orderkey = l.l_orderkey"""
    ).fetchall()
    con.close()
    agg = defaultdict(lambda: [0, 0])
    for ship, od, pri in rows:
        lag = (ship - od).days
        band = "early" if lag < 0 else ("on_time" if lag <= 60 else "late")
        agg[band][0 if pri in ("1-URGENT", "2-HIGH") else 1] += 1
    expect = {b: tuple(v) for b, v in agg.items()}

    got = {
        r.ship_band: (r.n_high_priority, r.n_low_priority)
        for r in REGISTRY["sql_ship_lateness_priority"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_asof_forward_matches_bruteforce(spark):
    """join_asof_forward must equal the direct next-purchase-at-or-after
    pick with the (ts, event_id) tie-break; NULL for unconverted."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, ts, event_id, event_type FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
        f" WHERE event_type IN ('error', 'purchase')"
    ).fetchall()
    con.close()
    purchases = defaultdict(list)
    errors = []
    for u, ts, eid, et in rows:
        if et == "purchase":
            purchases[u].append((ts, eid))
        else:
            errors.append((u, ts, eid))
    for ps in purchases.values():
        ps.sort()
    expect = {}
    for u, ts, eid in errors:
        nxt = min(
            ((pts, pid) for pts, pid in purchases.get(u, []) if pts >= ts),
            default=None,
        )
        if nxt is None:
            expect[eid] = (u, None, None)
        else:
            us = (nxt[0] - ts) // __import__("datetime").timedelta(microseconds=1)
            expect[eid] = (u, nxt[1], us)

    got = {
        r.error_id: (r.user_id, r.next_purchase_id, r.wait_us)
        for r in REGISTRY["join_asof_forward"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_mode_per_group_matches_bruteforce(spark):
    """agg_mode_per_group must equal the direct (count DESC, value ASC)
    modal pick per status."""
    from collections import Counter, defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT o_orderstatus, o_orderpriority FROM "
        f"read_parquet('{SF_SMOKE}/orders.parquet')"
    ).fetchall()
    con.close()
    counts = Counter(rows)
    by_status = defaultdict(list)
    for (st, pri), n in counts.items():
        by_status[st].append((-n, pri))
    expect = {}
    for st, lst in by_status.items():
        lst.sort()
        expect[st] = (lst[0][1], -lst[0][0])

    got = {
        r.o_orderstatus: (r.modal_priority, r.n_orders)
        for r in REGISTRY["agg_mode_per_group"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_product_profit_matches_bruteforce(spark):
    """sql_product_profit must equal the direct five-way join profit
    roll-up over exact integer money units (engine HALF_UP rounding)."""
    from collections import defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT sn.n_name, year(o.o_orderdate),
                   l.l_extendedprice, l.l_discount, l.l_quantity,
                   p.p_retailprice
            FROM read_parquet('{SF_SMOKE}/lineitem.parquet') l
            JOIN read_parquet('{SF_SMOKE}/part.parquet') p
              ON p.p_partkey = l.l_partkey
            JOIN read_parquet('{SF_SMOKE}/supplier.parquet') s
              ON s.s_suppkey = l.l_suppkey
            JOIN read_parquet('{SF_SMOKE}/orders.parquet') o
              ON o.o_orderkey = l.l_orderkey
            JOIN read_parquet('{SF_SMOKE}/nation.parquet') sn
              ON sn.n_nationkey = s.s_nationkey"""
    ).fetchall()
    con.close()

    def r(x):
        return int(Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))

    agg = defaultdict(lambda: [0, 0])
    for nn, yr, ep, disc, qty, rp in rows:
        profit = r(ep * (1 - disc) * 10000) - r(rp * 100) * 100 * int(qty)
        a = agg[(nn, yr)]
        a[0] += profit
        a[1] += 1
    expect = {k: tuple(v) for k, v in agg.items()}

    got = {
        (r_.nation, r_.o_year): (r_.profit_e4, r_.n_lines)
        for r_ in REGISTRY["sql_product_profit"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_waiting_orders_match_bruteforce(spark):
    """sql_waiting_orders must equal the direct exactly-one-late-supplier
    accounting over multi-supplier orders."""
    from collections import Counter, defaultdict
    from datetime import timedelta

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate, o.o_orderdate
            FROM read_parquet('{SF_SMOKE}/lineitem.parquet') l
            JOIN read_parquet('{SF_SMOKE}/orders.parquet') o
              ON o.o_orderkey = l.l_orderkey"""
    ).fetchall()
    con.close()
    supp_names = dict(
        duckdb.sql(
            f"SELECT s_suppkey, s_name FROM "
            f"read_parquet('{SF_SMOKE}/supplier.parquet')"
        ).fetchall()
    )
    per_order = defaultdict(lambda: (set(), set()))
    late_cut = timedelta(days=90)
    for ok, sk, ship, od in rows:
        supp, late = per_order[ok]
        supp.add(sk)
        if ship > od + late_cut:
            late.add(sk)
    numwait = Counter()
    for supp, late in per_order.values():
        if len(supp) >= 2 and len(late) == 1:
            numwait[supp_names[next(iter(late))]] += 1

    got = {
        r.s_name: r.numwait
        for r in REGISTRY["sql_waiting_orders"].fn(spark, SF_SMOKE).collect()
    }
    assert got == dict(numwait)


def test_point_in_time_matches_bruteforce(spark):
    """join_point_in_time must equal the direct SCD2 pick: each purchase
    takes the latest non-purchase status change at or before its ts
    (changes deduped to one status per (user, ts) by max event_id);
    NULL before the first change."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, ts, event_id, event_type FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    con.close()
    changes = defaultdict(dict)  # user -> ts -> (event_id, type)
    purchases = []
    for u, ts, eid, et in rows:
        if et == "purchase":
            purchases.append((u, ts, eid))
        else:
            cur = changes[u].get(ts)
            if cur is None or eid > cur[0]:
                changes[u][ts] = (eid, et)
    per_user = {
        u: sorted((ts, st) for ts, (_, st) in m.items())
        for u, m in changes.items()
    }
    expect = {}
    for u, ts, eid in purchases:
        prior = [(cts, st) for cts, st in per_user.get(u, []) if cts <= ts]
        if prior:
            cts, st = prior[-1]
            expect[eid] = (u, st, cts)
        else:
            expect[eid] = (u, None, None)

    got = {
        r.purchase_id: (r.user_id, r.status, r.status_since)
        for r in REGISTRY["join_point_in_time"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_q4_priority_check_matches_bruteforce(spark):
    """sql_order_priority_check must equal the direct correlated-EXISTS
    evaluation over 1995Q1 orders."""
    from collections import Counter, defaultdict
    from datetime import datetime, timedelta

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    orders = con.sql(
        f"SELECT o_orderkey, o_orderdate, o_orderpriority FROM "
        f"read_parquet('{SF_SMOKE}/orders.parquet')"
        f" WHERE o_orderdate >= TIMESTAMP '1995-01-01'"
        f" AND o_orderdate < TIMESTAMP '1995-04-01'"
    ).fetchall()
    lines = con.sql(
        f"SELECT l_orderkey, l_shipdate FROM "
        f"read_parquet('{SF_SMOKE}/lineitem.parquet')"
    ).fetchall()
    con.close()
    ship = defaultdict(list)
    for ok, sd in lines:
        ship[ok].append(sd)
    counts = Counter()
    for ok, od, pri in orders:
        if any(sd > od + timedelta(days=75) for sd in ship.get(ok, [])):
            counts[pri] += 1

    got = {
        r.o_orderpriority: r.order_count
        for r in REGISTRY["sql_order_priority_check"].fn(spark, SF_SMOKE).collect()
    }
    assert got == dict(counts)


def test_grouping_flags_match_bruteforce(spark):
    """sql_grouping_flags must equal the direct CUBE expansion with
    correct GROUPING() metadata per stratum."""
    from collections import Counter

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT o_orderpriority, o_orderstatus FROM "
        f"read_parquet('{SF_SMOKE}/orders.parquet')"
    ).fetchall()
    con.close()
    counts = Counter(rows)
    n_total = sum(counts.values())
    by_pri = Counter()
    by_st = Counter()
    for (pri, st), n in counts.items():
        by_pri[pri] += n
        by_st[st] += n
    expect = {}
    for (pri, st), n in counts.items():
        expect[(0, 0, pri, st)] = n
    for pri, n in by_pri.items():
        expect[(0, 1, pri, "(all)")] = n
    for st, n in by_st.items():
        expect[(1, 0, "(all)", st)] = n
    expect[(1, 1, "(all)", "(all)")] = n_total

    got = {
        (r.g_priority, r.g_status, r.priority, r.status): r.n
        for r in REGISTRY["sql_grouping_flags"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_q2_min_price_supplier_matches_bruteforce(spark):
    """sql_min_price_supplier must equal the direct per-part cheapest
    EUROPE line pick with the min-suppkey tie-break."""
    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    eu = dict(
        con.sql(
            f"""SELECT s.s_suppkey, s.s_name
                FROM read_parquet('{SF_SMOKE}/supplier.parquet') s
                JOIN read_parquet('{SF_SMOKE}/nation.parquet') n
                  ON n.n_nationkey = s.s_nationkey
                JOIN read_parquet('{SF_SMOKE}/region.parquet') r
                  ON r.r_regionkey = n.n_regionkey
                WHERE r.r_name = 'EUROPE'"""
        ).fetchall()
    )
    lines = con.sql(
        f"SELECT l_partkey, l_suppkey, l_extendedprice FROM "
        f"read_parquet('{SF_SMOKE}/lineitem.parquet')"
    ).fetchall()
    parts = dict(
        con.sql(
            f"SELECT p_partkey, p_name FROM "
            f"read_parquet('{SF_SMOKE}/part.parquet') WHERE p_size <= 5"
        ).fetchall()
    )
    con.close()
    best = {}  # partkey -> (min_e2, min_suppkey)
    for pk, sk, ep in lines:
        if sk not in eu:
            continue
        e2 = int(round(ep * 100))
        cur = best.get(pk)
        if cur is None or (e2, sk) < cur:
            best[pk] = (e2, sk)
    expect = {
        pk: (parts[pk], eu[sk], e2)
        for pk, (e2, sk) in best.items()
        if pk in parts
    }

    got = {
        r.p_partkey: (r.p_name, r.cheapest_supplier, r.min_line_cents)
        for r in REGISTRY["sql_min_price_supplier"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_q11_important_stock_matches_bruteforce(spark):
    """sql_important_stock must equal the direct twice-the-average cut
    via integer cross-multiplication."""
    from collections import Counter

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT l.l_partkey, l.l_extendedprice
            FROM read_parquet('{SF_SMOKE}/lineitem.parquet') l
            JOIN read_parquet('{SF_SMOKE}/supplier.parquet') s
              ON s.s_suppkey = l.l_suppkey
            JOIN read_parquet('{SF_SMOKE}/nation.parquet') n
              ON n.n_nationkey = s.s_nationkey
            JOIN read_parquet('{SF_SMOKE}/region.parquet') r
              ON r.r_regionkey = n.n_regionkey
            WHERE r.r_name = 'ASIA'"""
    ).fetchall()
    con.close()
    val = Counter()
    for pk, ep in rows:
        val[pk] += int(round(ep * 100))
    t, np_ = sum(val.values()), len(val)
    expect = {pk: v for pk, v in val.items() if v * np_ > 2 * t}

    got = {
        r.p_partkey: r.value_cents
        for r in REGISTRY["sql_important_stock"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_q16_parts_supplier_matches_bruteforce(spark):
    """sql_parts_supplier_relation must equal direct distinct-supplier
    counting with brand and deficit-supplier exclusions."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    bad = {
        v
        for (v,) in con.sql(
            f"SELECT s_suppkey FROM read_parquet('{SF_SMOKE}/supplier.parquet')"
            f" WHERE s_acctbal < 0"
        ).fetchall()
    }
    rows = con.sql(
        f"""SELECT p.p_brand, p.p_type, p.p_size % 5, l.l_suppkey
            FROM read_parquet('{SF_SMOKE}/lineitem.parquet') l
            JOIN read_parquet('{SF_SMOKE}/part.parquet') p
              ON p.p_partkey = l.l_partkey
            WHERE p.p_brand <> 'Brand#1'"""
    ).fetchall()
    con.close()
    supp = defaultdict(set)
    for brand, ptype, band, sk in rows:
        if sk not in bad:
            supp[(brand, ptype, band)].add(sk)
    expect = {k: len(v) for k, v in supp.items()}

    got = {
        (r.p_brand, r.p_type, r.size_band): r.supplier_cnt
        for r in REGISTRY["sql_parts_supplier_relation"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_q20_excess_inventory_matches_bruteforce(spark):
    """sql_excess_inventory_suppliers must equal the direct more-than-
    half-of-1997-volume domination count with the >= 5 parts floor."""
    from collections import Counter, defaultdict
    from datetime import datetime

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT l_partkey, l_suppkey, l_quantity FROM "
        f"read_parquet('{SF_SMOKE}/lineitem.parquet')"
        f" WHERE l_shipdate >= TIMESTAMP '1997-01-01'"
        f" AND l_shipdate < TIMESTAMP '1998-01-01'"
    ).fetchall()
    names = dict(
        duckdb.sql(
            f"SELECT s_suppkey, s_name FROM "
            f"read_parquet('{SF_SMOKE}/supplier.parquet')"
        ).fetchall()
    )
    con.close()
    sq = Counter()
    for pk, sk, q in rows:
        sq[(pk, sk)] += int(q)
    pt = Counter()
    for (pk, _), q in sq.items():
        pt[pk] += q
    dominated = Counter()
    for (pk, sk), q in sq.items():
        if pt[pk] > 0 and q * 2 > pt[pk]:
            dominated[sk] += 1
    expect = {
        sk: (names[sk], n) for sk, n in dominated.items() if n >= 5
    }

    got = {
        r.s_suppkey: (r.s_name, r.n_dominated_parts)
        for r in REGISTRY["sql_excess_inventory_suppliers"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_intersect_except_all_match_bruteforce(spark):
    """sql_intersect_except_all must equal bag semantics computed
    directly: min(m, n) and max(m - n, 0) multiplicities per nation."""
    from collections import Counter

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT c_mktsegment, c_nationkey FROM "
        f"read_parquet('{SF_SMOKE}/customer.parquet')"
        f" WHERE c_mktsegment IN ('MACHINERY', 'BUILDING')"
    ).fetchall()
    con.close()
    a = Counter(nk for seg, nk in rows if seg == "MACHINERY")
    b = Counter(nk for seg, nk in rows if seg == "BUILDING")
    expect = {}
    for nk in set(a) | set(b):
        i = min(a[nk], b[nk])
        x = max(a[nk] - b[nk], 0)
        if i:
            expect[("intersect_all", nk)] = i
        if x:
            expect[("except_all", nk)] = x

    got = {
        (r.op, r.c_nationkey): r.n
        for r in REGISTRY["sql_intersect_except_all"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_sessionization_rollup_matches_bruteforce(spark):
    """events_sessionization must equal the direct per-user session walk
    rolled up (session count, max size, total events)."""
    from collections import defaultdict
    from datetime import timedelta

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, ts, event_id FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    con.close()
    per_user = defaultdict(list)
    for u, ts, eid in rows:
        per_user[u].append((ts, eid))
    gap = timedelta(minutes=30)
    expect = {}
    for u, evs in per_user.items():
        evs.sort()
        sizes = []
        prev = None
        for ts, _ in evs:
            if prev is None or ts - prev > gap:
                sizes.append(0)
            sizes[-1] += 1
            prev = ts
        expect[u] = (len(sizes), max(sizes), sum(sizes))

    got = {
        r.user_id: (r.n_sessions, r.max_session_events, r.n_events)
        for r in REGISTRY["events_sessionization"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_q18_large_volume_matches_bruteforce(spark):
    """sql_large_volume_customers must equal the direct >250-quantity
    order pick with the deterministic (price DESC, orderkey) top-20."""
    from collections import Counter

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    li = con.sql(
        f"SELECT l_orderkey, l_quantity FROM "
        f"read_parquet('{SF_SMOKE}/lineitem.parquet')"
    ).fetchall()
    orders = {
        ok: (ck, od, tp)
        for ok, ck, od, tp in con.sql(
            f"SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice FROM "
            f"read_parquet('{SF_SMOKE}/orders.parquet')"
        ).fetchall()
    }
    cust = dict(
        con.sql(
            f"SELECT c_custkey, c_name FROM "
            f"read_parquet('{SF_SMOKE}/customer.parquet')"
        ).fetchall()
    )
    con.close()
    qty = Counter()
    for ok, q in li:
        qty[ok] += q
    rows = []
    for ok, sq in qty.items():
        if sq > 250:
            ck, od, tp = orders[ok]
            rows.append(
                (
                    int(round(tp * 100)),
                    ok,
                    ck,
                    cust[ck],
                    od,
                    int(round(sq)),
                )
            )
    rows.sort(key=lambda r: (-r[0], r[1]))
    expect = [
        (ck, name, ok, od, cents, sq)
        for cents, ok, ck, name, od, sq in rows[:20]
    ]

    got = [
        (r.c_custkey, r.c_name, r.o_orderkey, r.o_orderdate, r.totalprice_cents, r.sum_qty)
        for r in REGISTRY["sql_large_volume_customers"].fn(spark, SF_SMOKE).collect()
    ]
    assert got == expect


def test_q19_disjunctive_matches_bruteforce(spark):
    """sql_discounted_revenue must equal direct evaluation of the three
    disjunctive blocks (engine HALF_UP rounding)."""
    from decimal import ROUND_HALF_UP, Decimal

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT p.p_brand, p.p_size, l.l_quantity,
                   l.l_extendedprice, l.l_discount
            FROM read_parquet('{SF_SMOKE}/lineitem.parquet') l
            JOIN read_parquet('{SF_SMOKE}/part.parquet') p
              ON p.p_partkey = l.l_partkey"""
    ).fetchall()
    con.close()
    blocks = (
        ("Brand#11", 1, 10, 1, 15),
        ("Brand#15", 5, 20, 10, 25),
        ("Brand#22", 15, 35, 20, 40),
    )
    n = rev = 0
    for brand, size, q, ep, d in rows:
        if any(
            brand == b and s_lo <= size <= s_hi and q_lo <= q <= q_hi
            for b, s_lo, s_hi, q_lo, q_hi in blocks
        ):
            n += 1
            rev += int(
                Decimal(repr(ep * (1 - d) * 10000)).quantize(
                    Decimal("1"), rounding=ROUND_HALF_UP
                )
            )

    r = REGISTRY["sql_discounted_revenue"].fn(spark, SF_SMOKE).collect()[0]
    assert (r.n_lines, r.revenue_e4) == (n, rev)


def test_q22_sales_opportunity_matches_bruteforce(spark):
    """sql_sales_opportunity must equal the direct above-average positive
    balance + no-orders cut via integer cross-multiplication."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    custs = con.sql(
        f"SELECT c_custkey, c_mktsegment, c_acctbal FROM "
        f"read_parquet('{SF_SMOKE}/customer.parquet')"
    ).fetchall()
    with_orders = {
        v
        for (v,) in con.sql(
            f"SELECT DISTINCT o_custkey FROM "
            f"read_parquet('{SF_SMOKE}/orders.parquet')"
        ).fetchall()
    }
    con.close()
    pos = [int(round(b * 100)) for _, _, b in custs if b > 0]
    n_pos, s_pos = len(pos), sum(pos)
    agg = defaultdict(lambda: [0, 0])
    for ck, seg, bal in custs:
        cents = int(round(bal * 100))
        if cents * n_pos > s_pos and ck not in with_orders:
            a = agg[seg]
            a[0] += 1
            a[1] += cents
    expect = {seg: tuple(v) for seg, v in agg.items()}

    got = {
        r.c_mktsegment: (r.n_customers, r.total_bal_cents)
        for r in REGISTRY["sql_sales_opportunity"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_share_of_parent_matches_bruteforce(spark):
    """sql_rollup_share_of_parent must equal direct per-nation revenue
    with exact floor-ppm shares of the parent region."""
    from collections import Counter, defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT r.r_name, n.n_name, o.o_totalprice
            FROM read_parquet('{SF_SMOKE}/orders.parquet') o
            JOIN read_parquet('{SF_SMOKE}/customer.parquet') c
              ON c.c_custkey = o.o_custkey
            JOIN read_parquet('{SF_SMOKE}/nation.parquet') n
              ON n.n_nationkey = c.c_nationkey
            JOIN read_parquet('{SF_SMOKE}/region.parquet') r
              ON r.r_regionkey = n.n_regionkey"""
    ).fetchall()
    con.close()
    cents = Counter()
    for rn, nn, tp in rows:
        cents[(rn, nn)] += int(round(tp * 100))
    region_total = defaultdict(int)
    for (rn, _), c_ in cents.items():
        region_total[rn] += c_
    expect = {
        (rn, nn): (c_, c_ * 1_000_000 // region_total[rn])
        for (rn, nn), c_ in cents.items()
    }

    got = {
        (r.r_name, r.n_name): (r.cents, r.share_of_region_ppm)
        for r in REGISTRY["sql_rollup_share_of_parent"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_ewma_matches_bruteforce(spark):
    """ts_ewma_per_customer must equal the direct integer EWMA fold
    ((3x + 7acc) floor-div 10) over each customer's date-ordered
    history."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM "
        f"read_parquet('{SF_SMOKE}/orders.parquet')"
    ).fetchall()
    con.close()
    per_cust = defaultdict(list)
    for ck, od, ok, tp in rows:
        per_cust[ck].append((od, ok, int(round(tp * 100))))
    expect = {}
    for ck, orders in per_cust.items():
        orders.sort()
        acc = orders[0][2]
        for _, _, x in orders[1:]:
            acc = (x * 3 + acc * 7) // 10
        expect[ck] = (len(orders), acc)

    got = {
        r.o_custkey: (r.n_orders, r.ewma_cents)
        for r in REGISTRY["ts_ewma_per_customer"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_funnel_matches_bruteforce(spark):
    """funnel_view_click_purchase must equal the direct first-occurrence
    ordered-funnel evaluation."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, event_type, ts FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
        f" WHERE event_type IN ('view', 'click', 'purchase')"
    ).fetchall()
    con.close()
    firsts = defaultdict(dict)
    for u, et, ts in rows:
        cur = firsts[u].get(et)
        if cur is None or ts < cur:
            firsts[u][et] = ts
    n1 = n2 = n3 = 0
    for m in firsts.values():
        v, c, b = m.get("view"), m.get("click"), m.get("purchase")
        if v is not None:
            n1 += 1
            if c is not None and c > v:
                n2 += 1
                if b is not None and b > c:
                    n3 += 1

    r = REGISTRY["funnel_view_click_purchase"].fn(spark, SF_SMOKE).collect()[0]
    assert (r.n_view, r.n_view_click, r.n_full_funnel) == (n1, n2, n3)


def test_cohort_retention_matches_bruteforce(spark):
    """cohort_retention must equal the direct (first-day cohort, day
    offset) distinct-user triangle."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, CAST(ts AS DATE) FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    con.close()
    first = {}
    for u, d in rows:
        if u not in first or d < first[u]:
            first[u] = d
    tri = defaultdict(set)
    for u, d in rows:
        tri[(first[u], (d - first[u]).days)].add(u)
    expect = {k: len(v) for k, v in tri.items()}

    got = {
        (r.cohort_day, r.day_offset): r.n_active
        for r in REGISTRY["cohort_retention"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_impute_median_matches_bruteforce(spark):
    """impute_group_median must equal the direct percentile_disc(0.5)
    imputation per segment."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT c_custkey, c_mktsegment, c_acctbal FROM "
        f"read_parquet('{SF_SMOKE}/customer.parquet')"
    ).fetchall()
    con.close()
    valid = defaultdict(list)
    for _, seg, bal in rows:
        if bal >= 0:
            valid[seg].append(bal)
    med = {}
    for seg, vals in valid.items():
        vals.sort()
        n = len(vals)
        # percentile_disc(0.5): smallest value with cum fraction >= 0.5
        med[seg] = vals[(n - 1) // 2] if n % 2 else vals[n // 2 - 1]
    expect = {
        ck: (seg, med[seg] if bal < 0 else bal, 1 if bal < 0 else 0)
        for ck, seg, bal in rows
    }

    got = {
        r.c_custkey: (r.c_mktsegment, r.acctbal_imputed, r.was_imputed)
        for r in REGISTRY["impute_group_median"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_gapfill_matches_bruteforce(spark):
    """ts_gapfill must equal the direct hourly spine with zero-filled
    counts, gap flags, and forward-filled values (round-2 seam
    tolerance for float-sum ordering)."""
    from collections import defaultdict
    from datetime import timedelta

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT ts, value FROM read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    con.close()
    hourly_n = defaultdict(int)
    hourly_v = defaultdict(float)
    for ts, v in rows:
        h = ts.replace(minute=0, second=0, microsecond=0)
        hourly_n[h] += 1
        hourly_v[h] += v
    lo, hi = min(hourly_n), max(hourly_n)
    expect = {}
    last_v = 0.0
    h = lo
    while h <= hi:
        n = hourly_n.get(h, 0)
        if n:
            last_v = round(hourly_v[h], 2)
        expect[h] = (n, 0 if n else 1, last_v)
        h += timedelta(hours=1)

    got = {
        r.hour: (r.n_events, r.is_gap, r.total_value_ffill)
        for r in REGISTRY["ts_gapfill"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expect)
    for h in expect:
        assert got[h][:2] == expect[h][:2], h
        assert abs(got[h][2] - expect[h][2]) <= 0.011, (h, got[h], expect[h])


def test_zscore_anomalies_match_bruteforce(spark):
    """ts_anomaly_zscore must equal the direct trailing-100 z-score
    computation per event type (sample stddev; the current value never
    in its own baseline)."""
    import math
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT event_id, event_type, ts, value FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    con.close()
    per_type = defaultdict(list)
    for eid, et, ts, v in rows:
        per_type[et].append((ts, eid, v))
    expect = {}
    for et, evs in per_type.items():
        evs.sort(key=lambda x: (x[0], x[1]))
        vals = [v for _, _, v in evs]
        for i, (ts, eid, v) in enumerate(evs):
            w = vals[max(0, i - 100) : i]
            if len(w) < 2:
                continue
            m = sum(w) / len(w)
            var = sum((x - m) ** 2 for x in w) / (len(w) - 1)
            if var <= 0:
                continue
            z = (v - m) / math.sqrt(var)
            if abs(z) > 2.5:
                expect[eid] = (et, v, z)

    got = {
        r.event_id: (r.event_type, r.value, r.z)
        for r in REGISTRY["ts_anomaly_zscore"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expect)
    for eid in expect:
        assert got[eid][:2] == expect[eid][:2], eid
        assert abs(got[eid][2] - expect[eid][2]) <= 2e-4, eid


# ---------------------------------------------------------------------------
# Round-6 pin closure (VERDICT r5 ask #3): oracle-independent replicas for
# the formula-heavy r01–r03 cohort entries. The pin class targets queries
# whose arithmetic is AUTHORED twice (Spark plan + oracle SQL by the same
# hand) — a shared formula bug is invisible to cross-engine parity, so each
# pin recomputes the result from raw parquet in plain Python/numpy with
# independently-written formulas.
# ---------------------------------------------------------------------------


def _smoke_docs():
    import duckdb

    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text, lang, source FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    con.close()
    return rows


def _ws_tokens(text):
    import re

    s = text.strip().lower()
    return re.split(r"\s+", s) if s else []


def test_tfidf_topterms_matches_bruteforce(spark):
    """tfidf_topterms must equal the textbook (tf/doc_len)*ln(N/df) with
    top-3 (score desc, term asc) ranking, recomputed with Counter+math."""
    import math
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    docs = _smoke_docs()
    n_docs = len(docs)
    df = Counter()
    tf_by_doc = {}
    for doc_id, text, _, _ in docs:
        toks = _ws_tokens(text)
        df.update(set(toks))
        if doc_id < 20:
            tf_by_doc[doc_id] = Counter(toks)
    expect = set()
    for doc_id, tf in tf_by_doc.items():
        doc_len = sum(tf.values())
        scored = sorted(
            (
                (round((c / doc_len) * math.log(n_docs / df[t]), 6), t)
                for t, c in tf.items()
            ),
            key=lambda p: (-p[0], p[1]),
        )
        for rank, (score, term) in enumerate(scored[:3], start=1):
            expect.add((doc_id, term, rank, score))

    got = {
        (r.doc_id, r.term, r.rank, r.tfidf)
        for r in REGISTRY["tfidf_topterms"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_text_quality_matches_bruteforce(spark):
    """text_quality's integer signals must equal direct Python counts."""
    from dend_spark_data_lake_spark.queries import REGISTRY
    from dend_spark_data_lake_spark.functions.text import EN_STOPWORDS
    from tests.conftest import SF_SMOKE

    expect = {}
    for doc_id, text, _, _ in _smoke_docs():
        toks = _ws_tokens(text)
        expect[doc_id] = (
            len(text),
            len(toks),
            sum(text.count(c) for c in ".!?,;:"),
            sum(1 for t in toks if t in EN_STOPWORDS),
            len(toks) >= 10,
        )
    got = {
        r.doc_id: (r.n_chars, r.n_tokens, r.n_punct, r.n_stopwords, r.quality_ok)
        for r in REGISTRY["text_quality"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_text_fingerprint_matches_bruteforce(spark):
    """text_fingerprint must equal hashlib-md5 of the normalized text
    (lower, strip non-alnum, collapse whitespace, trim)."""
    import hashlib
    import re

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    expect = {}
    for doc_id, text, _, _ in _smoke_docs():
        norm = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", "", text.lower())).strip()
        expect[doc_id] = hashlib.md5(norm.encode()).hexdigest()
    got = {
        r.doc_id: r.fingerprint
        for r in REGISTRY["text_fingerprint"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_text_langid_matches_bruteforce(spark):
    """text_langid's integer decision boundary (stopword hits*100 >=
    n_tokens*5) must match a direct recount."""
    from dend_spark_data_lake_spark.queries import REGISTRY
    from dend_spark_data_lake_spark.functions.text import EN_STOPWORDS
    from tests.conftest import SF_SMOKE

    expect = {}
    for doc_id, text, lang, _ in _smoke_docs():
        toks = _ws_tokens(text)
        hits = sum(1 for t in toks if t in EN_STOPWORDS)
        pred = "unk" if not toks else ("en" if hits * 100 >= len(toks) * 5 else "unk")
        expect[doc_id] = (lang, pred)
    got = {
        r.doc_id: (r.lang_label, r.lang_pred)
        for r in REGISTRY["text_langid"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_text_token_counts_matches_bruteforce(spark):
    """text_token_counts per-lang sums must equal direct re.findall
    counts for both tokenizations."""
    import re
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    n, ws, bpe = Counter(), Counter(), Counter()
    for _, text, lang, _ in _smoke_docs():
        n[lang] += 1
        ws[lang] += len(_ws_tokens(text))
        bpe[lang] += len(re.findall(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", text))
    expect = {lang: (n[lang], ws[lang], bpe[lang]) for lang in n}
    got = {
        r.lang: (r.n_docs, r.total_ws_tokens, r.total_bpe_tokens)
        for r in REGISTRY["text_token_counts"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def _shingle_sets(n=3):
    """doc_id -> distinct word-n-gram set (docs with >= 1 shingle)."""
    out = {}
    for doc_id, text, _, _ in _smoke_docs():
        t = _ws_tokens(text)
        sh = {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}
        if sh:
            out[doc_id] = sh
    return out


def test_ngram_jaccard_matches_bruteforce(spark):
    """dedup_ngram_jaccard must equal the all-pairs set-Jaccard at the
    0.5 threshold — the prefix-filtered index must lose NO pair."""
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    sets = _shingle_sets()
    ids = sorted(sets)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if inter and inter / union >= 0.5:
                expect[(a, b)] = round(inter / union, 6)
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in REGISTRY["dedup_ngram_jaccard"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_minhash_banded_matches_bruteforce(spark):
    """dedup_minhash: hashlib-md5 minhash signatures, band buckets, and
    the exact-Jaccard verify filter must all reproduce bit-for-bit."""
    import hashlib
    from itertools import combinations

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    def h(i, s):
        return int(hashlib.md5(f"{i}:{s}".encode()).hexdigest()[:15], 16)

    sets = _shingle_sets()
    sigs = {
        d: [min(h(i, s) for s in sh) for i in range(8)] for d, sh in sets.items()
    }
    buckets = {}
    for d, m in sigs.items():
        for band in range(4):
            key = (band, f"{m[2 * band]}_{m[2 * band + 1]}")
            buckets.setdefault(key, []).append(d)
    cands = set()
    for ds in buckets.values():
        for a, b in combinations(sorted(ds), 2):
            cands.add((a, b))
    expect = {}
    for a, b in cands:
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if inter and inter / union >= 0.5:
            expect[(a, b)] = round(inter / union, 6)
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in REGISTRY["dedup_minhash"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_simhash_matches_bruteforce(spark):
    """dedup_simhash: 48-bit md5 vote fingerprint, 12-bit band buckets,
    Hamming <= 8 — all integer arithmetic, recomputed with hashlib."""
    import hashlib
    from itertools import combinations

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    fps = {}
    for doc_id, text, _, _ in _smoke_docs():
        toks = [t for t in _ws_tokens(text) if t]
        if not toks:
            continue
        votes = [0] * 48
        for t in toks:
            hv = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            for b in range(48):
                votes[b] += 1 if (hv >> b) & 1 else -1
        fps[doc_id] = sum(1 << b for b in range(48) if votes[b] > 0)
    buckets = {}
    for d, fp in fps.items():
        for band in range(4):
            buckets.setdefault((band, (fp >> (12 * band)) & 0xFFF), []).append(d)
    expect = {}
    for ds in buckets.values():
        for a, b in combinations(sorted(ds), 2):
            ham = bin(fps[a] ^ fps[b]).count("1")
            if ham <= 8:
                expect[(a, b)] = ham
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in REGISTRY["dedup_simhash"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_session_window_batch_matches_bruteforce(spark):
    """session_window_batch must equal the per-user 30-minute-gap walk
    under (ts, event_id) ordering, with 0-based cumulative session ids."""
    from collections import defaultdict
    from datetime import timedelta

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, ts, event_id FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    con.close()
    per_user = defaultdict(list)
    for u, ts, eid in rows:
        per_user[u].append((ts, eid))
    gap = timedelta(minutes=30)
    expect = {}
    for u, evs in per_user.items():
        evs.sort()
        sid, prev = 0, None
        sessions = defaultdict(list)
        for ts, _ in evs:
            if prev is not None and ts - prev > gap:
                sid += 1
            sessions[sid].append(ts)
            prev = ts
        for sid, tss in sessions.items():
            expect[(u, sid)] = (min(tss), max(tss), len(tss))
    got = {
        (r.user_id, r.sess_id): (r.session_start, r.session_end, r.n_events)
        for r in REGISTRY["session_window_batch"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def _smoke_embeddings():
    import duckdb

    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT vec_id, label, embedding FROM "
        f"read_parquet('{SF_SMOKE}/embeddings.parquet')"
    ).fetchall()
    con.close()
    return rows


def test_cosine_topk_matches_bruteforce(spark):
    """sim_cosine_topk must equal the numpy all-pairs cosine with
    round-6-then-rank (score desc, neighbor_id asc) semantics."""
    import numpy as np

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    vecs = {vid: np.asarray(v, dtype=np.float64) for vid, _, v in _smoke_embeddings()}
    norms = {vid: float(np.sqrt(v @ v)) for vid, v in vecs.items()}
    expect = set()
    for q in [v for v in vecs if v < 10]:
        scored = sorted(
            (
                (-round(float(vecs[q] @ vecs[c]) / (norms[q] * norms[c]), 6), c)
                for c in vecs
                if c != q
            ),
        )
        for rank, (neg, c) in enumerate(scored[:5], start=1):
            expect.add((q, c, -neg, rank))
    got = {
        (r.query_id, r.neighbor_id, r.cosine, r.rank)
        for r in REGISTRY["sim_cosine_topk"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_embedding_near_pairs_matches_bruteforce(spark):
    """dedup_embedding_cosine (blocked-GEMM applyInPandas path) must equal
    the plain numpy all-pairs scan at the rounded >= 0.4 threshold."""
    import numpy as np

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_embeddings()
    ids = [vid for vid, _, _ in rows]
    M = np.asarray([v for _, _, v in rows], dtype=np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    C = M @ M.T
    expect = {}
    for i in range(len(ids)):
        for j in range(len(ids)):
            a, b = ids[i], ids[j]
            if a < b:
                cos = round(float(C[i, j]), 6)
                if cos >= 0.4:
                    expect[(a, b)] = cos
    got = {
        (r.vec_a, r.vec_b): r.cosine
        for r in REGISTRY["dedup_embedding_cosine"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_embed_norm_stats_matches_bruteforce(spark):
    """embed_norm_stats per-label (n, avg L2 norm, avg dim0) must match
    the numpy recomputation."""
    from collections import defaultdict

    import numpy as np

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    by_label = defaultdict(list)
    for vid, label, v in _smoke_embeddings():
        by_label[label].append(np.asarray(v, dtype=np.float64))
    expect = {
        lab: (
            len(vs),
            round(float(np.mean([np.sqrt(v @ v) for v in vs])), 4),
            round(float(np.mean([v[0] for v in vs])), 6),
        )
        for lab, vs in by_label.items()
    }
    got = {
        r.label: (r.n_vectors, r.avg_norm, r.avg_dim0)
        for r in REGISTRY["embed_norm_stats"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_det_hash_sample_matches_bruteforce(spark):
    """sample_det_hash: the md5-hex-prefix < '1999' Bernoulli filter must
    select exactly the hashlib-computed id set."""
    import hashlib

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    expect = {
        doc_id
        for doc_id, _, _, _ in _smoke_docs()
        if hashlib.md5(str(doc_id).encode()).hexdigest()[:4] < "1999"
    }
    got = {r.doc_id for r in REGISTRY["sample_det_hash"].fn(spark, SF_SMOKE).collect()}
    assert got == expect


def test_split_train_valid_test_matches_bruteforce(spark):
    """split_train_valid_test: the 80/10/10 md5-bucket assignment and the
    per-(split, lang) rollup must match a hashlib walk over documents."""
    import hashlib
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, lang, n_chars FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    con.close()
    agg = defaultdict(lambda: [0, 0])
    for doc_id, lang, n_chars in rows:
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[:4]
        split = "train" if h < "cccc" else ("valid" if h < "e666" else "test")
        agg[(split, lang)][0] += 1
        agg[(split, lang)][1] += n_chars
    expect = {k: tuple(v) for k, v in agg.items()}
    got = {
        (r.split, r.lang): (r.n_docs, r.sum_chars)
        for r in REGISTRY["split_train_valid_test"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_stratified_sample_matches_bruteforce(spark):
    """sample_stratified: per-stratum md5 thresholds (en 10%, default 50%)
    must reproduce the hashlib-selected per-lang counts."""
    import hashlib
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    counts = Counter()
    for doc_id, _, lang, _ in _smoke_docs():
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[:4]
        if h < ("1999" if lang == "en" else "8000"):
            counts[lang] += 1
    got = {
        r.lang: r.n_docs
        for r in REGISTRY["sample_stratified"].fn(spark, SF_SMOKE).collect()
    }
    assert got == dict(counts)


def test_text_length_band_matches_bruteforce(spark):
    """text_length_band: the integer cum*100 >= pct*n band bounds and the
    per-lang rollup inside [p5, p95] must match a sorted-histogram walk."""
    from collections import Counter, defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    docs = [(doc_id, lang, len(text)) for doc_id, text, lang, _ in _smoke_docs()]
    n = len(docs)
    hist = Counter(nc for _, _, nc in docs)
    lo = hi = None
    cum = 0
    for nc in sorted(hist):
        cum += hist[nc]
        if lo is None and cum * 100 >= 5 * n:
            lo = nc
        if hi is None and cum * 100 >= 95 * n:
            hi = nc
    agg = defaultdict(list)
    for _, lang, nc in docs:
        if lo <= nc <= hi:
            agg[lang].append(nc)
    expect = {
        lang: (len(v), min(v), max(v)) for lang, v in agg.items()
    }
    got = {
        r.lang: (r.n_docs, r.min_chars, r.max_chars)
        for r in REGISTRY["text_length_band"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_percentiles_exact_matches_bruteforce(spark):
    """agg_percentiles_exact must equal numpy's linear-interpolation
    quantiles (the definition Spark percentile() and DuckDB quantile_cont
    share) per return flag."""
    from collections import defaultdict

    import duckdb
    import numpy as np

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT l_returnflag, l_quantity, l_extendedprice FROM "
        f"read_parquet('{SF_SMOKE}/lineitem.parquet')"
    ).fetchall()
    con.close()
    qty, price = defaultdict(list), defaultdict(list)
    for flag, q, p in rows:
        qty[flag].append(q)
        price[flag].append(p)
    expect = {
        flag: (
            round(float(np.percentile(qty[flag], 50, method="linear")), 4),
            round(float(np.percentile(price[flag], 90, method="linear")), 4),
            round(float(np.percentile(price[flag], 10, method="linear")), 4),
        )
        for flag in qty
    }
    got = {
        r.l_returnflag: (r.median_qty, r.p90_price, r.p10_price)
        for r in REGISTRY["agg_percentiles_exact"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_multimodal_chunks_matches_bruteforce(spark):
    """multimodal_chunks: fixed 256-byte windows + per-chunk md5 must
    match a direct Python slicing walk (corpus is ASCII)."""
    import hashlib

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    expect = {}
    for doc_id, text, _, _ in _smoke_docs():
        if doc_id >= 100:
            continue
        for idx in range(0, (len(text) + 255) // 256):
            piece = text[idx * 256 : idx * 256 + 256]
            expect[(doc_id, idx)] = (
                len(piece),
                hashlib.md5(piece.encode()).hexdigest(),
            )
    got = {
        (r.doc_id, r.chunk_idx): (r.chunk_n_bytes, r.chunk_md5)
        for r in REGISTRY["multimodal_chunks"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_multimodal_frame_sample_matches_bruteforce(spark):
    """multimodal_frame_sample: every 2nd 64-byte window, same walk."""
    import hashlib

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    expect = {}
    for doc_id, text, _, _ in _smoke_docs():
        if doc_id >= 100:
            continue
        for idx in range(0, (len(text) + 63) // 64):
            if idx % 2:
                continue
            piece = text[idx * 64 : idx * 64 + 64]
            expect[(doc_id, idx)] = (
                len(piece),
                hashlib.md5(piece.encode()).hexdigest(),
            )
    got = {
        (r.doc_id, r.chunk_idx): (r.chunk_n_bytes, r.chunk_md5)
        for r in REGISTRY["multimodal_frame_sample"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_scd2_intervals_match_bruteforce(spark):
    """scd2_status_intervals must equal the per-customer run-length walk
    over (o_orderdate, o_orderkey)-ordered statuses."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate FROM "
        f"read_parquet('{SF_SMOKE}/orders.parquet')"
    ).fetchall()
    con.close()
    per_cust = defaultdict(list)
    for ck, ok, st, dt in rows:
        per_cust[ck].append((dt, ok, st))
    expect = set()
    for ck, orders in per_cust.items():
        orders.sort()
        runs = []
        for dt, _, st in orders:
            if runs and runs[-1][0] == st:
                runs[-1][1].append(dt)
            else:
                runs.append((st, [dt]))
        for st, dts in runs:
            expect.add((ck, st, min(dts), max(dts), len(dts)))
    got = {
        (r.o_custkey, r.o_orderstatus, r.valid_from, r.valid_to, r.n_orders)
        for r in REGISTRY["scd2_status_intervals"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_agg_histogram_matches_bruteforce(spark):
    """agg_histogram's clamped floor(x/25000) binning must match a direct
    Python walk over order totals."""
    import math
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = [
        r[0]
        for r in con.sql(
            f"SELECT o_totalprice FROM read_parquet('{SF_SMOKE}/orders.parquet')"
        ).fetchall()
    ]
    con.close()
    bins = defaultdict(list)
    for p in rows:
        bins[min(math.floor(p / 25000), 19)].append(p)
    expect = {
        b: (len(v), round(min(v), 2), round(max(v), 2)) for b, v in bins.items()
    }
    got = {
        r.bin: (r.n_orders, r.lo, r.hi)
        for r in REGISTRY["agg_histogram"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_dedup_exact_docs_matches_bruteforce(spark):
    """dedup_exact_docs: hashlib-md5 content groups with min-id keep."""
    import hashlib
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    groups = defaultdict(list)
    for doc_id, text, _, _ in _smoke_docs():
        groups[hashlib.md5(text.encode()).hexdigest()].append(doc_id)
    expect = {h: (min(ids), len(ids)) for h, ids in groups.items()}
    got = {
        r.text_md5: (r.keep_id, r.n_copies)
        for r in REGISTRY["dedup_exact_docs"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_text_normalize_matches_bruteforce(spark):
    """text_normalize must equal the Python re normalization chain."""
    import re

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    expect = {}
    for doc_id, text, _, _ in _smoke_docs():
        if doc_id >= 200:
            continue
        norm = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", "", text.lower())).strip()
        expect[doc_id] = (norm, len(norm))
    got = {
        r.doc_id: (r.norm_text, r.n_chars_norm)
        for r in REGISTRY["text_normalize"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_centroid_by_label_matches_bruteforce(spark):
    """embed_centroid_by_label must equal numpy per-(label, dim) means."""
    from collections import defaultdict

    import numpy as np

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    by_label = defaultdict(list)
    for _, label, v in _smoke_embeddings():
        by_label[label].append(np.asarray(v, dtype=np.float64))
    expect = {}
    for lab, vs in by_label.items():
        m = np.mean(vs, axis=0)
        for pos in range(len(m)):
            expect[(lab, pos)] = round(float(m[pos]), 6)
    got = {
        (r.label, r.pos): r.c
        for r in REGISTRY["embed_centroid_by_label"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def _lev(a, b):
    if abs(len(a) - len(b)) > 1:
        return 2  # caller only needs <= 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_levenshtein_matches_bruteforce(spark):
    """join_fuzzy_levenshtein: the deletion-1-neighborhood blocked join
    must equal the all-pairs DP edit distance at threshold 1 (no pair
    lost to blocking)."""
    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT s_suppkey, s_name FROM read_parquet('{SF_SMOKE}/supplier.parquet')"
    ).fetchall()
    con.close()
    expect = {}
    for i, (ka, na) in enumerate(rows):
        for kb, nb in rows[i + 1 :]:
            lo, hi = (ka, kb) if ka < kb else (kb, ka)
            la, lb = (na, nb) if ka < kb else (nb, na)
            d = _lev(la, lb)
            if d <= 1:
                expect[(lo, hi)] = d
    got = {
        (r.key_a, r.key_b): r.dist
        for r in REGISTRY["join_fuzzy_levenshtein"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


class _UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def _components(pairs):
    """pair list -> {vertex: min-vertex-of-component} (edge-touched only)."""
    uf = _UF()
    for a, b in pairs:
        uf.union(a, b)
    return {v: uf.find(v) for v in uf.p}


def test_dedup_clusters_match_unionfind(spark):
    """dedup_clusters (min-label propagation over ngram-Jaccard pairs)
    must equal a plain union-find over the replica pair set."""
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    sets = _shingle_sets()
    ids = sorted(sets)
    pairs = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter and inter / len(sets[a] | sets[b]) >= 0.5:
                pairs.append((a, b))
    expect = _components(pairs)
    got = {
        r.doc_id: r.cluster_id
        for r in REGISTRY["dedup_clusters"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_dedup_corpus_matches_unionfind(spark):
    """dedup_corpus must keep exactly corpus minus non-representative
    cluster members (union-find replica)."""
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    sets = _shingle_sets()
    ids = sorted(sets)
    pairs = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter and inter / len(sets[a] | sets[b]) >= 0.5:
                pairs.append((a, b))
    comp = _components(pairs)
    drop = {v for v, c in comp.items() if v != c}
    expect = {d for d, _, _, _ in _smoke_docs()} - drop
    got = {r.doc_id for r in REGISTRY["dedup_corpus"].fn(spark, SF_SMOKE).collect()}
    assert got == expect


def test_semantic_corpus_matches_bruteforce(spark):
    """dedup_semantic_corpus: IVF top-2 probe assignment (vec_id%100
    centroids), in-bucket rounded-cosine >= 0.4 pairs, union-find drop —
    full numpy replica of the bucketed pipeline."""
    from itertools import combinations

    import numpy as np

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_embeddings()
    vecs = {vid: np.asarray(v, dtype=np.float64) for vid, _, v in rows}
    labels = {vid: lab for vid, lab, _ in rows}
    norms = {vid: float(np.sqrt(v @ v)) for vid, v in vecs.items()}
    cents = [vid for vid in vecs if vid % 100 == 0]
    assigned = {}
    for vid, v in vecs.items():
        scored = sorted(
            ((-round(float(v @ vecs[c]) / (norms[vid] * norms[c]), 6), c) for c in cents)
        )
        assigned[vid] = [c for _, c in scored[:2]]
    buckets = {}
    for vid, cids in assigned.items():
        for c in cids:
            buckets.setdefault(c, []).append(vid)
    pairs = set()
    for members in buckets.values():
        for a, b in combinations(sorted(members), 2):
            cos = round(float(vecs[a] @ vecs[b]) / (norms[a] * norms[b]), 6)
            if cos >= 0.4:
                pairs.add((a, b))
    comp = _components(sorted(pairs))
    drop = {v for v, c in comp.items() if v != c}
    expect = {vid: labels[vid] for vid in vecs if vid not in drop}
    got = {
        r.vec_id: r.label
        for r in REGISTRY["dedup_semantic_corpus"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_text_repetition_matches_bruteforce(spark):
    """text_repetition's token/bigram duplicate signals and ratios must
    equal direct Counter arithmetic."""
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    expect = {}
    for doc_id, text, _, _ in _smoke_docs():
        t = [x for x in _ws_tokens(text) if x]
        bg = [f"{a} {b}" for a, b in zip(t, t[1:])] if len(t) >= 2 else []
        tc = Counter(t)
        expect[doc_id] = (
            len(t),
            len(tc),
            max(tc.values()) if tc else 0,
            len(bg),
            len(set(bg)),
            round(len(tc) / len(t), 6) if t else None,
            round((len(bg) - len(set(bg))) / len(bg), 6) if bg else None,
        )
    got = {
        r.doc_id: (
            r.n_tokens,
            r.n_distinct_tokens,
            r.top_token_count,
            r.n_bigrams,
            r.n_distinct_bigrams,
            r.distinct_token_ratio,
            r.dup_bigram_ratio,
        )
        for r in REGISTRY["text_repetition"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_decontaminate_matches_bruteforce(spark):
    """decontaminate_docs: shared-4-gram counts vs the doc_id%10 eval set
    must equal direct set intersections."""
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    shingles = {}
    for doc_id, text, _, _ in _smoke_docs():
        t = _ws_tokens(text)
        shingles[doc_id] = {" ".join(t[i : i + 4]) for i in range(len(t) - 3)}
    eval_vocab = set().union(
        *(sh for d, sh in shingles.items() if d % 10 == 0)
    )
    expect = {
        d: len(sh & eval_vocab)
        for d, sh in shingles.items()
        if d % 10 != 0 and sh & eval_vocab
    }
    got = {
        r.doc_id: r.n_shared_shingles
        for r in REGISTRY["decontaminate_docs"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_pii_flags_match_bruteforce(spark):
    """text_pii_flags regex counters must equal Python re.findall counts."""
    import re

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    expect = {}
    for doc_id, text, _, _ in _smoke_docs():
        lt = text.lower()
        expect[doc_id] = (
            len(re.findall(r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", lt)),
            len(re.findall(r"[0-9]{6,}", lt)),
            len(re.findall(r"https?://[^ ]+", lt)),
        )
    got = {
        r.doc_id: (r.n_emails, r.n_long_digit_runs, r.n_urls)
        for r in REGISTRY["text_pii_flags"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_chunk_sliding_matches_bruteforce(spark):
    """text_chunk_sliding: 32-token windows at stride 24 with short-tail
    coverage must match a Python slicing walk."""
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    expect = {}
    for doc_id, text, _, _ in _smoke_docs():
        t = [x for x in _ws_tokens(text) if x]
        n = len(t)
        if n == 0:
            continue
        if n <= 32:
            starts = [1]
        else:
            last = ((n - 32 + 23) // 24) * 24 + 1
            starts = list(range(1, last + 1, 24))
        for idx, s in enumerate(starts):
            piece = t[s - 1 : s + 31]
            expect[(doc_id, idx)] = (" ".join(piece), min(n - s + 1, 32))
    got = {
        (r.doc_id, r.chunk_idx): (r.chunk_text, r.n_tokens)
        for r in REGISTRY["text_chunk_sliding"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_mix_rebalance_matches_bruteforce(spark):
    """corpus_mix_rebalance: per-source integer thresholds
    (min_tokens * 65536 DIV c_s) over md5 hash buckets must reproduce the
    exact kept set."""
    import hashlib
    import re
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    docs = []
    for doc_id, text, _, source in _smoke_docs():
        s = text.strip()
        w = len(re.split(r"\s+", s)) if s else 0
        docs.append((doc_id, source, w))
    totals = Counter()
    for _, src, w in docs:
        totals[src] += w
    k = min(totals.values())
    thr = {src: k * 65536 // c for src, c in totals.items()}
    expect = {
        (d, src): w
        for d, src, w in docs
        if int(hashlib.md5(str(d).encode()).hexdigest()[:4], 16) < thr[src]
    }
    got = {
        (r.doc_id, r.source): r.n_tokens
        for r in REGISTRY["corpus_mix_rebalance"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_revenue_concentration_matches_bruteforce(spark):
    """sql_revenue_concentration: integer e4 revenue per part gated by
    the exact (2 * total) DIV 10000 threshold — arbitrary-precision
    Python ints, the class where engine and oracle could share a bug."""
    from collections import Counter

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT l_partkey, l_extendedprice, l_discount FROM "
        f"read_parquet('{SF_SMOKE}/lineitem.parquet')"
    ).fetchall()
    con.close()
    rev = Counter()
    for pk, price, disc in rows:
        v = price * (1 - disc) * 10000
        rev[pk] += int(v + 0.5) if v >= 0 else -int(-v + 0.5)
    thr = (2 * sum(rev.values())) // 10000
    expect = {pk: e4 for pk, e4 in rev.items() if e4 > thr}
    got = {
        r.l_partkey: r.revenue_e4
        for r in REGISTRY["sql_revenue_concentration"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_key_skew_matches_bruteforce(spark):
    """profile_key_skew: exact counts + floor-ppm shares, top-10 under
    (count desc, key asc)."""
    from collections import Counter

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id FROM read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    con.close()
    counts = Counter(u for (u,) in rows)
    total = sum(counts.values())
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    expect = [(k, n, n * 1_000_000 // total) for k, n in top]
    got = [
        (r.key_value, r.n_rows, r.share_ppm)
        for r in REGISTRY["profile_key_skew"].fn(spark, SF_SMOKE).collect()
    ]
    assert got == expect


def test_quantize_int8_matches_bruteforce(spark):
    """embed_quantize_int8: per-vector 127/max|x| scale and HALF-UP
    rounded codes, md5-verified payload — numpy/hashlib replica."""
    import hashlib
    import math

    import numpy as np

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    def half_away(v):
        return math.floor(v + 0.5) if v >= 0 else -math.floor(-v + 0.5)

    expect = {}
    for vid, _, v in _smoke_embeddings():
        x = np.asarray(v, dtype=np.float64)
        mx = float(np.max(np.abs(x)))
        scale = 0.0 if mx == 0 else 127.0 / mx
        codes = [half_away(float(xi) * scale) for xi in x]
        expect[vid] = (
            len(codes),
            round(scale, 4),
            hashlib.md5(",".join(str(c) for c in codes).encode()).hexdigest(),
            max(codes),
        )
    got = {
        r.vec_id: (r.n_dims, r.scale_r4, r.codes_md5, r.max_code)
        for r in REGISTRY["embed_quantize_int8"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_incremental_batch_matches_bruteforce(spark):
    """dedup_incremental_batch: batch(id%10>=8) x corpus band candidates
    with exact-Jaccard verify — hashlib MinHash replica; the corpus must
    never self-pair."""
    import hashlib

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    def h(i, s):
        return int(hashlib.md5(f"{i}:{s}".encode()).hexdigest()[:15], 16)

    sets = _shingle_sets()
    sigs = {
        d: [min(h(i, s) for s in sh) for i in range(8)] for d, sh in sets.items()
    }
    buckets = {}
    for d, m in sigs.items():
        for band in range(4):
            buckets.setdefault((band, f"{m[2 * band]}_{m[2 * band + 1]}"), []).append(d)
    cands = set()
    for ds in buckets.values():
        for a in ds:
            for b in ds:
                if a % 10 >= 8 and b % 10 < 8:
                    cands.add((a, b))
    expect = {}
    for new, old in cands:
        inter = len(sets[new] & sets[old])
        union = len(sets[new] | sets[old])
        if inter and inter / union >= 0.5:
            expect[(new, old)] = round(inter / union, 6)
    got = {
        (r.new_doc, r.old_doc): r.jaccard
        for r in REGISTRY["dedup_incremental_batch"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_numeric_corr_matches_bruteforce(spark):
    """profile_numeric_corr: exact integer moments (Python bignums) and
    the one-double-expression Pearson r."""
    import math

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT l_quantity, l_extendedprice, l_discount FROM "
        f"read_parquet('{SF_SMOKE}/lineitem.parquet')"
    ).fetchall()
    con.close()
    cents = [
        (int(round(q * 100)), int(round(p * 100)), int(round(d * 100)))
        for q, p, d in rows
    ]
    n = len(cents)
    cols = list(zip(*cents))
    names = ["l_quantity", "l_extendedprice", "l_discount"]

    def r(i, j):
        si, sj = sum(cols[i]), sum(cols[j])
        sij = sum(a * b for a, b in zip(cols[i], cols[j]))
        sii = sum(a * a for a in cols[i])
        sjj = sum(b * b for b in cols[j])
        num = float(n * sij - si * sj)
        return round(num / math.sqrt(float(n * sii - si * si) * float(n * sjj - sj * sj)), 6)

    expect = {
        (names[0], names[1]): r(0, 1),
        (names[0], names[2]): r(0, 2),
        (names[1], names[2]): r(1, 2),
    }
    got = {
        (row.col_a, row.col_b): row.pearson_r
        for row in REGISTRY["profile_numeric_corr"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_fixed_per_stratum_matches_bruteforce(spark):
    """sample_fixed_per_stratum: md5-ordered top-25 per language with the
    two-phase local/global window producing the same exact carve."""
    import hashlib
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    by_lang = defaultdict(list)
    for doc_id, _, lang, _ in _smoke_docs():
        by_lang[lang].append(
            (hashlib.md5(str(doc_id).encode()).hexdigest(), doc_id)
        )
    expect = {}
    for lang, members in by_lang.items():
        members.sort()
        for rnk, (_, doc_id) in enumerate(members[:25], start=1):
            expect[doc_id] = (lang, rnk)
    got = {
        r.doc_id: (r.lang, r.rnk)
        for r in REGISTRY["sample_fixed_per_stratum"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_canonical_best_matches_bruteforce(spark):
    """dedup_canonical_best: per-cluster argmax on (token count desc,
    doc_id asc), singletons self-clustered — union-find replica."""
    import re

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    sets = _shingle_sets()
    ids = sorted(sets)
    pairs = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter and inter / len(sets[a] | sets[b]) >= 0.5:
                pairs.append((a, b))
    comp = _components(pairs)
    best = {}
    for doc_id, text, _, _ in _smoke_docs():
        s = text.strip()
        w = len(re.split(r"\s+", s)) if s else 0
        cid = comp.get(doc_id, doc_id)
        cand = (w, -doc_id)
        if cid not in best or cand > best[cid][0]:
            best[cid] = (cand, doc_id, w)
    expect = {cid: (d, w) for cid, (_, d, w) in best.items()}
    got = {
        r.cluster_id: (r.canonical_doc, r.n_tokens)
        for r in REGISTRY["dedup_canonical_best"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_triangle_stats_match_bruteforce(spark):
    """graph_triangle_stats: triangle/wedge counts over the near-dup pair
    graph via direct adjacency-set enumeration."""
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    sets = _shingle_sets()
    ids = sorted(sets)
    pairs = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter and inter / len(sets[a] | sets[b]) >= 0.5:
                pairs.add((a, b))
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(
        1
        for a, b in pairs
        for c in adj[a] & adj[b]
        if c > b
    )
    wedges = sum(d * (d - 1) // 2 for d in (len(v) for v in adj.values()))
    coef = round(3.0 * tri / wedges, 6) if wedges else 0.0
    rows = REGISTRY["graph_triangle_stats"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_triangles, r.n_wedges, r.global_clustering_r6) == (tri, wedges, coef)


def test_vocab_top_coverage_matches_bruteforce(spark):
    """vocab_top_coverage: top-100 tokens by (count desc, token asc) with
    cumulative coverage over the FULL token total."""
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    counts = Counter()
    for _, text, _, _ in _smoke_docs():
        counts.update(_ws_tokens(text))
    total = sum(counts.values())
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    expect, cum = {}, 0
    for rank, (tok, n) in enumerate(ranked, start=1):
        cum += n
        expect[rank] = (tok, n, round(cum / total, 6))
    got = {
        r.rank: (r.token, r.n, r.coverage_r6)
        for r in REGISTRY["vocab_top_coverage"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_ttr_hapax_matches_bruteforce(spark):
    """text_ttr_hapax: the zero-shuffle sorted-array fold must equal plain
    Counter type/hapax counts and integer-ratio TTRs."""
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    expect = {}
    for doc_id, text, _, _ in _smoke_docs():
        toks = _ws_tokens(text)
        if not toks:
            continue
        c = Counter(toks)
        hapax = sum(1 for v in c.values() if v == 1)
        expect[doc_id] = (
            len(toks),
            len(c),
            hapax,
            round(len(c) / len(toks), 6),
            round(hapax / len(c), 6),
        )
    got = {
        r.doc_id: (r.n_tokens, r.n_types, r.n_hapax, r.ttr_r6, r.hapax_ratio_r6)
        for r in REGISTRY["text_ttr_hapax"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_tokenize_with_vocab_matches_bruteforce(spark):
    """tokenize_with_vocab: full-corpus top-500 vocab ids (count desc,
    token asc) applied to every-20th doc, 0 = OOV."""
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    counts = Counter()
    docs_toks = {}
    for doc_id, text, _, _ in _smoke_docs():
        toks = _ws_tokens(text)
        if not toks:
            continue
        counts.update(toks)
        docs_toks[doc_id] = toks
    vocab = {
        tok: i
        for i, (tok, _) in enumerate(
            sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:500], start=1
        )
    }
    expect = {}
    for doc_id, toks in docs_toks.items():
        if doc_id % 20:
            continue
        for pos, tok in enumerate(toks, start=1):
            expect[(doc_id, pos)] = (tok, vocab.get(tok, 0))
    got = {
        (r.doc_id, r.pos): (r.token, r.token_id)
        for r in REGISTRY["tokenize_with_vocab"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_boilerplate_grams_match_bruteforce(spark):
    """boilerplate_frequent_grams: >= 4-doc shingles as boilerplate vocab,
    per-doc integer ppm coverage."""
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    sets = _shingle_sets()
    df = Counter()
    for sh in sets.values():
        df.update(sh)
    boiler = {s for s, n in df.items() if n >= 4}
    expect = {}
    for d, sh in sets.items():
        nb = len(sh & boiler)
        expect[d] = (len(sh), nb, nb * 1_000_000 // len(sh))
    got = {
        r.doc_id: (r.n_shingles, r.n_boiler, r.boiler_ppm)
        for r in REGISTRY["boilerplate_frequent_grams"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_temperature_sampling_matches_bruteforce(spark):
    """sample_temperature_by_lang: floor(65536*sqrt(n_min/n)) thresholds
    over md5 buckets, per-lang kept counts."""
    import hashlib
    import math
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    docs = _smoke_docs()
    n = Counter(lang for _, _, lang, _ in docs)
    n_min = min(n.values())
    thr = {
        lang: math.floor(65536 * math.sqrt(n_min / c)) for lang, c in n.items()
    }
    kept = Counter()
    for doc_id, _, lang, _ in docs:
        if int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) < thr[lang]:
            kept[lang] += 1
    expect = {lang: (n[lang], thr[lang], kept[lang]) for lang in n}
    got = {
        r.lang: (r.n_orig, r.bucket_threshold, r.n_kept)
        for r in REGISTRY["sample_temperature_by_lang"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_source_overlap_matches_bruteforce(spark):
    """profile_source_overlap: pairwise source-vocabulary Jaccard in
    exact integer ppm via direct set ops."""
    from collections import defaultdict
    from itertools import combinations

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    vocab = defaultdict(set)
    for _, text, _, source in _smoke_docs():
        t = _ws_tokens(text)
        vocab[source] |= {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}
    expect = {}
    for a, b in combinations(sorted(vocab), 2):
        inter = len(vocab[a] & vocab[b])
        union = len(vocab[a] | vocab[b])
        expect[(a, b)] = (
            len(vocab[a]),
            len(vocab[b]),
            inter,
            inter * 1_000_000 // union,
        )
    got = {
        (r.source_a, r.source_b): (r.n_a, r.n_b, r.n_shared, r.jaccard_ppm)
        for r in REGISTRY["profile_source_overlap"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_kfold_assign_matches_bruteforce(spark):
    """sample_kfold_assign: md5-bucket mod 5 fold ids with per-(fold,
    lang) exact counts."""
    import hashlib
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, lang, n_chars FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    con.close()
    agg = defaultdict(lambda: [0, 0])
    for doc_id, lang, n_chars in rows:
        fold = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % 5
        agg[(fold, lang)][0] += 1
        agg[(fold, lang)][1] += n_chars
    expect = {k: tuple(v) for k, v in agg.items()}
    got = {
        (r.fold, r.lang): (r.n_docs, r.sum_chars)
        for r in REGISTRY["sample_kfold_assign"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def _smoke_lineitem(cols):
    import duckdb

    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT {', '.join(cols)} FROM read_parquet('{SF_SMOKE}/lineitem.parquet')"
    ).fetchall()
    con.close()
    return rows


def test_udf_pandas_scalar_matches_bruteforce(spark):
    """udf_pandas_scalar: the charged-amount business rule
    price*(1-disc)*(1+tax) rounded at 6, per line below orderkey 2000."""
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_lineitem(
        ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax"]
    )
    expect = {
        (ok, ln): round(p * (1 - d) * (1 + t), 6)
        for ok, ln, p, d, t in rows
        if ok < 2000
    }
    got = {
        (r.l_orderkey, r.l_linenumber): r.charged
        for r in REGISTRY["udf_pandas_scalar"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_udf_grouped_agg_matches_bruteforce(spark):
    """udf_grouped_agg: quantity-weighted average price per flag."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    acc = defaultdict(lambda: [0.0, 0.0])
    for flag, p, q in _smoke_lineitem(
        ["l_returnflag", "l_extendedprice", "l_quantity"]
    ):
        acc[flag][0] += p * q
        acc[flag][1] += q
    expect = {flag: round(pq / q, 6) for flag, (pq, q) in acc.items()}
    got = {
        r.l_returnflag: r.wavg_price
        for r in REGISTRY["udf_grouped_agg"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_udf_grouped_map_matches_bruteforce(spark):
    """udf_grouped_map: per-user sample-stddev z-scores (numpy ddof=1)."""
    from collections import defaultdict

    import duckdb
    import numpy as np

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT event_id, user_id, value FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet') WHERE user_id < 50"
    ).fetchall()
    con.close()
    per_user = defaultdict(list)
    for eid, u, v in rows:
        per_user[u].append((eid, v))
    expect = {}
    for u, evs in per_user.items():
        vals = np.asarray([v for _, v in evs], dtype=np.float64)
        m = float(vals.mean())
        sd = float(vals.std(ddof=1)) if len(vals) > 1 else float("nan")
        for eid, v in evs:
            z = (v - m) / sd if sd and not np.isnan(sd) else None
            expect[(eid, u)] = round(z, 6) if z is not None else None
    got = {
        (r.event_id, r.user_id): r.z
        for r in REGISTRY["udf_grouped_map"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_bigram_counts_match_bruteforce(spark):
    """text_bigram_counts: corpus top-50 adjacent bigrams with the
    (count desc, bigram asc) deterministic cutoff."""
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    counts = Counter()
    for _, text, _, _ in _smoke_docs():
        t = _ws_tokens(text)
        counts.update(f"{a} {b}" for a, b in zip(t, t[1:]))
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    got = [
        (r.bigram, r.n)
        for r in REGISTRY["text_bigram_counts"].fn(spark, SF_SMOKE).collect()
    ]
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == expect


def test_dq_constraints_match_bruteforce(spark):
    """dq_orders_constraints: all five audit rules recounted directly."""
    from collections import Counter

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    orders = con.sql(
        f"SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice, o_orderstatus "
        f"FROM read_parquet('{SF_SMOKE}/orders.parquet')"
    ).fetchall()
    custkeys = {
        r[0]
        for r in con.sql(
            f"SELECT c_custkey FROM read_parquet('{SF_SMOKE}/customer.parquet')"
        ).fetchall()
    }
    con.close()
    keys = Counter(ok for ok, *_ in orders)
    expect = {
        "not_null(o_custkey,o_orderdate)": sum(
            1 for _, ck, dt, _, _ in orders if ck is None or dt is None
        ),
        "in_range(o_totalprice,0,600000)": sum(
            1 for _, _, _, tp, _ in orders if not (0 <= tp <= 600000)
        ),
        "in_set(o_orderstatus)": sum(
            1 for _, _, _, _, st in orders if st not in ("F", "O", "P")
        ),
        "unique(o_orderkey)": sum(n - 1 for n in keys.values()),
        "fk(o_custkey->customer)": sum(
            1 for _, ck, _, _, _ in orders if ck not in custkeys
        ),
    }
    got = {
        r.rule: r.n_violations
        for r in REGISTRY["dq_orders_constraints"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_customer_distribution_matches_bruteforce(spark):
    """agg_customer_distribution (Q13 shape): per-customer non-urgent
    order counts, then the count-of-counts histogram."""
    from collections import Counter

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    custs = [
        r[0]
        for r in con.sql(
            f"SELECT c_custkey FROM read_parquet('{SF_SMOKE}/customer.parquet')"
        ).fetchall()
    ]
    orders = con.sql(
        f"SELECT o_custkey, o_orderpriority FROM "
        f"read_parquet('{SF_SMOKE}/orders.parquet')"
    ).fetchall()
    con.close()
    per_cust = Counter()
    for ck, prio in orders:
        if prio != "1-URGENT":
            per_cust[ck] += 1
    dist = Counter(per_cust.get(ck, 0) for ck in custs)
    got = {
        r.c_count: r.custdist
        for r in REGISTRY["agg_customer_distribution"].fn(spark, SF_SMOKE).collect()
    }
    assert got == dict(dist)


def test_order_history_matches_bruteforce(spark):
    """agg_order_history: first five order keys per customer in
    (date, key) order with total counts."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    orders = con.sql(
        f"SELECT o_custkey, o_orderkey, o_orderdate FROM "
        f"read_parquet('{SF_SMOKE}/orders.parquet')"
    ).fetchall()
    con.close()
    per_cust = defaultdict(list)
    for ck, ok, dt in orders:
        per_cust[ck].append((dt, ok))
    expect = {}
    for ck, os in per_cust.items():
        os.sort()
        for pos, (_, ok) in enumerate(os[:5], start=1):
            expect[(ck, pos)] = (ok, len(os))
    got = {
        (r.o_custkey, r.pos): (r.o_orderkey, r.n_orders)
        for r in REGISTRY["agg_order_history"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_sql_udf_margin_matches_bruteforce(spark):
    """sql_udf_margin: integer e4 charged amounts with HALF-AWAY rounding
    per line, summed per flag — Python bignum replica."""
    import math
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    acc = defaultdict(lambda: [0, 0])
    for flag, p, d, t in _smoke_lineitem(
        ["l_returnflag", "l_extendedprice", "l_discount", "l_tax"]
    ):
        v = 10000 * p * (1 - d) * (1 + t)
        e4 = math.floor(v + 0.5) if v >= 0 else -math.floor(-v + 0.5)
        acc[flag][0] += 1
        acc[flag][1] += e4
    expect = {flag: tuple(v) for flag, v in acc.items()}
    got = {
        r.l_returnflag: (r.n_lines, r.charged_e4)
        for r in REGISTRY["sql_udf_margin"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_quality_threshold_curve_matches_bruteforce(spark):
    """quality_threshold_curve: doc/token retention at each threshold."""
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    lens = [len(_ws_tokens(text)) for _, text, _, _ in _smoke_docs()]
    n_docs, n_tokens = len(lens), sum(lens)
    expect = {}
    for thr in [0, 5, 10, 20, 50, 100, 200]:
        kd = sum(1 for w in lens if w >= thr)
        kt = sum(w for w in lens if w >= thr)
        expect[thr] = (kd, kt, round(kd / n_docs, 6), round(kt / n_tokens, 6))
    got = {
        r.threshold: (r.kept_docs, r.kept_tokens, r.doc_retention_r6, r.token_retention_r6)
        for r in REGISTRY["quality_threshold_curve"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_multimodal_features_match_bruteforce(spark):
    """multimodal_features: deterministic fake decoder's byte arithmetic
    (ascii sums, modulo dimensions) recomputed directly."""
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    expect = {}
    for doc_id, text, _, _ in _smoke_docs():
        bs = sum(ord(c) for c in text)
        nb = len(text.encode())
        expect[doc_id] = (nb, bs, bs % 1920, nb % 1080)
    got = {
        r.doc_id: (r.n_bytes, r.byte_sum, r.fake_width, r.fake_height)
        for r in REGISTRY["multimodal_features"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_multimodal_bytes_matches_bruteforce(spark):
    """multimodal_bytes: per-source payload byte totals."""
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    n, total = Counter(), Counter()
    for _, text, _, source in _smoke_docs():
        n[source] += 1
        total[source] += len(text.encode())
    expect = {src: (n[src], total[src]) for src in n}
    got = {
        r.source: (r.n_docs, r.total_bytes)
        for r in REGISTRY["multimodal_bytes"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_small_order_revenue_matches_bruteforce(spark):
    """sql_small_order_revenue (Q17 shape): the 5*q*cnt < sum(q) integer
    algebraization and cents accounting recomputed with Python ints."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    li = con.sql(
        f"SELECT l_partkey, l_quantity, l_extendedprice FROM "
        f"read_parquet('{SF_SMOKE}/lineitem.parquet')"
    ).fetchall()
    brands = {
        r[0]: r[1]
        for r in con.sql(
            f"SELECT p_partkey, p_brand FROM read_parquet('{SF_SMOKE}/part.parquet')"
        ).fetchall()
    }
    con.close()
    per_part = defaultdict(lambda: [0, 0])  # sum q, count
    for pk, q, _ in li:
        per_part[pk][0] += int(q)
        per_part[pk][1] += 1
    n_small, cents = 0, 0
    for pk, q, p in li:
        if brands.get(pk) in ("Brand#1", "Brand#2"):
            sq, cnt = per_part[pk]
            if 5 * int(q) * cnt < sq:
                n_small += 1
                cents += int(round(100 * p))
    rows = REGISTRY["sql_small_order_revenue"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_small_lines, r.revenue_cents, r.avg_yearly_cents) == (
        n_small,
        cents,
        cents // 7,
    )


def test_srp_ann_matches_bruteforce(spark):
    """sim_ann_lsh: md5-parity hyperplanes, integer quantized projections,
    4x4-bit band buckets, exact-cosine rescoring — full numpy/hashlib
    replica of the banded pipeline (candidate set included)."""
    import hashlib
    import math

    import numpy as np

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_embeddings()
    vecs = {vid: np.asarray(v, dtype=np.float64) for vid, _, v in rows}
    norms = {vid: float(np.sqrt(v @ v)) for vid, v in vecs.items()}
    signs = [
        [
            1 if int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:15], 16) & 1 else -1
            for d in range(64)
        ]
        for p in range(16)
    ]

    def half_away(v):
        return math.floor(v + 0.5) if v >= 0 else -math.floor(-v + 0.5)

    sig = {}
    for vid, v in vecs.items():
        qi = [half_away(float(x) * 1_000_000) for x in v]
        s = 0
        for p in range(16):
            if sum(q * sgn for q, sgn in zip(qi, signs[p])) >= 0:
                s |= 1 << p
        sig[vid] = s
    buckets = {}
    for vid, s in sig.items():
        for band in range(4):
            buckets.setdefault((band, (s >> (4 * band)) & 0xF), []).append(vid)
    cands = set()
    for members in buckets.values():
        qs = [v for v in members if v < 10]
        for q in qs:
            for c in members:
                if c != q:
                    cands.add((q, c))
    per_q = {}
    for q, c in cands:
        cos = round(float(vecs[q] @ vecs[c]) / (norms[q] * norms[c]), 6)
        per_q.setdefault(q, []).append((-cos, c))
    expect = set()
    for q, scored in per_q.items():
        scored.sort()
        for rank, (neg, c) in enumerate(scored[:5], start=1):
            expect.add((q, c, -neg, rank))
    got = {
        (r.query_id, r.neighbor_id, r.cosine, r.rank)
        for r in REGISTRY["sim_ann_lsh"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_ivf_ann_matches_bruteforce(spark):
    """sim_ann_ivf: nearest-centroid inverted file (vec_id%100 centroids),
    2-probe queries, in-bucket exact rescoring — numpy replica."""
    import numpy as np

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_embeddings()
    vecs = {vid: np.asarray(v, dtype=np.float64) for vid, _, v in rows}
    norms = {vid: float(np.sqrt(v @ v)) for vid, v in vecs.items()}
    cents = [vid for vid in vecs if vid % 100 == 0]

    def ranked_cents(vid):
        return sorted(
            (
                (-round(float(vecs[vid] @ vecs[c]) / (norms[vid] * norms[c]), 6), c)
                for c in cents
            )
        )

    inv = {}
    for vid in vecs:
        cid = ranked_cents(vid)[0][1]
        inv.setdefault(cid, []).append(vid)
    expect = set()
    for q in [v for v in vecs if v < 10]:
        cand = set()
        for _, cid in ranked_cents(q)[:2]:
            cand.update(inv.get(cid, []))
        cand.discard(q)
        scored = sorted(
            (
                (-round(float(vecs[q] @ vecs[c]) / (norms[q] * norms[c]), 6), c)
                for c in cand
            )
        )
        for rank, (neg, c) in enumerate(scored[:5], start=1):
            expect.add((q, c, -neg, rank))
    got = {
        (r.query_id, r.neighbor_id, r.cosine, r.rank)
        for r in REGISTRY["sim_ann_ivf"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_scalar_subquery_matches_bruteforce(spark):
    """sql_scalar_subquery: parts priced > 1.05x their brand average."""
    from collections import Counter, defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT p_brand, p_retailprice FROM read_parquet('{SF_SMOKE}/part.parquet')"
    ).fetchall()
    con.close()
    by_brand = defaultdict(list)
    for brand, price in rows:
        by_brand[brand].append(price)
    expect = Counter()
    for brand, prices in by_brand.items():
        avg = sum(prices) / len(prices)
        n = sum(1 for p in prices if p > 1.05 * avg)
        if n:
            expect[brand] = n
    got = {
        r.p_brand: r.n_above
        for r in REGISTRY["sql_scalar_subquery"].fn(spark, SF_SMOKE).collect()
    }
    assert got == dict(expect)


def test_lateral_topn_matches_bruteforce(spark):
    """sql_lateral_topn: top-2 nations by customer count per region."""
    from collections import Counter

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    cust = con.sql(
        f"SELECT c_nationkey FROM read_parquet('{SF_SMOKE}/customer.parquet')"
    ).fetchall()
    nations = con.sql(
        f"SELECT n_nationkey, n_name, n_regionkey FROM "
        f"read_parquet('{SF_SMOKE}/nation.parquet')"
    ).fetchall()
    regions = dict(
        con.sql(
            f"SELECT r_regionkey, r_name FROM read_parquet('{SF_SMOKE}/region.parquet')"
        ).fetchall()
    )
    con.close()
    counts = Counter(nk for (nk,) in cust)
    per_region = {}
    for nk, name, rk in nations:
        per_region.setdefault(rk, []).append((-counts.get(nk, 0), name))
    expect = set()
    for rk, members in per_region.items():
        members.sort()
        for rnk, (negc, name) in enumerate(members[:2], start=1):
            if -negc > 0 or True:
                expect.add((regions[rk], name, -negc, rnk))
    got = {
        (r.r_name, r.n_name, r.n_customers, r.rnk)
        for r in REGISTRY["sql_lateral_topn"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_inactive_high_balance_matches_bruteforce(spark):
    """sql_inactive_high_balance (Q22 shape): bal*n > sum integer gate +
    no-recent-orders anti-join, per-nation rollup."""
    from collections import defaultdict
    from datetime import datetime

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    cust = con.sql(
        f"SELECT c_custkey, c_acctbal, c_nationkey FROM "
        f"read_parquet('{SF_SMOKE}/customer.parquet')"
    ).fetchall()
    nation = dict(
        con.sql(
            f"SELECT n_nationkey, n_name FROM read_parquet('{SF_SMOKE}/nation.parquet')"
        ).fetchall()
    )
    recent = {
        r[0]
        for r in con.sql(
            f"SELECT DISTINCT o_custkey FROM read_parquet('{SF_SMOKE}/orders.parquet') "
            f"WHERE o_orderdate >= TIMESTAMP '2001-01-01'"
        ).fetchall()
    }
    con.close()
    cents = lambda b: int(round(100 * b))  # noqa: E731
    pos = [cents(b) for _, b, _ in cust if b > 0]
    s, n = sum(pos), len(pos)
    agg = defaultdict(lambda: [0, 0])
    for ck, b, nk in cust:
        if cents(b) * n > s and ck not in recent:
            agg[nation[nk]][0] += 1
            agg[nation[nk]][1] += cents(b)
    expect = {k: tuple(v) for k, v in agg.items()}
    got = {
        r.n_name: (r.n_cust, r.total_acctbal_cents)
        for r in REGISTRY["sql_inactive_high_balance"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_returned_items_match_bruteforce(spark):
    """sql_returned_items (Q10 shape): half-year returned-revenue top-20
    with integer e4 accounting and the (revenue desc, custkey asc) cut."""
    import math
    from collections import defaultdict
    from datetime import datetime

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    li = con.sql(
        f"SELECT l_orderkey, l_extendedprice, l_discount FROM "
        f"read_parquet('{SF_SMOKE}/lineitem.parquet') WHERE l_returnflag = 'R'"
    ).fetchall()
    orders = con.sql(
        f"SELECT o_orderkey, o_custkey FROM read_parquet('{SF_SMOKE}/orders.parquet') "
        f"WHERE o_orderdate >= TIMESTAMP '1997-01-01' "
        f"AND o_orderdate < TIMESTAMP '1997-07-01'"
    ).fetchall()
    cust = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            f"SELECT c_custkey, c_name, c_nationkey FROM "
            f"read_parquet('{SF_SMOKE}/customer.parquet')"
        ).fetchall()
    }
    nation = dict(
        con.sql(
            f"SELECT n_nationkey, n_name FROM read_parquet('{SF_SMOKE}/nation.parquet')"
        ).fetchall()
    )
    con.close()
    by_order = dict(orders)
    agg = defaultdict(lambda: [0, 0])
    for ok, p, d in li:
        if ok in by_order:
            ck = by_order[ok]
            name, nk = cust[ck]
            v = p * (1 - d) * 10000
            agg[(ck, name, nation[nk])][0] += 1
            agg[(ck, name, nation[nk])][1] += math.floor(v + 0.5)
    ranked = sorted(agg.items(), key=lambda kv: (-kv[1][1], kv[0][0]))[:20]
    expect = {k: tuple(v) for k, v in ranked}
    got = {
        (r.c_custkey, r.c_name, r.n_name): (r.n_lines, r.revenue_e4)
        for r in REGISTRY["sql_returned_items"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_recursive_calendar_matches_bruteforce(spark):
    """sql_recursive_calendar: 1995-01..2001-12 month spine with
    zero-filled integer-cents monthly rollups."""
    from collections import defaultdict
    from datetime import date

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    orders = con.sql(
        f"SELECT o_orderdate, o_totalprice FROM "
        f"read_parquet('{SF_SMOKE}/orders.parquet')"
    ).fetchall()
    con.close()
    agg = defaultdict(lambda: [0, 0])
    for dt, tp in orders:
        m = date(dt.year, dt.month, 1)
        agg[m][0] += 1
        agg[m][1] += int(round(100 * tp))
    expect = {}
    y, m = 1995, 1
    while (y, m) <= (2001, 12):
        d = date(y, m, 1)
        expect[d] = tuple(agg.get(d, [0, 0]))
        m += 1
        if m == 13:
            y, m = y + 1, 1
    got = {
        r.month: (r.n_orders, r.revenue_cents)
        for r in REGISTRY["sql_recursive_calendar"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_having_semijoin_matches_bruteforce(spark):
    """sql_having_semijoin (Q18 shape): orders with > 250 total quantity,
    re-aggregated with the customer dim."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    li = con.sql(
        f"SELECT l_orderkey, l_quantity FROM read_parquet('{SF_SMOKE}/lineitem.parquet')"
    ).fetchall()
    orders = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            f"SELECT o_orderkey, o_custkey, o_totalprice FROM "
            f"read_parquet('{SF_SMOKE}/orders.parquet')"
        ).fetchall()
    }
    cust = dict(
        con.sql(
            f"SELECT c_custkey, c_name FROM read_parquet('{SF_SMOKE}/customer.parquet')"
        ).fetchall()
    )
    con.close()
    qty = defaultdict(float)
    for ok, q in li:
        qty[ok] += q
    expect = {}
    for ok, total_q in qty.items():
        if total_q > 250 and ok in orders:
            ck, tp = orders[ok]
            expect[(cust[ck], ok)] = (round(tp, 2), round(total_q, 2))
    got = {
        (r.c_name, r.o_orderkey): (r.total_price, r.sum_qty)
        for r in REGISTRY["sql_having_semijoin"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def _q21_waiting_counts():
    """Shared Q21-shape replica for sql_exists_not_exists and its
    hand-optimized rewrite sql_sole_supplier_rewrite."""
    from collections import Counter, defaultdict

    import duckdb

    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    li = con.sql(
        f"SELECT l_orderkey, l_suppkey, l_returnflag FROM "
        f"read_parquet('{SF_SMOKE}/lineitem.parquet')"
    ).fetchall()
    fstatus = {
        r[0]
        for r in con.sql(
            f"SELECT o_orderkey FROM read_parquet('{SF_SMOKE}/orders.parquet') "
            f"WHERE o_orderstatus = 'F'"
        ).fetchall()
    }
    supp = dict(
        con.sql(
            f"SELECT s_suppkey, s_name FROM read_parquet('{SF_SMOKE}/supplier.parquet')"
        ).fetchall()
    )
    con.close()
    by_order = defaultdict(list)
    for ok, sk, rf in li:
        by_order[ok].append((sk, rf))
    counts = Counter()
    for ok, lines in by_order.items():
        if ok not in fstatus:
            continue
        supps = {sk for sk, _ in lines}
        r_supps = {sk for sk, rf in lines if rf == "R"}
        for sk, rf in lines:
            if rf != "R":
                continue
            if supps - {sk} and not (r_supps - {sk}):
                counts[supp[sk]] += 1
    return dict(counts)


def test_exists_not_exists_matches_bruteforce(spark):
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    expect = _q21_waiting_counts()
    got = {
        r.s_name: r.numwait
        for r in REGISTRY["sql_exists_not_exists"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_sole_supplier_rewrite_matches_bruteforce(spark):
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    expect = _q21_waiting_counts()
    got = {
        r.s_name: r.numwait
        for r in REGISTRY["sql_sole_supplier_rewrite"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_local_supplier_volume_matches_bruteforce(spark):
    """sql_local_supplier_volume (Q5 shape): ASIA-local supplier revenue
    per nation in integer e4 units."""
    import math
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    li = con.sql(
        f"SELECT l_orderkey, l_suppkey, l_extendedprice, l_discount FROM "
        f"read_parquet('{SF_SMOKE}/lineitem.parquet')"
    ).fetchall()
    orders = {
        r[0]: r[1]
        for r in con.sql(
            f"SELECT o_orderkey, o_custkey FROM read_parquet('{SF_SMOKE}/orders.parquet') "
            f"WHERE o_orderdate >= TIMESTAMP '1996-01-01' "
            f"AND o_orderdate < TIMESTAMP '1998-01-01'"
        ).fetchall()
    }
    cust_nation = dict(
        con.sql(
            f"SELECT c_custkey, c_nationkey FROM read_parquet('{SF_SMOKE}/customer.parquet')"
        ).fetchall()
    )
    supp_nation = dict(
        con.sql(
            f"SELECT s_suppkey, s_nationkey FROM read_parquet('{SF_SMOKE}/supplier.parquet')"
        ).fetchall()
    )
    nations = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            f"SELECT n_nationkey, n_name, n_regionkey FROM "
            f"read_parquet('{SF_SMOKE}/nation.parquet')"
        ).fetchall()
    }
    asia = {
        r[0]
        for r in con.sql(
            f"SELECT r_regionkey FROM read_parquet('{SF_SMOKE}/region.parquet') "
            f"WHERE r_name = 'ASIA'"
        ).fetchall()
    }
    con.close()
    agg = defaultdict(lambda: [0, 0])
    for ok, sk, p, d in li:
        ck = orders.get(ok)
        if ck is None:
            continue
        nk = cust_nation[ck]
        name, rk = nations[nk]
        if rk in asia and supp_nation[sk] == nk:
            v = p * (1 - d) * 10000
            agg[name][0] += 1
            agg[name][1] += math.floor(v + 0.5)
    expect = {k: tuple(v) for k, v in agg.items()}
    got = {
        r.n_name: (r.n_lines, r.revenue_e4)
        for r in REGISTRY["sql_local_supplier_volume"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_volume_shipping_matches_bruteforce(spark):
    """sql_volume_shipping (Q7 shape): nation-pair shipping revenue per
    ship year, fsum replica."""
    import math
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    li = con.sql(
        f"SELECT l_orderkey, l_suppkey, l_shipdate, l_extendedprice, l_discount "
        f"FROM read_parquet('{SF_SMOKE}/lineitem.parquet')"
    ).fetchall()
    orders = dict(
        con.sql(
            f"SELECT o_orderkey, o_custkey FROM read_parquet('{SF_SMOKE}/orders.parquet')"
        ).fetchall()
    )
    cust_nation = dict(
        con.sql(
            f"SELECT c_custkey, c_nationkey FROM read_parquet('{SF_SMOKE}/customer.parquet')"
        ).fetchall()
    )
    supp_nation = dict(
        con.sql(
            f"SELECT s_suppkey, s_nationkey FROM read_parquet('{SF_SMOKE}/supplier.parquet')"
        ).fetchall()
    )
    nname = dict(
        con.sql(
            f"SELECT n_nationkey, n_name FROM read_parquet('{SF_SMOKE}/nation.parquet')"
        ).fetchall()
    )
    con.close()
    groups = defaultdict(list)
    for ok, sk, sd, p, d in li:
        sn = nname[supp_nation[sk]]
        cn = nname[cust_nation[orders[ok]]]
        if (sn, cn) in (("NATION_1", "NATION_2"), ("NATION_2", "NATION_1")):
            groups[(sn, cn, sd.year)].append(p * (1 - d))
    expect = {
        k: (round(math.fsum(v), 4), len(v)) for k, v in groups.items()
    }
    got = {
        (r.supp_nation, r.cust_nation, r.l_year): (r.revenue, r.n_items)
        for r in REGISTRY["sql_volume_shipping"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_ship_priority_matches_bruteforce(spark):
    """agg_ship_priority (Q3 shape): BUILDING-segment pre-ship revenue
    top-10 under (rounded revenue desc, orderkey asc)."""
    import math
    from collections import defaultdict
    from datetime import datetime

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    cutoff = datetime(1997, 3, 15)
    con = duckdb.connect()
    li = con.sql(
        f"SELECT l_orderkey, l_shipdate, l_extendedprice, l_discount FROM "
        f"read_parquet('{SF_SMOKE}/lineitem.parquet')"
    ).fetchall()
    orders = {
        r[0]: (r[1], r[2], r[3])
        for r in con.sql(
            f"SELECT o_orderkey, o_custkey, o_orderdate, o_orderpriority FROM "
            f"read_parquet('{SF_SMOKE}/orders.parquet')"
        ).fetchall()
    }
    building = {
        r[0]
        for r in con.sql(
            f"SELECT c_custkey FROM read_parquet('{SF_SMOKE}/customer.parquet') "
            f"WHERE c_mktsegment = 'BUILDING'"
        ).fetchall()
    }
    con.close()
    groups = defaultdict(list)
    for ok, sd, p, d in li:
        if sd <= cutoff or ok not in orders:
            continue
        ck, od, prio = orders[ok]
        if ck in building and od < cutoff:
            groups[(ok, od, prio)].append(p * (1 - d))
    ranked = sorted(
        ((round(math.fsum(v), 4), k) for k, v in groups.items()),
        key=lambda rv: (-rv[0], rv[1][0]),
    )[:10]
    expect = {k: rev for rev, k in ranked}
    got = {
        (r.l_orderkey, r.o_orderdate, r.o_orderpriority): r.revenue
        for r in REGISTRY["agg_ship_priority"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_disjunctive_join_matches_bruteforce(spark):
    """sql_disjunctive_join (Q19 shape): the OR-of-ANDs predicate over
    brand/size/type x quantity, per-brand revenue."""
    import math
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    li = con.sql(
        f"SELECT l_partkey, l_quantity, l_extendedprice, l_discount FROM "
        f"read_parquet('{SF_SMOKE}/lineitem.parquet')"
    ).fetchall()
    parts = {
        r[0]: (r[1], r[2], r[3])
        for r in con.sql(
            f"SELECT p_partkey, p_brand, p_size, p_type FROM "
            f"read_parquet('{SF_SMOKE}/part.parquet')"
        ).fetchall()
    }
    con.close()
    groups = defaultdict(list)
    for pk, q, p, d in li:
        brand, size, ptype = parts[pk]
        ok = (
            (brand == "Brand#11" and 1 <= size <= 15 and 1 <= q <= 20)
            or (brand == "Brand#22" and 10 <= size <= 30 and 10 <= q <= 35)
            or ("STEEL" in ptype and q >= 40)
        )
        if ok:
            groups[brand].append(p * (1 - d))
    expect = {b: (round(math.fsum(v), 4), len(v)) for b, v in groups.items()}
    got = {
        r.p_brand: (r.revenue, r.n_items)
        for r in REGISTRY["sql_disjunctive_join"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_udtf_word_chunks_matches_bruteforce(spark):
    """udtf_word_chunks: 32-token chunk windows + md5, recomputed with an
    independent slicing walk."""
    import hashlib

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    expect = {}
    for doc_id, text, _, _ in _smoke_docs():
        toks = text.strip().lower().split()
        for i in range(0, len(toks), 32):
            piece = toks[i : i + 32]
            expect[(doc_id, i // 32)] = (
                len(piece),
                hashlib.md5(" ".join(piece).encode()).hexdigest(),
            )
    got = {
        (r.doc_id, r.chunk_idx): (r.n_tokens, r.chunk_md5)
        for r in REGISTRY["udtf_word_chunks"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def _smoke_table(table, cols):
    import duckdb

    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT {', '.join(cols)} FROM read_parquet('{SF_SMOKE}/{table}.parquet')"
    ).fetchall()
    con.close()
    return rows


def test_region_revenue_matches_bruteforce(spark):
    """agg_region_revenue (Q5 shape, float variant): ASIA local-supplier
    revenue per nation, fsum replica."""
    import math
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    orders = dict(_smoke_table("orders", ["o_orderkey", "o_custkey"]))
    cust_nation = dict(_smoke_table("customer", ["c_custkey", "c_nationkey"]))
    supp_nation = dict(_smoke_table("supplier", ["s_suppkey", "s_nationkey"]))
    nations = {
        nk: (name, rk)
        for nk, name, rk in _smoke_table(
            "nation", ["n_nationkey", "n_name", "n_regionkey"]
        )
    }
    asia = {
        rk
        for rk, rn in _smoke_table("region", ["r_regionkey", "r_name"])
        if rn == "ASIA"
    }
    groups = defaultdict(list)
    for ok, sk, p, d in _smoke_table(
        "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ):
        nk = cust_nation[orders[ok]]
        name, rk = nations[nk]
        if rk in asia and supp_nation[sk] == nk:
            groups[name].append(p * (1 - d))
    expect = {k: (round(math.fsum(v), 4), len(v)) for k, v in groups.items()}
    got = {
        r.nation: (r.revenue, r.n_items)
        for r in REGISTRY["agg_region_revenue"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_rollup_matches_bruteforce(spark):
    """agg_rollup: (region, nation) / (region) / () levels recomputed."""
    import math
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    nations = {
        nk: (name, rk)
        for nk, name, rk in _smoke_table(
            "nation", ["n_nationkey", "n_name", "n_regionkey"]
        )
    }
    regions = dict(_smoke_table("region", ["r_regionkey", "r_name"]))
    rows = []
    for _, bal, nk in _smoke_table("customer", ["c_custkey", "c_acctbal", "c_nationkey"]):
        name, rk = nations[nk]
        rows.append((regions[rk], name, bal))
    levels = defaultdict(list)
    for rn, nn, bal in rows:
        levels[(rn, nn)].append(bal)
        levels[(rn, None)].append(bal)
        levels[(None, None)].append(bal)
    expect = {
        k: (round(math.fsum(v), 2), len(v)) for k, v in levels.items()
    }
    got = {
        (r.r_name, r.n_name): (r.total_bal, r.n_customers)
        for r in REGISTRY["agg_rollup"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_cube_matches_bruteforce(spark):
    """agg_cube: all four (flag, status) grouping levels recomputed."""
    import math
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    levels = defaultdict(list)
    for flag, st, q in _smoke_table(
        "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"]
    ):
        for key in ((flag, st), (flag, None), (None, st), (None, None)):
            levels[key].append(q)
    expect = {k: (round(math.fsum(v), 2), len(v)) for k, v in levels.items()}
    got = {
        (r.l_returnflag, r.l_linestatus): (r.sum_qty, r.n_items)
        for r in REGISTRY["agg_cube"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_grouping_sets_matches_bruteforce(spark):
    """agg_grouping_sets: (priority) / (status) / () sets recomputed."""
    import math
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    levels = defaultdict(list)
    for prio, st, tp in _smoke_table(
        "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"]
    ):
        levels[(prio, None)].append(tp)
        levels[(None, st)].append(tp)
        levels[(None, None)].append(tp)
    expect = {k: (round(math.fsum(v), 2), len(v)) for k, v in levels.items()}
    got = {
        (r.o_orderpriority, r.o_orderstatus): (r.total, r.n)
        for r in REGISTRY["agg_grouping_sets"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_count_distinct_matches_bruteforce(spark):
    """agg_count_distinct: per-segment distinct nations / counts / sums."""
    import math
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    seg = defaultdict(lambda: (set(), []))
    for mk, nk, bal in _smoke_table(
        "customer", ["c_mktsegment", "c_nationkey", "c_acctbal"]
    ):
        seg[mk][0].add(nk)
        seg[mk][1].append(bal)
    expect = {
        mk: (len(nks), len(bals), round(math.fsum(bals), 2))
        for mk, (nks, bals) in seg.items()
    }
    got = {
        r.c_mktsegment: (r.n_nations, r.n_customers, r.total_bal)
        for r in REGISTRY["agg_count_distinct"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_agg_daily_matches_bruteforce(spark):
    """agg_daily: calendar-day buckets with counts/sums/distinct users."""
    import math
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    days = defaultdict(lambda: ([], set()))
    for ts, v, u in _smoke_table("events", ["ts", "value", "user_id"]):
        day = ts.replace(hour=0, minute=0, second=0, microsecond=0)
        days[day][0].append(v)
        days[day][1].add(u)
    expect = {
        d: (len(vs), round(math.fsum(vs), 2), len(us))
        for d, (vs, us) in days.items()
    }
    got = {
        r.day: (r.n_events, r.total_value, r.n_users)
        for r in REGISTRY["agg_daily"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_topk_per_group_matches_bruteforce(spark):
    """topk_per_group: top-3 orders per segment under
    (totalprice desc, orderkey asc)."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    seg_of = dict(_smoke_table("customer", ["c_custkey", "c_mktsegment"]))
    per_seg = defaultdict(list)
    for ok, ck, tp in _smoke_table("orders", ["o_orderkey", "o_custkey", "o_totalprice"]):
        per_seg[seg_of[ck]].append((-tp, ok))
    expect = {}
    for mk, members in per_seg.items():
        members.sort()
        for rn, (ntp, ok) in enumerate(members[:3], start=1):
            expect[(mk, ok)] = (-ntp, rn)
    got = {
        (r.c_mktsegment, r.o_orderkey): (r.o_totalprice, r.rn)
        for r in REGISTRY["topk_per_group"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_pivot_counts_match_bruteforce(spark):
    """pivot_event_counts: per-day per-type counts in static columns."""
    from collections import Counter, defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    days = defaultdict(Counter)
    for ts, et in _smoke_table("events", ["ts", "event_type"]):
        days[ts.replace(hour=0, minute=0, second=0, microsecond=0)][et] += 1
    types = ["click", "error", "purchase", "signup", "view"]
    expect = {d: tuple(c.get(t, 0) for t in types) for d, c in days.items()}
    got = {
        r.day: (r.click, r.error, r.purchase, r.signup, r.view)
        for r in REGISTRY["pivot_event_counts"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_running_sum_matches_bruteforce(spark):
    """window_running_sum: per-supplier RANGE-frame running revenue —
    shipdate peers share the running value."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    per_supp = defaultdict(list)
    for sk, ok, ln, sd, p, d in _smoke_table(
        "lineitem",
        [
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            "l_shipdate",
            "l_extendedprice",
            "l_discount",
        ],
    ):
        per_supp[sk].append((sd, ok, ln, p * (1 - d)))
    expect = {}
    for sk, rows in per_supp.items():
        rows.sort(key=lambda t: t[0])
        i, cum = 0, 0.0
        while i < len(rows):
            j = i
            while j < len(rows) and rows[j][0] == rows[i][0]:
                cum += rows[j][3]
                j += 1
            for sd, ok, ln, rev in rows[i:j]:
                expect[(sk, ok, ln)] = (sd, round(rev, 4), round(cum, 4))
            i = j
    got = {
        (r.l_suppkey, r.l_orderkey, r.l_linenumber): (
            r.l_shipdate,
            r.rev,
            r.running_rev,
        )
        for r in REGISTRY["window_running_sum"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_lag_lead_matches_bruteforce(spark):
    """window_lag_lead: per-customer prev/next totals and sequence under
    the (date, key) tie-broken order."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    per_cust = defaultdict(list)
    for ck, ok, dt, tp in _smoke_table(
        "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]
    ):
        per_cust[ck].append((dt, ok, tp))
    expect = {}
    for ck, rows in per_cust.items():
        rows.sort()
        for i, (dt, ok, tp) in enumerate(rows):
            expect[(ck, ok)] = (
                dt,
                tp,
                rows[i - 1][2] if i > 0 else None,
                rows[i + 1][2] if i + 1 < len(rows) else None,
                i + 1,
            )
    got = {
        (r.o_custkey, r.o_orderkey): (
            r.o_orderdate,
            r.o_totalprice,
            r.prev_total,
            r.next_total,
            r.order_seq,
        )
        for r in REGISTRY["window_lag_lead"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_sort_limit_matches_bruteforce(spark):
    """sort_limit_global: global top-20 orders by (price desc, key asc)."""
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    expect = sorted(rows, key=lambda r: (-r[2], r[0]))[:20]
    got = [
        (r.o_orderkey, r.o_custkey, r.o_totalprice)
        for r in REGISTRY["sort_limit_global"].fn(spark, SF_SMOKE).collect()
    ]
    assert sorted(got, key=lambda r: (-r[2], r[0])) == expect


def test_window_tumbling_matches_bruteforce(spark):
    """window_tumbling: 1-hour buckets with counts/sums/distinct users."""
    import math
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    buckets = defaultdict(lambda: ([], set()))
    for ts, v, u in _smoke_table("events", ["ts", "value", "user_id"]):
        h = ts.replace(minute=0, second=0, microsecond=0)
        buckets[h][0].append(v)
        buckets[h][1].add(u)
    expect = {
        h: (len(vs), round(math.fsum(vs), 2), len(us))
        for h, (vs, us) in buckets.items()
    }
    got = {
        r.w_start: (r.n_events, r.total_value, r.n_users)
        for r in REGISTRY["window_tumbling"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_window_sliding_matches_bruteforce(spark):
    """window_sliding: 1-hour windows sliding by 30 minutes — every event
    lands in exactly two windows."""
    import math
    from collections import defaultdict
    from datetime import timedelta

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    buckets = defaultdict(list)
    for ts, v in _smoke_table("events", ["ts", "value"]):
        half = ts.replace(minute=(ts.minute // 30) * 30, second=0, microsecond=0)
        buckets[half].append(v)
        buckets[half - timedelta(minutes=30)].append(v)
    expect = {
        w: (len(vs), round(math.fsum(vs), 2)) for w, vs in buckets.items()
    }
    got = {
        r.w_start: (r.n_events, r.total_value)
        for r in REGISTRY["window_sliding"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_exists_cte_matches_bruteforce(spark):
    """sql_exists_cte: late-shipping orders (> 60 days) per priority."""
    from collections import Counter
    from datetime import timedelta

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    orders = {
        ok: (dt, prio)
        for ok, dt, prio in _smoke_table(
            "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
        )
    }
    late = set()
    for ok, sd in _smoke_table("lineitem", ["l_orderkey", "l_shipdate"]):
        if ok in orders and sd > orders[ok][0] + timedelta(days=60):
            late.add(ok)
    expect = Counter(orders[ok][1] for ok in late)
    got = {
        r.o_orderpriority: r.n_late_orders
        for r in REGISTRY["sql_exists_cte"].fn(spark, SF_SMOKE).collect()
    }
    assert got == dict(expect)


def test_cms_heavy_hitters_match_bruteforce(spark):
    """sketch_cms_heavy_hitters: d=4 x w=64 md5 Count-Min recomputed with
    hashlib — estimates must equal the replica AND dominate true counts
    (the CMS guarantee) for every user, not just the reported top-10."""
    import hashlib
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    users = [u for (u,) in _smoke_table("events", ["user_id"])]
    truth = Counter(users)

    def bucket(i, u):
        return int(hashlib.md5(f"{i}:{u}".encode()).hexdigest()[:8], 16) % 64

    cms = Counter()
    for u in users:
        for i in range(4):
            cms[(i, bucket(i, u))] += 1
    est = {u: min(cms[(i, bucket(i, u))] for i in range(4)) for u in truth}
    for u, n in truth.items():
        assert est[u] >= n  # CMS never undercounts
    top = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    expect = {u: (n, est[u], est[u] - n) for u, n in top}
    got = {
        r.user_id: (r.n_true, r.n_est, r.overcount)
        for r in REGISTRY["sketch_cms_heavy_hitters"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_split_leak_audit_matches_bruteforce(spark):
    """dq_split_leak_audit: near-dup pair split matrix recomputed from the
    shingle-set pairs + hashlib md5 split buckets."""
    import hashlib
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    def label(doc_id):
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[:4]
        return "train" if h < "cccc" else ("valid" if h < "e666" else "test")

    sets = _shingle_sets()
    ids = sorted(sets)
    cells = Counter()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter and inter / len(sets[a] | sets[b]) >= 0.5:
                sa, sb = label(a), label(b)
                cells[(min(sa, sb), max(sa, sb), int(sa != sb))] += 1
    expect = {(lo, hi): (n, x) for (lo, hi, x), n in cells.items()}
    got = {
        (r.split_lo, r.split_hi): (r.n_pairs, r.is_cross)
        for r in REGISTRY["dq_split_leak_audit"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_weighted_reservoir_matches_bruteforce(spark):
    """sample_weighted_reservoir: the Efraimidis-Spirakis draw recomputed
    with hashlib/math — u = (md5 bucket + 0.5)/65536, key = u**(1/w),
    round-6-then-rank (key desc, doc_id asc), top 20. The whole sample
    identity, not just its size, must match."""
    import hashlib
    import math

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["doc_id", "lang", "n_chars"])
    keyed = []
    for doc_id, lang, n_chars in rows:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)
        u = (h + 0.5) / 65536.0
        es = round(math.pow(u, 1.0 / n_chars), 6)
        keyed.append((-es, doc_id, lang, n_chars))
    keyed.sort()
    expect = {
        (doc_id, lang, n_chars, -neg, rank)
        for rank, (neg, doc_id, lang, n_chars) in enumerate(keyed[:20], start=1)
    }
    got = {
        (r.doc_id, r.lang, r.n_chars, r.es_key, r.rank)
        for r in REGISTRY["sample_weighted_reservoir"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_dp_laplace_release_matches_bruteforce(spark):
    """dp_laplace_release: inverse-CDF Laplace noise recomputed with
    hashlib/math per language; released count = max(0, floor(n+noise+0.5))
    exactly."""
    import hashlib
    import math
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    truth = Counter(lang for (lang,) in _smoke_table("documents", ["lang"]))
    expect = {}
    for lang, n in truth.items():
        h = int(hashlib.md5(f"{lang}:laplace".encode()).hexdigest()[:4], 16)
        u = (h + 0.5) / 65536.0
        c = u - 0.5
        noise = -math.copysign(1.0, c) * math.log(1.0 - 2.0 * abs(c))
        expect[lang] = (n, round(noise, 6), max(0, math.floor(n + noise + 0.5)))
    got = {
        r.lang: (r.n_docs, r.noise, r.n_released)
        for r in REGISTRY["dp_laplace_release"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect
    # the mechanism's noise really is Laplace-shaped around zero: both
    # signs occur across the fixture's 5 languages (verified offline for
    # the fixed md5 draw; sanity, not a distribution test)
    signs = {n > 0 for _, n, _ in expect.values()}
    assert signs == {True, False}


def test_hard_negatives_match_bruteforce(spark):
    """sim_hard_negatives: numpy all-pairs cosine restricted to
    label-mismatched candidates, round-6-then-rank, top 3 per query."""
    import numpy as np

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_embeddings()
    vecs = {vid: np.asarray(v, dtype=np.float64) for vid, _, v in rows}
    labels = {vid: lab for vid, lab, _ in rows}
    norms = {vid: float(np.sqrt(v @ v)) for vid, v in vecs.items()}
    expect = set()
    for q in [v for v in vecs if v < 10]:
        scored = sorted(
            (-round(float(vecs[q] @ vecs[c]) / (norms[q] * norms[c]), 6), c)
            for c in vecs
            if c != q and labels[c] != labels[q]
        )
        for rank, (neg, c) in enumerate(scored[:3], start=1):
            expect.add((q, labels[q], c, labels[c], -neg, rank))
    got = {
        (r.query_id, r.query_label, r.neighbor_id, r.neighbor_label, r.cosine, r.rank)
        for r in REGISTRY["sim_hard_negatives"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect
    # every reported negative really crosses the label boundary
    assert all(ql != nl for _, ql, _, nl, _, _ in got)


def test_pack_length_buckets_matches_bruteforce(spark):
    """pack_length_buckets: whitespace token counts + the power-of-two
    ladder recomputed in plain Python; padded/waste arithmetic exact."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.operators.packing import POW2_BUCKETS
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    per_bucket = defaultdict(lambda: [0, 0])
    for (text,) in _smoke_table("documents", ["text"]):
        n = len(text.split()) if text.strip() else 0
        b = next((x for x in POW2_BUCKETS if n <= x), POW2_BUCKETS[-1])
        per_bucket[b][0] += 1
        per_bucket[b][1] += n
    expect = {
        b: (nd, st, b * nd, b * nd - st) for b, (nd, st) in per_bucket.items()
    }
    got = {
        r.bucket_len: (r.n_docs, r.sum_tokens, r.padded_tokens, r.padding_waste)
        for r in REGISTRY["pack_length_buckets"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_shard_balance_audit_matches_bruteforce(spark):
    """shard_balance_audit: md5-mod-32 shard assignment and the exact
    x32 deviations recomputed with hashlib."""
    import hashlib
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    per_shard = defaultdict(lambda: [0, 0])
    for doc_id, n_chars in _smoke_table("documents", ["doc_id", "n_chars"]):
        s = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % 32
        per_shard[s][0] += 1
        per_shard[s][1] += n_chars
    total_docs = sum(v[0] for v in per_shard.values())
    total_chars = sum(v[1] for v in per_shard.values())
    expect = {
        s: (nd, sc, nd * 32 - total_docs, sc * 32 - total_chars)
        for s, (nd, sc) in per_shard.items()
    }
    got = {
        r.shard: (r.n_docs, r.sum_chars, r.docs_dev_x32, r.chars_dev_x32)
        for r in REGISTRY["shard_balance_audit"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect
    # deviations scaled by shard count sum to zero by construction
    assert sum(d for _, _, d, _ in expect.values()) == 0


def test_bloom_filter_audit_matches_bruteforce(spark):
    """dq_bloom_filter_audit: k=3 x m=1024 md5 Bloom recomputed with
    hashlib — segment table must match AND no customer may be a false
    negative (the Bloom guarantee, checked customer by customer)."""
    import hashlib
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    def positions(key):
        return [
            int(hashlib.md5(f"{i}:{key}".encode()).hexdigest()[:8], 16) % 1024
            for i in range(3)
        ]

    build = {
        ck
        for ck, prio in _smoke_table("orders", ["o_custkey", "o_orderpriority"])
        if prio == "1-URGENT"
    }
    inserted = {p for k in build for p in positions(k)}
    seg = defaultdict(lambda: [0, 0, 0, 0])
    for ck, mkt in _smoke_table("customer", ["c_custkey", "c_mktsegment"]):
        actual = ck in build
        bloom = all(p in inserted for p in positions(ck))
        assert bloom or not actual  # no false negatives, ever
        row = seg[mkt]
        row[0] += 1
        row[1] += actual
        row[2] += bloom
        row[3] += bloom and not actual
    expect = {m: tuple(v) for m, v in seg.items()}
    got = {
        r.c_mktsegment: (r.n_customers, r.n_actual, r.n_bloom_pass, r.n_false_pos)
        for r in REGISTRY["dq_bloom_filter_audit"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_source_cap_matches_bruteforce(spark):
    """curation_source_cap: per-source md5-ordered top-15 recomputed in
    plain Python, full kept-set identity."""
    import hashlib
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    by_source = defaultdict(list)
    for doc_id, source, lang, n_chars in _smoke_table(
        "documents", ["doc_id", "source", "lang", "n_chars"]
    ):
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[:4]
        by_source[source].append((h, doc_id, lang, n_chars))
    expect = set()
    for source, rows in by_source.items():
        rows.sort()
        for rn, (_, doc_id, lang, n_chars) in enumerate(rows[:15], start=1):
            expect.add((doc_id, source, lang, n_chars, rn))
    got = {
        (r.doc_id, r.source, r.lang, r.n_chars, r.rn)
        for r in REGISTRY["curation_source_cap"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_token_budget_matches_bruteforce(spark):
    """curation_token_budget: the grid+boundary distributed selection must
    equal the straight 'order by (score desc, doc_id), keep while
    cumsum <= 40% of tokens' recomputed in plain Python."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    STOP = {"the", "a", "of", "and", "to", "in", "is", "it"}
    docs = []
    for doc_id, lang, text in _smoke_table("documents", ["doc_id", "lang", "text"]):
        toks = text.lower().split() if text.strip() else []
        tok = len(toks)
        nstop = sum(1 for t in toks if t in STOP)
        score = (100 * nstop) // tok if tok > 0 else 0
        docs.append((-score, doc_id, lang, tok))
    docs.sort()
    budget = (sum(t for *_, t in docs) * 2) // 5
    per_lang = defaultdict(lambda: [0, 0])
    cum = 0
    for _, _, lang, tok in docs:
        cum += tok
        if cum > budget:
            break
        per_lang[lang][0] += 1
        per_lang[lang][1] += tok
    expect = {lang: tuple(v) for lang, v in per_lang.items()}
    got = {
        r.lang: (r.n_selected, r.tokens_selected)
        for r in REGISTRY["curation_token_budget"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_asof_tolerance_matches_bruteforce(spark):
    """join_asof_tolerance: most-recent-view-within-1h recomputed in
    plain Python (max ts, min event_id tie-break, 1h mask)."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    views = defaultdict(list)
    purchases = []
    for eid, uid, typ, ts in _smoke_table(
        "events", ["event_id", "user_id", "event_type", "ts"]
    ):
        if typ == "view":
            views[uid].append((ts, eid))
        elif typ == "purchase":
            purchases.append((eid, uid, ts))
    expect = {}
    for eid, uid, pts in purchases:
        cand = [
            (ts, vid)
            for ts, vid in views.get(uid, [])
            if ts <= pts and (pts - ts).total_seconds() <= 3600
        ]
        if cand:
            best = min(cand, key=lambda tv: (-tv[0].timestamp(), tv[1]))
            gap = int((pts - best[0]).total_seconds() * 1_000_000)
            expect[eid] = (uid, best[1], gap)
        else:
            expect[eid] = (uid, None, None)
    got = {
        r.purchase_id: (r.user_id, r.view_id, r.gap_us)
        for r in REGISTRY["join_asof_tolerance"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_global_ids_dense_and_ordered(spark):
    """ids_global_stable: the pid-window rewrite must reproduce exactly
    1..N in doc_id order."""
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = sorted(_smoke_table("documents", ["doc_id", "lang"]))
    expect = {doc_id: (lang, gid) for gid, (doc_id, lang) in enumerate(rows, start=1)}
    got = {
        r.doc_id: (r.lang, r.gid)
        for r in REGISTRY["ids_global_stable"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_epoch_schedule_matches_bruteforce(spark):
    """epoch_shuffle_schedule: per-epoch md5 permutation heads recomputed
    with hashlib; epochs must produce DIFFERENT leading permutations."""
    import hashlib

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    ids = [d for (d,) in _smoke_table("documents", ["doc_id"])]
    expect = set()
    heads = {}
    for e in range(3):
        order = sorted(
            ids,
            key=lambda d: (
                hashlib.md5(f"{d}:{e}".encode()).hexdigest()[:8],
                d,
            ),
        )
        heads[e] = tuple(order[:5])
        for pos, d in enumerate(order[:5], start=1):
            expect.add((e, pos, d))
    assert len(set(heads.values())) == 3  # epochs genuinely reshuffle
    got = {
        (r.epoch, r.pos, r.doc_id)
        for r in REGISTRY["epoch_shuffle_schedule"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_bootstrap_ci_matches_bruteforce(spark):
    """stats_bootstrap_ci: the 32-replicate Poisson bootstrap recomputed
    with hashlib + the shared integer inverse-CDF ladder; CI must bracket
    a sane range and match exactly in integer micro-units."""
    import hashlib
    from collections import defaultdict

    from dend_spark_data_lake_spark.operators.sampling import POISSON1_THRESHOLDS
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    def mult(key):
        h = int(hashlib.md5(key.encode()).hexdigest()[:4], 16)
        for k, t in enumerate(POISSON1_THRESHOLDS):
            if h < t:
                return k
        return len(POISSON1_THRESHOLDS)

    rows = _smoke_table("documents", ["doc_id", "lang", "n_chars"])
    per = defaultdict(lambda: defaultdict(lambda: [0, 0]))  # lang -> b -> [sw, nw]
    n_docs = defaultdict(int)
    for doc_id, lang, n_chars in rows:
        n_docs[lang] += 1
        for b in range(32):
            m = mult(f"{doc_id}:{b}")
            per[lang][b][0] += m * n_chars
            per[lang][b][1] += m
    expect = {}
    for lang, reps in per.items():
        means = sorted(
            ((sw * 1_000_000) // nw, b) for b, (sw, nw) in reps.items() if nw > 0
        )
        expect[lang] = (n_docs[lang], means[1][0], means[30][0])
        assert means[1][0] <= means[30][0]
    got = {
        r.lang: (r.n_docs, r.mean_x1e6_lo, r.mean_x1e6_hi)
        for r in REGISTRY["stats_bootstrap_ci"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_compaction_plan_matches_bruteforce(spark):
    """lake_compaction_plan: next-fit bin assignment over the cumulative
    partition sizes recomputed in plain Python; bins must be contiguous
    per lang."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    sizes = defaultdict(int)
    for lang, source, n_chars in _smoke_table(
        "documents", ["lang", "source", "n_chars"]
    ):
        sizes[(lang, source)] += n_chars
    expect = {}
    by_lang = defaultdict(list)
    for (lang, source), pb in sizes.items():
        by_lang[lang].append((source, pb))
    for lang, parts in by_lang.items():
        parts.sort()
        cum = 0
        prev_bin = 0
        for source, pb in parts:
            bin_id = cum // 8192
            assert bin_id >= prev_bin  # next-fit bins never go backwards
            prev_bin = bin_id
            expect[(lang, source)] = (pb, bin_id)
            cum += pb
    got = {
        (r.lang, r.source): (r.part_bytes, r.bin_id)
        for r in REGISTRY["lake_compaction_plan"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_zonemap_audit_matches_bruteforce(spark):
    """dq_zonemap_pruning_audit: block min/max classification recomputed
    in plain Python; pruned blocks must contribute zero matches and full
    blocks must match every row."""
    import datetime
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    cutoff = datetime.date(1995, 6, 15)
    blocks = defaultdict(lambda: [None, None, 0, 0])
    for ok, sd in _smoke_table("lineitem", ["l_orderkey", "l_shipdate"]):
        if isinstance(sd, datetime.datetime):
            sd = sd.date()
        b = blocks[ok // 4000]
        b[0] = sd if b[0] is None else min(b[0], sd)
        b[1] = sd if b[1] is None else max(b[1], sd)
        b[2] += 1
        b[3] += sd > cutoff
    agg = defaultdict(lambda: [0, 0, 0])
    for mn, mx, n, m in blocks.values():
        status = "pruned" if mx <= cutoff else ("full" if mn > cutoff else "partial")
        if status == "pruned":
            assert m == 0
        if status == "full":
            assert m == n
        agg[status][0] += 1
        agg[status][1] += n
        agg[status][2] += m
    expect = {s: tuple(v) for s, v in agg.items()}
    got = {
        r.status: (r.n_blocks, r.total_rows, r.matching_rows)
        for r in REGISTRY["dq_zonemap_pruning_audit"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_zorder_pruning_gain_matches_bruteforce(spark):
    """dq_zorder_pruning_gain: Morton interleave + both block framings
    recomputed in plain Python; z-order must yield at least as many
    fully-classified (pruned/full) blocks as the natural layout."""
    import datetime
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    epoch = datetime.date(1992, 1, 1)
    rows = []
    for ok, sd in _smoke_table("lineitem", ["l_orderkey", "l_shipdate"]):
        if isinstance(sd, datetime.datetime):
            sd = sd.date()
        rows.append((ok, (sd - epoch).days))
    okmn, okmx = min(r[0] for r in rows), max(r[0] for r in rows)
    dmn, dmx = min(r[1] for r in rows), max(r[1] for r in rows)
    cut = (datetime.date(1995, 6, 15) - epoch).days

    def morton(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    blocks = defaultdict(lambda: [None, None, 0, 0])
    for ok, days in rows:
        xc = ((ok - okmn) * 255) // max(1, okmx - okmn)
        yc = ((days - dmn) * 255) // max(1, dmx - dmn)
        for layout, bid in (
            ("natural", (xc * 16) // 256),
            ("zorder", morton(xc, yc) >> 12),
        ):
            b = blocks[(layout, bid)]
            b[0] = days if b[0] is None else min(b[0], days)
            b[1] = days if b[1] is None else max(b[1], days)
            b[2] += 1
            b[3] += days > cut
    agg = defaultdict(lambda: [0, 0, 0])
    for (layout, _), (mn, mx, n, m) in blocks.items():
        status = "pruned" if mx <= cut else ("full" if mn > cut else "partial")
        a = agg[(layout, status)]
        a[0] += 1
        a[1] += n
        a[2] += m
    expect = {k: tuple(v) for k, v in agg.items()}
    got = {
        (r.layout, r.status): (r.n_blocks, r.total_rows, r.matching_rows)
        for r in REGISTRY["dq_zorder_pruning_gain"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect
    full_nat = sum(
        v[0] for (lay, st), v in expect.items() if lay == "natural" and st != "partial"
    )
    full_z = sum(
        v[0] for (lay, st), v in expect.items() if lay == "zorder" and st != "partial"
    )
    assert full_z >= full_nat  # the point of z-ordering


def test_payload_entropy_matches_bruteforce(spark):
    """multimodal_payload_entropy: nibble entropy recomputed with
    collections.Counter over the hex rendering, same 16-term fold order;
    values must sit in [0, 4] bits."""
    import math
    from collections import Counter

    from dend_spark_data_lake_spark.functions.multimodal import HEX_SYMBOLS
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    expect = {}
    for doc_id, text in _smoke_table("documents", ["doc_id", "text"]):
        h = text.encode("utf-8").hex().upper()
        counts = Counter(h)
        ent = 0.0
        for s in HEX_SYMBOLS:  # FIXED fold order, matching both engines
            c = counts.get(s, 0)
            if c > 0:
                p = c / len(h)
                ent += -p * math.log2(p)
        expect[doc_id] = (len(h) // 2, round(ent, 6))
        assert 0.0 <= ent <= 4.0 + 1e-9
    got = {
        r.doc_id: (r.n_bytes, r.nibble_entropy)
        for r in REGISTRY["multimodal_payload_entropy"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_cc_incremental_matches_bruteforce(spark):
    """dedup_cc_incremental: the contracted-star incremental path must
    reproduce the cluster-size histogram of a plain union-find over ALL
    near-dup pairs — the incremental == from-scratch invariant."""
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    sets = _shingle_sets()
    ids = sorted(sets)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter and inter / len(sets[a] | sets[b]) >= 0.5:
                union(a, b)
    csize = Counter(find(v) for v in parent)
    expect = dict(Counter(csize.values()))
    got = {
        r.cluster_size: r.n_clusters
        for r in REGISTRY["dedup_cc_incremental"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_pin_harness_detects_formula_drift(spark):
    """Negative control for the PIN class (mirror of the comparator
    negative controls): a deliberately perturbed replica — the Bloom
    audit recomputed with k=2 hashes instead of 3 — must produce a
    non-empty result that does NOT match the engine, proving the pin
    comparisons cannot pass vacuously."""
    import hashlib
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    def positions(key, k):
        return [
            int(hashlib.md5(f"{i}:{key}".encode()).hexdigest()[:8], 16) % 1024
            for i in range(k)
        ]

    build = {
        ck
        for ck, prio in _smoke_table("orders", ["o_custkey", "o_orderpriority"])
        if prio == "1-URGENT"
    }
    inserted = {p for kk in build for p in positions(kk, 2)}
    seg = defaultdict(lambda: [0, 0, 0, 0])
    for ck, mkt in _smoke_table("customer", ["c_custkey", "c_mktsegment"]):
        actual = ck in build
        bloom = all(p in inserted for p in positions(ck, 2))
        row = seg[mkt]
        row[0] += 1
        row[1] += actual
        row[2] += bloom
        row[3] += bloom and not actual
    perturbed = {m: tuple(v) for m, v in seg.items()}
    got = {
        r.c_mktsegment: (r.n_customers, r.n_actual, r.n_bloom_pass, r.n_false_pos)
        for r in REGISTRY["dq_bloom_filter_audit"].fn(spark, SF_SMOKE).collect()
    }
    assert got and perturbed
    assert got != perturbed, "k=2 replica unexpectedly matched the k=3 engine"


def test_truncated_dim_recall_matches_bruteforce(spark):
    """sim_truncated_dim_recall: full-64 and first-16-dim top-5 sets
    recomputed with numpy; recall must be exact n_overlap * 20 and the
    truncated search must lose SOME recall somewhere (else the eval is
    vacuous at this dim)."""
    import numpy as np

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_embeddings()
    vecs = {vid: np.asarray(v, dtype=np.float64) for vid, _, v in rows}

    def topk(dim):
        out = {}
        for q in [v for v in vecs if v < 10]:
            qv = vecs[q][:dim]
            nq = float(np.sqrt(qv @ qv))
            scored = sorted(
                (
                    -round(float(qv @ vecs[c][:dim]) / (nq * float(np.sqrt(vecs[c][:dim] @ vecs[c][:dim]))), 6),
                    c,
                )
                for c in vecs
                if c != q
            )
            out[q] = {c for _, c in scored[:5]}
        return out

    full, trunc = topk(64), topk(16)
    expect = {
        q: (len(full[q] & trunc[q]), len(full[q] & trunc[q]) * 20) for q in full
    }
    got = {
        r.query_id: (r.n_overlap, r.recall_pct)
        for r in REGISTRY["sim_truncated_dim_recall"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert any(n < 5 for n, _ in expect.values())


def test_stream_state_estimate_matches_bruteforce(spark):
    """stream_state_size_estimate: the 30-min-TTL sweep line recomputed
    in plain Python minute by minute."""
    import datetime
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    deltas = Counter()
    n = 0
    for (ts,) in _smoke_table("events", ["ts"]):
        m = ts.replace(second=0, microsecond=0)
        deltas[m] += 1
        deltas[m + datetime.timedelta(minutes=30)] -= 1
        n += 1
    state, peak, peak_minute = 0, -1, None
    for m in sorted(deltas):
        state += deltas[m]
        if state > peak:
            peak, peak_minute = state, m
    row = REGISTRY["stream_state_size_estimate"].fn(spark, SF_SMOKE).collect()[0]
    got_minute = row.peak_minute
    if got_minute.tzinfo is not None:
        got_minute = got_minute.replace(tzinfo=None)
    assert (row.total_events, row.peak_state, got_minute) == (n, peak, peak_minute)


def test_interleave_schedule_matches_bruteforce(spark):
    """corpus_interleave_schedule: positions recomputed in plain Python;
    the first n_sources positions must cover every source exactly once."""
    import hashlib
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    by_source = defaultdict(list)
    for doc_id, source in _smoke_table("documents", ["doc_id", "source"]):
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[:4]
        by_source[source].append((h, doc_id))
    sources = sorted(by_source)
    ns = len(sources)
    expect = {}
    for s_idx, source in enumerate(sources, start=1):
        rows = sorted(by_source[source])
        for r, (_, doc_id) in enumerate(rows, start=1):
            pos = (r - 1) * ns + s_idx
            if pos <= 40:
                expect[pos] = (source, doc_id)
    got = {
        r.pos: (r.source, r.doc_id)
        for r in REGISTRY["corpus_interleave_schedule"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect
    first_round = {got[p][0] for p in range(1, ns + 1) if p in got}
    assert len(first_round) == min(ns, 40)


def test_markov_entropy_rate_matches_bruteforce(spark):
    """events_markov_entropy_rate: transition counts + per-state entropy
    recomputed in plain Python; every state entropy in [0, ln(|types|)]."""
    import math
    from collections import Counter, defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    by_user = defaultdict(list)
    for uid, et, ts, eid in _smoke_table(
        "events", ["user_id", "event_type", "ts", "event_id"]
    ):
        by_user[uid].append((ts, eid, et))
    trans = Counter()
    for rows in by_user.values():
        rows.sort()
        for (_, _, a), (_, _, b) in zip(rows, rows[1:]):
            trans[(a, b)] += 1
    out = defaultdict(dict)
    for (a, b), c in trans.items():
        out[a][b] = c
    total = sum(trans.values())
    expect = {}
    n_types = len({t for pair in trans for t in pair})
    for a, targets in out.items():
        n = sum(targets.values())
        h = round(
            math.log(n) - sum(c * math.log(c) for c in targets.values()) / n, 6
        )
        assert -1e-9 <= h <= math.log(n_types) + 1e-9
        expect[a] = (n, h, round(h * n / total, 6))
    got = {
        r.event_type: (r.n_out, r.h_nats, r.contrib_nats)
        for r in REGISTRY["events_markov_entropy_rate"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_quality_dedup_matrix_matches_bruteforce(spark):
    """curation_quality_dedup_matrix: the 2x2 retention matrix recomputed
    with the union-find drop set + plain token counts; cells must sum to
    the corpus."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    sets = _shingle_sets()
    ids = sorted(sets)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter and inter / len(sets[a] | sets[b]) >= 0.5:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    dropped = {v for v in parent if find(v) != v}
    cells = defaultdict(lambda: [0, 0])
    n_total = 0
    for doc_id, text, n_chars in _smoke_table(
        "documents", ["doc_id", "text", "n_chars"]
    ):
        q = (len(text.split()) if text.strip() else 0) >= 10
        k = doc_id not in dropped
        cells[(q, k)][0] += 1
        cells[(q, k)][1] += n_chars
        n_total += 1
    expect = {cell: tuple(v) for cell, v in cells.items()}
    assert sum(v[0] for v in expect.values()) == n_total
    got = {
        (r.quality_ok, r.dedup_keep): (r.n_docs, r.sum_chars)
        for r in REGISTRY["curation_quality_dedup_matrix"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_centroid_drift_matches_bruteforce(spark):
    """embed_centroid_drift: integer-quantized component sums + cosine
    recomputed with numpy; drift must equal the quantized-mean cosine and
    sit in [-1, 1]."""
    import math

    import numpy as np

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    halves = {}
    for vid, lab, vec in _smoke_embeddings():
        qv = [math.floor(v * (1 << 20) + 0.5) for v in np.asarray(vec, dtype=np.float64)]
        key = (lab, vid % 2)
        if key not in halves:
            halves[key] = [np.zeros(64, dtype=np.int64), 0]
        halves[key][0] += np.asarray(qv, dtype=np.int64)
        halves[key][1] += 1
    labels = sorted({lab for lab, _ in halves})
    expect = {}
    for lab in labels:
        so, n_old = halves.get((lab, 0), [np.zeros(64, dtype=np.int64), 0])
        sn, n_new = halves.get((lab, 1), [np.zeros(64, dtype=np.int64), 0])
        dot = int((so * sn).sum())
        no = int((so * so).sum())
        nn = int((sn * sn).sum())
        cos = round(dot / (math.sqrt(no) * math.sqrt(nn)), 6)
        assert -1.0 <= cos <= 1.0
        expect[lab] = (n_old, n_new, cos)
    got = {
        r.label: (r.n_old, r.n_new, r.drift_cos)
        for r in REGISTRY["embed_centroid_drift"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# Round-7 replica pins: oracle-independent brute-force recomputations of the
# nine round-7 additions (formula authored twice = Spark plan + oracle SQL;
# these pins are the third, independent implementation that catches a
# shared-formula bug invisible to cross-engine parity)
# ---------------------------------------------------------------------------


def _md5_bucket(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:4], 16)


def test_split_temporal_holdout_matches_bruteforce(spark):
    """split_temporal_holdout: per-user (ts, event_id) order recomputed in
    plain Python; n_train = max(1, 4*cnt//5); per (split, event_type)
    event and user counts exactly."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("events", ["user_id", "event_id", "ts", "event_type"])
    by_user = defaultdict(list)
    for uid, eid, ts, et in rows:
        by_user[uid].append((ts, eid, et))
    n_events = defaultdict(int)
    users = defaultdict(set)
    for uid, evs in by_user.items():
        evs.sort()
        n_train = max(1, (4 * len(evs)) // 5)
        for i, (_, _, et) in enumerate(evs, start=1):
            split = "train" if i <= n_train else "eval"
            n_events[(split, et)] += 1
            users[(split, et)].add(uid)
    expect = {
        k: (n_events[k], len(users[k])) for k in n_events
    }
    got = {
        (r.split, r.event_type): (r.n_events, r.n_users)
        for r in REGISTRY["split_temporal_holdout"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect
    # every user keeps at least one train event
    train_users = set().union(
        *[users[k] for k in users if k[0] == "train"]
    )
    assert train_users == set(by_user)


def test_watermark_lateness_matches_bruteforce(spark):
    """events_watermark_lateness: per-user running event-time max in
    arrival (event_id) order recomputed in plain Python; exact integer
    microsecond lateness and ppm via //."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("events", ["user_id", "event_id", "epoch_us(ts) AS us"])
    by_user = defaultdict(list)
    for uid, eid, us in rows:
        by_user[uid].append((eid, us))
    lates = []
    for evs in by_user.values():
        evs.sort()
        run = None
        for _, us in evs:
            run = us if run is None else max(run, us)
            lates.append(run - us)
    n = len(lates)
    expect = {}
    for d in (0, 300, 900, 3600):
        nl = sum(1 for x in lates if x > d * 1_000_000)
        expect[d] = (nl, (1_000_000 * nl) // n)
    got = {
        r.delay_sec: (r.n_late, r.late_ppm)
        for r in REGISTRY["events_watermark_lateness"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_ab_test_proportions_matches_bruteforce(spark):
    """stats_ab_test_proportions: md5 variant assignment, per-user
    conversion, and the z² integer formula recomputed with Python
    arbitrary-precision ints — the 128-bit arithmetic the engines do in
    DECIMAL(38,0)/HUGEINT is replicated exactly, floor division and
    all."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("events", ["user_id", "event_type"])
    conv = defaultdict(int)
    for uid, et in rows:
        conv[uid] |= et == "purchase"
    n = [0, 0]
    c = [0, 0]
    for uid, cv in conv.items():
        v = _md5_bucket(f"ab:{uid}") % 2
        n[v] += 1
        c[v] += cv
    num = 1_000_000 * (c[0] * n[1] - c[1] * n[0]) ** 2 * (n[0] + n[1])
    den = n[0] * n[1] * (c[0] + c[1]) * (n[0] + n[1] - c[0] - c[1])
    z2 = num // den if den else 0
    sig = den > 0 and num >= 3841459 * den
    r = REGISTRY["stats_ab_test_proportions"].fn(spark, SF_SMOKE).collect()
    assert len(r) == 1
    r = r[0]
    assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (n[0], c[0], n[1], c[1])
    assert r.conv_a_ppm == (1_000_000 * c[0]) // n[0]
    assert r.conv_b_ppm == (1_000_000 * c[1]) // n[1]
    assert r.z2_e6 == z2
    assert r.significant == sig


def test_quality_calibration_bins_matches_bruteforce(spark):
    """quality_calibration_bins: stopword score, bin, and ppm rates
    recomputed in plain Python integer arithmetic."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    stop = {"the", "a", "of", "and", "to", "in", "is", "it"}
    rows = _smoke_table("documents", ["text", "lang"])
    bins = defaultdict(lambda: [0, 0])
    for text, lang in rows:
        toks = text.lower().strip().split()
        score = (100 * sum(1 for t in toks if t in stop)) // len(toks) if toks else 0
        b = min(score // 2, 9)
        bins[b][0] += 1
        bins[b][1] += lang == "en"
    tdocs = sum(v[0] for v in bins.values())
    ten = sum(v[1] for v in bins.values())
    overall = (1_000_000 * ten) // tdocs
    expect = {
        b: (nd, ne, (1_000_000 * ne) // nd, abs((1_000_000 * ne) // nd - overall))
        for b, (nd, ne) in bins.items()
    }
    got = {
        r.bin: (r.n_docs, r.n_en, r.en_rate_ppm, r.gap_ppm)
        for r in REGISTRY["quality_calibration_bins"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_hazard_churn_matches_bruteforce(spark):
    """events_hazard_churn: lifetime weeks and the suffix-sum life table
    recomputed in plain Python."""
    from collections import Counter, defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("events", ["user_id", "epoch_us(ts) AS us"])
    span = defaultdict(lambda: [None, None])
    for uid, us in rows:
        s = span[uid]
        s[0] = us if s[0] is None else min(s[0], us)
        s[1] = us if s[1] is None else max(s[1], us)
    weeks = Counter((mx - mn) // 604_800_000_000 for mn, mx in span.values())
    expect = {}
    at_risk = 0
    for w in sorted(weeks, reverse=True):
        at_risk += weeks[w]
        expect[w] = (weeks[w], at_risk, (1_000_000 * weeks[w]) // at_risk)
    got = {
        r.week: (r.n_churned, r.n_at_risk, r.hazard_ppm)
        for r in REGISTRY["events_hazard_churn"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_quota_waterfill_matches_bruteforce(spark):
    """corpus_quota_waterfill: the waterline search, floor division, and
    largest-remainder top-up recomputed in plain Python; asserts the
    budget closes EXACTLY (sum of quotas == budget) and every quota is
    demand-bounded."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["source", "n_chars"])
    demand = defaultdict(int)
    for src, nc in rows:
        demand[src] += nc
    budget = (3 * sum(demand.values())) // 5
    quota, capped = _waterfill(dict(demand), budget)
    assert sum(quota.values()) == budget
    assert all(quota[src] <= demand[src] for src in quota)
    got = {
        r.source: (r.demand_chars, r.quota_chars, r.capped)
        for r in REGISTRY["corpus_quota_waterfill"].fn(spark, SF_SMOKE).collect()
    }
    expect = {src: (demand[src], quota[src], src in capped) for src in demand}
    assert got == expect


def test_negative_sampling_matches_bruteforce(spark):
    """rec_negative_sampling: shelves, probes, anti-join, and md5 ranking
    recomputed with hashlib; also asserts no sampled negative was ever
    actually purchased (the no-false-negative guarantee)."""
    import hashlib
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    parts = [p for (p,) in _smoke_table("part", ["p_partkey"])]
    custs = [c for (c,) in _smoke_table("customer", ["c_custkey"])]
    # seen pairs need the orders x lineitem join; do it in duckdb directly
    import duckdb

    from tests.conftest import SF_SMOKE as _SF

    con = duckdb.connect()
    seen = set(
        con.sql(
            f"""SELECT DISTINCT o_custkey, l_partkey
            FROM read_parquet('{_SF}/orders.parquet') o
            JOIN read_parquet('{_SF}/lineitem.parquet') l
              ON l.l_orderkey = o.o_orderkey"""
        ).fetchall()
    )
    con.close()
    shelves = {}
    for p in parts:
        sh = _md5_bucket(f"shelf:{p}") % 64
        h = hashlib.md5(str(p).encode()).hexdigest()
        if sh not in shelves or (h, p) < shelves[sh]:
            shelves[sh] = (h, p)
    expect = set()
    for c in custs:
        cands = set()
        for slot in range(8):
            sh = _md5_bucket(f"neg:{c}:{slot}") % 64
            if sh in shelves:
                cands.add(shelves[sh][1])
        cands = [p for p in cands if (c, p) not in seen]
        ranked = sorted(cands, key=lambda p: (_md5_bucket(f"rank:{c}:{p}"), p))
        for rank, p in enumerate(ranked[:3], start=1):
            expect.add((c, p, rank))
    got = {
        (r.c_custkey, r.p_partkey, r.rank)
        for r in REGISTRY["rec_negative_sampling"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert not {(c, p) for c, p, _ in got} & seen


def test_knn_mutual_stats_matches_bruteforce(spark):
    """sim_knn_mutual_stats: numpy all-pairs cosine over the 25% sample,
    rounded + id-tie-broken top-5, mutual join, degree histogram."""
    import numpy as np
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = [(vid, v) for vid, _, v in _smoke_embeddings() if vid % 4 == 0]
    vecs = {vid: np.asarray(v, dtype=np.float64) for vid, v in rows}
    norms = {vid: float(np.sqrt(v @ v)) for vid, v in vecs.items()}
    top5 = {}
    for q in vecs:
        scored = sorted(
            (-round(float(vecs[q] @ vecs[c]) / (norms[q] * norms[c]), 6), c)
            for c in vecs
            if c != q
        )
        top5[q] = {c for _, c in scored[:5]}
    deg = Counter()
    for q in vecs:
        deg[q] = sum(1 for c in top5[q] if q in top5[c])
    expect = Counter(deg.values())
    got = {
        r.mutual_degree: r.n_nodes
        for r in REGISTRY["sim_knn_mutual_stats"].fn(spark, SF_SMOKE).collect()
    }
    assert got == dict(expect)


def test_dsir_importance_matches_bruteforce(spark):
    """curation_dsir_importance: hashed-unigram LMs and log importance
    ratios recomputed with hashlib/math; top-20 identity and rounded
    weights exactly."""
    import math
    from collections import Counter, defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["doc_id", "lang", "text"])
    cs = Counter()
    ct = Counter()
    doc_buckets = {}
    langs = {}
    for doc_id, lang, text in rows:
        toks = [t for t in text.lower().strip().split() if t]
        bs = [_md5_bucket(f"dsir:{t}") % 512 for t in toks]
        doc_buckets[doc_id] = bs
        langs[doc_id] = lang
        for b in bs:
            cs[b] += 1
            if lang == "en":
                ct[b] += 1
    ns = sum(cs.values())
    nt = sum(ct.values())
    ratio = {
        b: math.log((ct[b] + 1.0) / (nt + 512.0))
        - math.log((cs[b] + 1.0) / (ns + 512.0))
        for b in cs
    }
    w = {
        doc_id: round(sum(ratio[b] for b in bs), 6)
        for doc_id, bs in doc_buckets.items()
        if bs
    }
    top = sorted(w.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    expect = [(doc_id, langs[doc_id], lw) for doc_id, lw in top]
    got = [
        (r.doc_id, r.lang, r.logw)
        for r in REGISTRY["curation_dsir_importance"].fn(spark, SF_SMOKE).collect()
    ]
    assert got == expect


def test_cohort_ltv_matches_bruteforce(spark):
    """orders_cohort_ltv: month integers, exact cents, cumulative sums,
    and floor-division LTV recomputed in plain Python."""
    import math
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table(
        "orders",
        [
            "o_custkey",
            "year(o_orderdate) * 12 + month(o_orderdate) - 1 AS ym",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
        ],
    )
    cohort = {}
    for ck, ym, _ in rows:
        cohort[ck] = min(cohort.get(ck, ym), ym)
    size = defaultdict(int)
    for ck in cohort:
        size[cohort[ck]] += 1
    rev = defaultdict(int)
    for ck, ym, cents in rows:
        rev[(cohort[ck], ym - cohort[ck])] += cents
    expect = {}
    by_cohort = defaultdict(list)
    for (cym, age), cents in rev.items():
        by_cohort[cym].append((age, cents))
    for cym, ages in by_cohort.items():
        cum = 0
        label = f"{cym // 12}-{cym % 12 + 1:02d}"
        for age, cents in sorted(ages):
            cum += cents
            expect[(label, age)] = (size[cym], cents, cum, cum // size[cym])
    got = {
        (r.cohort, r.age_months): (
            r.n_customers,
            r.rev_cents,
            r.cum_rev_cents,
            r.ltv_cents_per_cust,
        )
        for r in REGISTRY["orders_cohort_ltv"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_neyman_allocation_matches_bruteforce(spark):
    """sample_neyman_allocation: math.isqrt of the exact variance
    numerator (the true integer N·σ) and largest-remainder rounding
    recomputed in plain Python; asserts the budget closes exactly."""
    import math
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["lang", "n_chars"])
    agg = defaultdict(lambda: [0, 0, 0])
    for lang, nc in rows:
        a = agg[lang]
        a[0] += 1
        a[1] += nc
        a[2] += nc * nc
    w = {lang: math.isqrt(a[0] * a[2] - a[1] * a[1]) for lang, a in agg.items()}
    tw = sum(w.values())
    base = {lang: (1000 * v) // tw for lang, v in w.items()}
    rem = {lang: (1000 * v) % tw for lang, v in w.items()}
    leftover = 1000 - sum(base.values())
    for lang in sorted(rem, key=lambda x: (-rem[x], x))[:leftover]:
        base[lang] += 1
    assert sum(base.values()) == 1000
    got = {
        r.lang: (r.n_docs, r.w_sigma, r.alloc)
        for r in REGISTRY["sample_neyman_allocation"].fn(spark, SF_SMOKE).collect()
    }
    expect = {lang: (agg[lang][0], w[lang], base[lang]) for lang in agg}
    assert got == expect


def test_affected_partitions_matches_bruteforce(spark):
    """etl_affected_partitions: per-day base/batch split recomputed in
    plain Python; the recompute set is exactly the days the batch
    touches."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("events", ["event_id", "CAST(ts AS DATE) AS day"])
    counts = defaultdict(lambda: [0, 0])
    for eid, day in rows:
        counts[day][eid % 10 == 0] += 1
    expect = {
        day: (nb, nba, nba > 0) for day, (nb, nba) in counts.items()
    }
    got = {
        r.day: (r.n_base, r.n_batch, r.recompute)
        for r in REGISTRY["etl_affected_partitions"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_lookalike_rank_matches_bruteforce(spark):
    """events_lookalike_rank: integer behavioral profiles, the summed
    purchaser prototype, and the rounded cosine ranking recomputed in
    plain Python/math."""
    import math
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("events", ["user_id", "event_type"])
    prof = defaultdict(lambda: defaultdict(int))
    for uid, et in rows:
        prof[uid][et] += 1
    dims = ("view", "click", "signup", "error")
    proto = [0, 0, 0, 0]
    for uid, p in prof.items():
        if p["purchase"] > 0:
            for i, d in enumerate(dims):
                proto[i] += p[d]
    pn = math.sqrt(sum(x * x for x in proto))
    scored = []
    for uid, p in prof.items():
        if p["purchase"] > 0:
            continue
        v = [p[d] for d in dims]
        if sum(v) == 0:
            continue
        cos = round(
            sum(a * b for a, b in zip(v, proto))
            / (math.sqrt(sum(a * a for a in v)) * pn),
            6,
        )
        scored.append((-cos, uid, v))
    scored.sort()
    expect = [
        (uid, *v, -negcos, rank)
        for rank, (negcos, uid, v) in enumerate(scored[:20], start=1)
    ]
    got = [
        (r.user_id, r.n_view, r.n_click, r.n_signup, r.n_error, r.cos_proto, r.rank)
        for r in REGISTRY["events_lookalike_rank"].fn(spark, SF_SMOKE).collect()
    ]
    assert got == expect


def test_partition_checksums_match_bruteforce(spark):
    """dq_partition_checksums: the two salted additive md5 folds
    recomputed with hashlib; also asserts mergeability (shard checksums
    sum to the partition checksum) on an arbitrary row split."""
    import hashlib
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["lang", "doc_id", "n_chars", "text"])
    acc = defaultdict(lambda: [0, 0, 0])
    for lang, doc_id, n_chars, text in rows:
        th = hashlib.md5(text.encode()).hexdigest()
        key = f"{doc_id}:{n_chars}:{th}"
        a = acc[lang]
        a[0] += 1
        a[1] += _md5_bucket(f"chk1:{key}")
        a[2] += _md5_bucket(f"chk2:{key}")
    expect = {lang: tuple(v) for lang, v in acc.items()}
    got = {
        r.lang: (r.n_rows, r.checksum_a, r.checksum_b)
        for r in REGISTRY["dq_partition_checksums"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect
    # mergeability: fold halves independently, sums must agree
    lang0 = rows[0][0]
    half = [r for i, r in enumerate(rows) if r[0] == lang0 and i % 2 == 0]
    other = [r for i, r in enumerate(rows) if r[0] == lang0 and i % 2 == 1]

    def fold(rs):
        return sum(
            _md5_bucket(
                f"chk1:{d}:{n}:{hashlib.md5(t.encode()).hexdigest()}"
            )
            for _, d, n, t in rs
        )

    assert fold(half) + fold(other) == expect[lang0][1]


def test_anneal_schedule_matches_bruteforce(spark):
    """corpus_anneal_schedule: math.isqrt roots, per-epoch largest
    remainder, and exact 1000-budget closure per epoch recomputed in
    plain Python."""
    import math
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    langs = Counter(lang for (lang,) in _smoke_table("documents", ["lang"]))
    expect = {}
    for epoch, t in ((1, 4), (2, 2), (3, 1)):
        w = {}
        for lang, n in langs.items():
            w[lang] = (
                n if t == 1 else math.isqrt(n) if t == 2 else math.isqrt(math.isqrt(n))
            )
        tw = sum(w.values())
        base = {lang: (1000 * v) // tw for lang, v in w.items()}
        rem = {lang: (1000 * v) % tw for lang, v in w.items()}
        leftover = 1000 - sum(base.values())
        for lang in sorted(rem, key=lambda x: (-rem[x], x))[:leftover]:
            base[lang] += 1
        assert sum(base.values()) == 1000
        for lang in langs:
            expect[(epoch, lang)] = (langs[lang], w[lang], base[lang])
    got = {
        (r.epoch, r.lang): (r.n_docs, r.weight, r.alloc)
        for r in REGISTRY["corpus_anneal_schedule"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_canonical_failover_matches_bruteforce(spark):
    """dedup_canonical_failover: prefix clusters, md5-min canonicals
    before/after the deletion batch, and the failover flag recomputed
    with hashlib; also asserts the failover semantics (a surviving
    canonical never changes)."""
    import hashlib
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["doc_id", "text"])
    clusters = defaultdict(list)
    for doc_id, text in rows:
        toks = text.lower().strip().split()
        ck = hashlib.md5(" ".join(toks[:5]).encode()).hexdigest()
        clusters[ck].append(doc_id)
    expect = {}
    for members in clusters.values():
        if len(members) < 2:
            continue
        h = {d: hashlib.md5(f"can:{d}".encode()).hexdigest() for d in members}
        before = min(members, key=lambda d: h[d])
        survivors = [d for d in members if d % 7 != 0]
        after = min(survivors, key=lambda d: h[d]) if survivors else None
        cid = min(members)
        expect[cid] = (
            len(members),
            sum(1 for d in members if d % 7 == 0),
            before,
            after,
            before % 7 == 0 and after is not None,
        )
        if before % 7 != 0:
            assert after == before  # surviving canonical never changes
    got = {
        r.cluster_id: (
            r.n_members,
            r.n_deleted,
            r.canonical_before,
            r.canonical_after,
            r.failover,
        )
        for r in REGISTRY["dedup_canonical_failover"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_sim_histogram_matches_bruteforce(spark):
    """embed_sim_histogram: consecutive-id pair cosines and the clamped
    decile bucketing recomputed with numpy."""
    import math
    import numpy as np
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    vecs = {vid: np.asarray(v, dtype=np.float64) for vid, _, v in _smoke_embeddings()}
    hist = Counter()
    for vid, v in vecs.items():
        w = vecs.get(vid + 1)
        if w is None:
            continue
        cos = round(float(v @ w) / (math.sqrt(v @ v) * math.sqrt(w @ w)), 6)
        hist[min(math.floor(cos * 10), 9)] += 1
    got = {
        r.bucket: r.n_pairs
        for r in REGISTRY["embed_sim_histogram"].fn(spark, SF_SMOKE).collect()
    }
    assert got == dict(hist)


def test_interarrival_stats_match_bruteforce(spark):
    """events_interarrival_stats: per-user gaps and the power-of-2 ladder
    recomputed in plain Python from the same constant."""
    from collections import Counter, defaultdict

    from dend_spark_data_lake_spark.queries import (
        REGISTRY,
        _INTERARRIVAL_LADDER_S,
    )
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("events", ["user_id", "event_id", "epoch_us(ts) AS us"])
    by_user = defaultdict(list)
    for uid, eid, us in rows:
        by_user[uid].append((us, eid))
    hist = Counter()
    for evs in by_user.values():
        evs.sort()
        for (a, _), (b, _) in zip(evs, evs[1:]):
            gap = b - a
            bucket = next(
                (s for s in _INTERARRIVAL_LADDER_S if gap < s * 1_000_000),
                9223372036854775807,
            )
            hist[bucket] += 1
    tot = sum(hist.values())
    expect = {b: (n, (1_000_000 * n) // tot) for b, n in hist.items()}
    got = {
        r.bucket_s: (r.n_gaps, r.pct_ppm)
        for r in REGISTRY["events_interarrival_stats"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_trending_decay_matches_bruteforce(spark):
    """events_trending_decay: dyadic decay weights (bit shifts) and the
    ranking recomputed in plain Python integer arithmetic."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("events", ["event_type", "CAST(ts AS DATE) AS d"])
    ref = max(d for _, d in rows)
    agg = defaultdict(lambda: [0, 0])
    for et, d in rows:
        age_weeks = (ref - d).days // 7
        agg[et][0] += 1
        agg[et][1] += 1 << max(0, 30 - age_weeks)
    ranked = sorted(agg.items(), key=lambda kv: (-kv[1][1], kv[0]))
    expect = [
        (et, n, score, rank)
        for rank, (et, (n, score)) in enumerate(ranked, start=1)
    ]
    got = [
        (r.event_type, r.n_events, r.decay_score, r.rank)
        for r in REGISTRY["events_trending_decay"].fn(spark, SF_SMOKE).collect()
    ]
    assert got == expect


def test_ipw_matches_bruteforce(spark):
    """sample_inverse_propensity_weights: gate counts, ppm weights, and
    mixture drift recomputed in plain Python; empty-stratum weights are
    NULL, and reweighting a surviving stratum recovers its original
    count."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["lang", "n_chars"])
    agg = defaultdict(lambda: [0, 0])
    for lang, nc in rows:
        agg[lang][0] += 1
        agg[lang][1] += nc >= 150
    tb = sum(a[0] for a in agg.values())
    ta = sum(a[1] for a in agg.values())
    expect = {}
    for lang, (nb, na) in agg.items():
        ipw = (1_000_000 * nb) // na if na > 0 else None
        sb = (1_000_000 * nb) // tb
        sa = (1_000_000 * na) // ta
        expect[lang] = (nb, na, ipw, sb, sa, abs(sa - sb))
        if na > 0:
            # reweighting sanity: na * (nb/na) ~ nb at ppm resolution
            assert abs(na * ipw - 1_000_000 * nb) < 1_000_000
    got = {
        r.lang: (
            r.n_before,
            r.n_after,
            r.ipw_ppm,
            r.share_before_ppm,
            r.share_after_ppm,
            r.drift_ppm,
        )
        for r in REGISTRY["sample_inverse_propensity_weights"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    assert got == expect


def test_vocab_growth_matches_bruteforce(spark):
    """text_vocab_growth_heaps: first-occurrence vocabulary accounting
    and the checkpoint cumsums recomputed in plain Python; the final
    cum_vocab must equal the corpus' true distinct-token count (the
    first-occurrence trick is exact, not an estimate)."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["doc_id", "text"])
    wd = max(d for d, _ in rows) // 64 + 1
    first = {}
    ntok = defaultdict(int)
    for doc_id, text in sorted(rows):
        toks = [t for t in text.lower().strip().split() if t]
        ntok[doc_id // wd] += len(toks)
        for t in set(toks):
            if t not in first or doc_id < first[t]:
                first[t] = doc_id
    new = defaultdict(int)
    for t, d in first.items():
        new[d // wd] += 1
    expect = []
    cv = ct = 0
    for b in sorted(ntok):
        cv += new.get(b, 0)
        ct += ntok[b]
        expect.append((b, new.get(b, 0), cv, ct))
    got = [
        (r.bucket, r.n_new_tokens, r.cum_vocab, r.cum_tokens)
        for r in REGISTRY["text_vocab_growth_heaps"].fn(spark, SF_SMOKE).collect()
    ]
    assert got == expect
    assert got[-1][2] == len(first)  # exact total vocabulary


def _waterfill(demand: dict, budget: int):
    """Reference water-filling replica shared by the fixture pin and the
    hypothesis property below: returns (quota, capped) with exact budget
    closure via the floor waterline + largest-remainder top-up."""
    items = sorted(demand.items(), key=lambda kv: (kv[1], kv[0]))
    s = len(items)
    cum = 0
    lam = None
    for k, (_, d) in enumerate(items, start=1):
        if cum + d * (s - k + 1) >= budget:
            lam = (budget - cum) // (s - k + 1)
            break
        cum += d
    quota = {src: min(d, lam) if lam is not None else d for src, d in items}
    capped = {src for src, d in items if lam is not None and d > lam}
    leftover = budget - sum(quota.values())
    for src in sorted(capped, key=lambda x: (-demand[x], x))[:leftover]:
        quota[src] += 1
    return quota, capped


@given(
    st.dictionaries(
        st.text(alphabet="abcdef", min_size=1, max_size=3),
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=0, max_value=50_000),
)
def test_waterfill_properties(demand, budget):
    """Water-filling invariants on ANY input: quotas never exceed
    demand; the budget closes exactly when affordable (else everything
    is granted); max-min fairness — every capped source's quota is
    within 1 of every other capped source and >= any uncapped quota."""
    quota, capped = _waterfill(demand, budget)
    total = sum(demand.values())
    assert all(0 <= quota[s] <= demand[s] for s in demand)
    if budget <= total:
        assert sum(quota.values()) == budget
    else:
        assert quota == demand
    for s in capped:
        for t in demand:
            if t in capped:
                assert abs(quota[s] - quota[t]) <= 1
            else:
                assert quota[s] >= quota[t] - 1


def _largest_remainder(weights: dict, k: int):
    """Reference largest-remainder rounding replica (Neyman / anneal
    allocation): floor shares + one unit to the largest remainders in
    (remainder desc, key) order."""
    tw = sum(weights.values())
    if tw == 0:
        return {key: 0 for key in weights}
    base = {key: (k * w) // tw for key, w in weights.items()}
    rem = {key: (k * w) % tw for key, w in weights.items()}
    leftover = k - sum(base.values())
    for key in sorted(rem, key=lambda x: (-rem[x], x))[:leftover]:
        base[key] += 1
    return base


@given(
    st.dictionaries(
        st.text(alphabet="abcdef", min_size=1, max_size=3),
        st.integers(min_value=0, max_value=100_000),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=0, max_value=5_000),
)
def test_largest_remainder_properties(weights, k):
    """Largest-remainder invariants on ANY input: the budget closes
    exactly (when any weight is positive), every allocation is within
    one unit of its exact proportional share, and zero-weight strata get
    exactly zero."""
    alloc = _largest_remainder(weights, k)
    tw = sum(weights.values())
    if tw == 0:
        assert all(v == 0 for v in alloc.values())
        return
    assert sum(alloc.values()) == k
    for key, w in weights.items():
        exact = k * w / tw
        assert exact - 1 < alloc[key] < exact + 1
        if w == 0:
            assert alloc[key] == 0


def test_abc_classification_matches_bruteforce(spark):
    """parts_abc_classification: exact e4 revenue, the DESC ordered
    cumulative, and the 80/95 class boundaries recomputed in plain
    Python."""
    import math
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table(
        "lineitem",
        ["l_partkey", "CAST(round(10000 * l_extendedprice * (1 - l_discount)) AS BIGINT) AS e4"],
    )
    rev = defaultdict(int)
    for pk, e4 in rows:
        rev[pk] += e4
    total = sum(rev.values())
    cum = 0
    agg = defaultdict(lambda: [0, 0])
    for pk, r in sorted(rev.items(), key=lambda kv: (-kv[1], kv[0])):
        cum += r
        cls = "A" if cum * 100 <= 80 * total else "B" if cum * 100 <= 95 * total else "C"
        agg[cls][0] += 1
        agg[cls][1] += r
    expect = {c: tuple(v) for c, v in agg.items()}
    got = {
        r.abc_class: (r.n_parts, r.revenue_e4)
        for r in REGISTRY["parts_abc_classification"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_langid_confusion_matches_bruteforce(spark):
    """text_langid_confusion: the integer decision boundary recomputed in
    plain Python per document."""
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    stop = {"the", "a", "of", "and", "to", "in", "is", "it"}
    rows = _smoke_table("documents", ["text", "lang"])
    mat = Counter()
    for text, lang in rows:
        toks = text.lower().strip().split()
        hits = sum(1 for t in toks if t in stop)
        pred = "en" if toks and 100 * hits >= 5 * len(toks) else "unk"
        mat[(pred, lang)] += 1
    got = {
        (r.pred_lang, r.actual_lang): r.n_docs
        for r in REGISTRY["text_langid_confusion"].fn(spark, SF_SMOKE).collect()
    }
    assert got == dict(mat)


def test_partition_gini_matches_bruteforce(spark):
    """lake_partition_size_gini: the sorted-rank Gini formula recomputed
    in plain Python integers; also sanity-pins the metric's range."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["lang", "source", "n_chars"])
    sz = defaultdict(int)
    for lang, src, nc in rows:
        sz[(lang, src)] += nc
    xs = [v for _, v in sorted(sz.items(), key=lambda kv: (kv[1], kv[0]))]
    n, t = len(xs), sum(xs)
    gini = (1_000_000 * (2 * sum(i * x for i, x in enumerate(xs, 1)) - (n + 1) * t)) // (
        n * t
    )
    assert 0 <= gini < 1_000_000
    r = REGISTRY["lake_partition_size_gini"].fn(spark, SF_SMOKE).collect()
    assert len(r) == 1
    assert (r[0].n_partitions, r[0].total_chars, r[0].gini_ppm) == (n, t, gini)


def test_ks_two_sample_matches_bruteforce(spark):
    """stats_ks_two_sample: the KS sup-distance in integer ppm recomputed
    in plain Python over the pooled cent-value grid."""
    import math
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("orders", ["o_orderpriority", "o_totalprice"])
    na = defaultdict(int)
    nb = defaultdict(int)
    for pri, price in rows:
        v = math.floor(100 * price + 0.5)  # Spark HALF_UP for positives
        if pri == "1-URGENT":
            na[v] += 1
        elif pri == "5-LOW":
            nb[v] += 1
    ta, tb = sum(na.values()), sum(nb.values())
    ca = cb = dmax = 0
    for v in sorted(set(na) | set(nb)):
        ca += na.get(v, 0)
        cb += nb.get(v, 0)
        dmax = max(dmax, abs(ca * tb - cb * ta))
    r = REGISTRY["stats_ks_two_sample"].fn(spark, SF_SMOKE).collect()
    assert len(r) == 1
    assert (r[0].n_a, r[0].n_b, r[0].ks_ppm) == (
        ta,
        tb,
        (1_000_000 * dmax) // (ta * tb),
    )


def test_mann_whitney_u_matches_bruteforce(spark):
    """stats_mann_whitney_u: U, ties, and the exact-integer z² recomputed
    independently via classic MIDRANKS over the pooled sorted sample (the
    engine derives ranks from grid cumulatives — different route, same
    statistic)."""
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table(
        "lineitem",
        ["l_returnflag", "CAST(l_quantity AS BIGINT)"],
    )
    sample = [(v, fl) for fl, v in rows if fl in ("R", "A")]
    pooled = sorted(v for v, _ in sample)
    # midrank (x2 to stay integer) of each distinct value
    rank_x2, i = {}, 0
    for v, t in sorted(Counter(pooled).items()):
        rank_x2[v] = 2 * i + t + 1  # positions i+1 .. i+t, avg doubled
        i += t
    n_a = sum(1 for _, fl in sample if fl == "R")
    n_b = len(sample) - n_a
    r_a_x2 = sum(rank_x2[v] for v, fl in sample if fl == "R")
    u_a_x2 = r_a_x2 - n_a * (n_a + 1)
    ties = Counter(pooled)
    tie_cubes = sum(t**3 - t for t in ties.values())
    nn = n_a + n_b
    num = 1_000_000 * 3 * (u_a_x2 - n_a * n_b) ** 2 * nn * (nn - 1)
    den = n_a * n_b * ((nn + 1) * nn * (nn - 1) - tie_cubes)
    r = REGISTRY["stats_mann_whitney_u"].fn(spark, SF_SMOKE).collect()
    assert len(r) == 1
    assert (r[0].n_a, r[0].n_b, r[0].u_a_x2, r[0].tie_cubes) == (
        n_a,
        n_b,
        u_a_x2,
        tie_cubes,
    )
    assert r[0].z2_e6 == (0 if den == 0 else num // den)
    assert r[0].significant == (den > 0 and num >= 3841459 * den)


def test_chi2_independence_matches_bruteforce(spark):
    """stats_chi2_independence: every contingency cell's exact-integer
    expected count and χ² contribution recomputed in plain Python."""
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("events", ["event_type", "ts"])
    obs = Counter((et, ts.isoweekday()) for et, ts in rows)
    r_tot = Counter()
    c_tot = Counter()
    for (et, dw), o in obs.items():
        r_tot[et] += o
        c_tot[dw] += o
    n = sum(obs.values())
    expect = {
        (et, dw): (
            o,
            (1_000_000 * r_tot[et] * c_tot[dw]) // n,
            (1_000_000 * (o * n - r_tot[et] * c_tot[dw]) ** 2)
            // (n * r_tot[et] * c_tot[dw]),
        )
        for (et, dw), o in obs.items()
    }
    got = {
        (r.event_type, r.dow): (r.o_count, r.exp_e6, r.chi_e6)
        for r in REGISTRY["stats_chi2_independence"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_stump_split_gini_matches_bruteforce(spark):
    """stats_stump_split_gini: per-threshold weighted Gini impurity in
    exact micro-units recomputed by direct (non-cumulative) partitioning
    of the label counts at each threshold."""
    import math
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("lineitem", ["l_returnflag", "l_discount"])
    data = [
        (math.floor(100 * d + 0.5), 1 if fl == "R" else 0) for fl, d in rows
    ]
    pos_t = sum(p for _, p in data)
    neg_t = len(data) - pos_t
    nn = pos_t + neg_t
    expect = {}
    for thr in sorted({t for t, _ in data}):
        pos_l = sum(p for t, p in data if t <= thr)
        n_l = sum(1 for t, _ in data if t <= thr)
        neg_l = n_l - pos_l
        n_r = nn - n_l
        if n_r == 0:
            continue
        pos_r, neg_r = pos_t - pos_l, neg_t - neg_l
        num = 1_000_000 * (
            (n_l * n_l - pos_l * pos_l - neg_l * neg_l) * n_r
            + (n_r * n_r - pos_r * pos_r - neg_r * neg_r) * n_l
        )
        expect[thr] = (
            n_l,
            n_r,
            pos_l,
            num // (nn * n_l * n_r),
            (1_000_000 * (nn * nn - pos_t * pos_t - neg_t * neg_t)) // (nn * nn),
        )
    got = {
        r.thr_e2: (r.n_left, r.n_right, r.pos_left, r.split_gini_e6, r.parent_gini_e6)
        for r in REGISTRY["stats_stump_split_gini"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_pareto_frontier_matches_bruteforce(spark):
    """curation_pareto_frontier: the engine's sort-based skyline vs the
    O(n²) dominance definition recomputed directly in Python."""
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["doc_id", "n_chars", "text"])
    pts = [
        (did, nc, len(set(txt.strip().lower().split())))
        for did, nc, txt in rows
    ]
    expect = {
        (did, x, y)
        for did, x, y in pts
        if not any(
            bx >= x and by >= y and (bx > x or by > y) for _, bx, by in pts
        )
    }
    got = {
        (r.doc_id, r.n_chars, r.n_types)
        for r in REGISTRY["curation_pareto_frontier"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_weekly_stickiness_matches_bruteforce(spark):
    """events_weekly_stickiness: DAU/WAU ppm arithmetic recomputed from
    raw (user, day) pairs in plain Python."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("events", ["user_id", "ts"])
    pairs = {(u, ts.date()) for u, ts in rows}
    byweek = defaultdict(lambda: [0, set(), set()])
    for u, d in pairs:
        wk = d.isocalendar()[1]
        byweek[wk][0] += 1
        byweek[wk][1].add(d)
        byweek[wk][2].add(u)
    expect = {
        wk: (
            len(days),
            ud,
            len(users),
            (1_000_000 * ud) // (len(days) * len(users)),
        )
        for wk, (ud, days, users) in byweek.items()
    }
    got = {
        r.iso_week: (r.n_days, r.user_days, r.wau, r.stickiness_ppm)
        for r in REGISTRY["events_weekly_stickiness"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_time_to_convert_matches_bruteforce(spark):
    """events_time_to_convert: first-view → first-subsequent-purchase
    deltas recomputed per user with exact microsecond timedeltas."""
    from collections import Counter, defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("events", ["user_id", "event_type", "ts"])
    views = defaultdict(list)
    purchases = defaultdict(list)
    for u, et, ts in rows:
        if et == "view":
            views[u].append(ts)
        elif et == "purchase":
            purchases[u].append(ts)
    hist = Counter()
    for u, vs in views.items():
        fv = min(vs)
        after = [p for p in purchases.get(u, []) if p >= fv]
        if after:
            td = min(after) - fv
            delta_us = (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds
            hist[delta_us // 3_600_000_000] += 1
    got = {
        r.hours_to_convert: r.n_users
        for r in REGISTRY["events_time_to_convert"].fn(spark, SF_SMOKE).collect()
    }
    assert got == dict(hist)


def test_bitmap_distinct_matches_bruteforce(spark):
    """agg_bitmap_distinct: both the bitmap count and the direct count
    must equal the true set-based distinct per event type."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("events", ["event_type", "user_id"])
    users = defaultdict(set)
    for et, u in rows:
        users[et].add(u)
    expect = {et: len(s) for et, s in users.items()}
    out = REGISTRY["agg_bitmap_distinct"].fn(spark, SF_SMOKE).collect()
    assert {r.event_type: r.n_distinct_bitmap for r in out} == expect
    assert {r.event_type: r.n_distinct_direct for r in out} == expect


def test_theil_sen_matches_bruteforce(spark):
    """stats_theil_sen_slope: all pairwise floor-slopes and the exact
    rank-median recomputed in plain Python (Python // IS floor, so this
    independently checks the engine's pmod identity AND the oracle's
    explicit floor rewrite on negative slopes)."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    import math

    orders = _smoke_table("orders", ["o_custkey", "o_orderdate", "o_totalprice"])
    cust = dict(_smoke_table("customer", ["c_custkey", "c_nationkey"]))
    nation = dict(_smoke_table("nation", ["n_nationkey", "n_name"]))
    yearly = defaultdict(int)
    for ck, od, tp in orders:
        yearly[(cust[ck], od.year)] += math.floor(100 * tp + 0.5)
    by_nk = defaultdict(dict)
    for (nk, yr), rev in yearly.items():
        by_nk[nk][yr] = rev
    expect = {}
    for nk, years in by_nk.items():
        ys = sorted(years)
        slopes = sorted(
            (years[y2] - years[y1]) // (y2 - y1)
            for i, y1 in enumerate(ys)
            for y2 in ys[i + 1 :]
        )
        if slopes:
            expect[nation[nk]] = (len(slopes), slopes[(len(slopes) + 1) // 2 - 1])
    got = {
        r.n_name: (r.n_pairs, r.median_slope_e2)
        for r in REGISTRY["stats_theil_sen_slope"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert any(v[1] < 0 for v in expect.values()), "floor seam unexercised"


def test_runs_test_matches_bruteforce(spark):
    """stats_runs_test: median, run count, and the exact-integer z²
    recomputed directly from the daily sequence in plain Python."""
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("orders", ["CAST(o_orderdate AS DATE)"])
    daily = Counter(d for (d,) in rows)
    counts = sorted(daily.values())
    med = counts[(len(counts) + 1) // 2 - 1]
    seq = [daily[d] > med for d in sorted(daily) if daily[d] != med]
    n1 = sum(seq)
    n2 = len(seq) - n1
    runs = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
    nn = n1 + n2
    num = 1_000_000 * ((runs - 1) * nn - 2 * n1 * n2) ** 2 * (nn - 1)
    den = 2 * n1 * n2 * (2 * n1 * n2 - nn)
    r = REGISTRY["stats_runs_test"].fn(spark, SF_SMOKE).collect()
    assert len(r) == 1
    assert (r[0].n_above, r[0].n_below, r[0].n_runs) == (n1, n2, runs)
    assert r[0].z2_e6 == (0 if den == 0 else num // den)
    assert r[0].significant == (den > 0 and num >= 3841459 * den)


def test_hill_tail_index_matches_bruteforce(spark):
    """corpus_tail_index_hill: the adaptive k, the tail boundary, and α
    recomputed from the sorted lengths in plain Python."""
    import math

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["n_chars"])
    xs = sorted((nc for (nc,) in rows if nc > 0), reverse=True)
    k = min(100, len(xs) // 5)
    xk1 = xs[k]
    lsum = sum(math.log(x / xk1) for x in xs[:k])
    r = REGISTRY["corpus_tail_index_hill"].fn(spark, SF_SMOKE).collect()
    assert len(r) == 1
    assert (r[0].k, r[0].x_tail_min) == (k, xk1)
    if lsum > 0:
        assert abs(r[0].alpha_r6 - k / lsum) < 2e-6
    else:
        assert r[0].alpha_r6 is None


def test_intra_label_diversity_matches_bruteforce(spark):
    """embed_intra_label_diversity: the centroid identity's output must
    equal the LITERAL O(n²) pairwise-dot average, computed directly —
    the identity itself is what this pin certifies."""
    import math
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("embeddings", ["label", "embedding"])

    def q(x):
        # HALF_UP away from zero (Spark/DuckDB round): at the 2^20 scale
        # float32 components land on exact .5 boundaries ~1.5% of the
        # time, so a floor(v+0.5) replica diverges on negative components
        v = float(x) * 1048576
        return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)

    by_label = defaultdict(list)
    for lab, emb in rows:
        by_label[lab].append([q(x) for x in emb])
    expect = {}
    for lab, vecs in sorted(by_label.items()):
        n = len(vecs)
        if n <= 1:
            continue
        selfs = [sum(c * c for c in v) for v in vecs]
        pair = sum(
            sum(a * b for a, b in zip(vecs[i], vecs[j]))
            for i in range(n)
            for j in range(n)
            if i != j
        )
        expect[lab] = (n, sum(selfs) // n, pair // (n * (n - 1)))
    got = {
        r.label: (r.n_vecs, r.avg_self_q, r.avg_pair_dot_q)
        for r in REGISTRY["embed_intra_label_diversity"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert any(v[2] < 0 for v in expect.values()), "negative-dot floor seam unexercised"


def test_cohens_kappa_matches_bruteforce(spark):
    """stats_cohens_kappa: both raters, the 2x2 table, and the exact
    shifted-floor κ recomputed in plain Python (the fixture κ is
    negative, so the floor-of-negative seam is live)."""
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["text"])
    stop = {"the", "a", "of", "and", "to", "in", "is", "it"}
    n = n11 = n00 = r1 = c1 = 0
    for (txt,) in rows:
        t = txt.strip()
        toks = t.lower().split(" ")
        ra = 1 if len(toks) > 0 and 100 * sum(1 for w in toks if w in stop) >= 5 * len(toks) else 0
        rb = 1 if len(t) > 0 and 6 * len(toks) >= len(t) else 0
        n += 1
        n11 += ra & rb
        n00 += (1 - ra) & (1 - rb)
        r1 += ra
        c1 += rb
    num = 1_000_000 * (n * (n11 + n00) - r1 * c1 - (n - r1) * (n - c1))
    den = n * n - r1 * c1 - (n - r1) * (n - c1)
    kappa = 0 if den == 0 else num // den  # Python // IS floor
    r = REGISTRY["stats_cohens_kappa"].fn(spark, SF_SMOKE).collect()
    assert len(r) == 1
    assert (r[0].n, r[0].n11, r[0].n00, r[0].r1, r[0].c1, r[0].kappa_e6) == (
        n,
        n11,
        n00,
        r1,
        c1,
        kappa,
    )
    assert kappa < 0, "negative-kappa floor seam unexercised"


def test_sequence_motifs_matches_bruteforce(spark):
    """events_sequence_motifs: trigram extraction in (ts, event_id)
    order and the deterministic top-20 cut recomputed in Python."""
    from collections import Counter, defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("events", ["user_id", "event_type", "ts", "event_id"])
    by_user = defaultdict(list)
    for u, et, ts, eid in rows:
        by_user[u].append((ts, eid, et))
    occ = Counter()
    users = defaultdict(set)
    for u, evs in by_user.items():
        seq = [et for _, _, et in sorted(evs)]
        for i in range(len(seq) - 2):
            m = f"{seq[i]}>{seq[i+1]}>{seq[i+2]}"
            occ[m] += 1
            users[m].add(u)
    top = sorted(occ, key=lambda m: (-occ[m], m))[:20]
    expect = [(m, occ[m], len(users[m])) for m in top]
    got = [
        (r.motif, r.n_occurrences, r.n_users)
        for r in REGISTRY["events_sequence_motifs"].fn(spark, SF_SMOKE).collect()
    ]
    assert got == expect


def test_otif_rate_matches_bruteforce(spark):
    """orders_otif_rate: the all-lines-on-time conjunction and ppm rate
    recomputed per order in Python with exact timedeltas."""
    import datetime
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    orders = {
        ok: (pri, od)
        for ok, pri, od in _smoke_table(
            "orders", ["o_orderkey", "o_orderpriority", "o_orderdate"]
        )
    }
    lines = defaultdict(list)
    for ok, sd in _smoke_table("lineitem", ["l_orderkey", "l_shipdate"]):
        lines[ok].append(sd)
    per_pri = defaultdict(lambda: [0, 0])
    for ok, sds in lines.items():
        pri, od = orders[ok]
        otif = all(sd <= od + datetime.timedelta(days=60) for sd in sds)
        per_pri[pri][0] += 1
        per_pri[pri][1] += int(otif)
    expect = {
        pri: (tot, ot, (1_000_000 * ot) // tot)
        for pri, (tot, ot) in per_pri.items()
    }
    got = {
        r.o_orderpriority: (r.n_orders, r.n_otif, r.otif_ppm)
        for r in REGISTRY["orders_otif_rate"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_class_balanced_matches_bruteforce(spark):
    """sample_class_balanced: the engine's two-level prefix selection
    must pick EXACTLY the k smallest md5 ranks per class — recomputed by
    whole-class sorting in Python (count AND char-sum compared)."""
    import hashlib
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["lang", "n_chars", "doc_id"])
    by_lang = defaultdict(list)
    for lang, nc, did in rows:
        hv = int(hashlib.md5(f"bal:{did}".encode()).hexdigest()[:15], 16)
        by_lang[lang].append((hv, did, nc))
    k = min(len(v) for v in by_lang.values())
    expect = {}
    for lang, v in by_lang.items():
        kept = sorted(v)[:k]
        expect[lang] = (k, sum(nc for _, _, nc in kept))
    got = {
        r.lang: (r.n_kept, r.sum_chars)
        for r in REGISTRY["sample_class_balanced"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_filter_waterfall_matches_bruteforce(spark):
    """corpus_filter_waterfall: all four gates and both the standalone
    and cumulative pass counts recomputed per document in Python."""
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["text", "n_chars"])
    p = [0, 0, 0, 0]
    c = [0, 0, 0, 0]
    for txt, nc in rows:
        toks = txt.strip().lower().split()
        g = [
            txt.strip() != "",
            nc >= 100,
            len(toks) >= 20,
            len(toks) <= len(set(toks)) * 2,
        ]
        cum = True
        for i, gi in enumerate(g):
            p[i] += gi
            cum = cum and gi
            c[i] += cum
    expect = {
        (1, "nonempty"): (p[0], c[0]),
        (2, "min_chars_100"): (p[1], c[1]),
        (3, "min_tokens_20"): (p[2], c[2]),
        (4, "repetition_2x"): (p[3], c[3]),
    }
    got = {
        (r.stage, r.gate): (r.n_pass_alone, r.n_pass_cumulative)
        for r in REGISTRY["corpus_filter_waterfall"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_customers_gini_matches_bruteforce(spark):
    """customers_revenue_gini: the sorted-rank Gini recomputed by
    literally sorting every customer's revenue in Python — certifying
    the tie-block identity the engine uses instead of a global sort."""
    import math
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("orders", ["o_custkey", "o_totalprice"])
    rev = defaultdict(int)
    for ck, tp in rows:
        rev[ck] += math.floor(100 * tp + 0.5)
    xs = sorted(rev.values())
    n, t = len(xs), sum(xs)
    s2 = 2 * sum(i * x for i, x in enumerate(xs, 1))
    gini = (1_000_000 * (s2 - (n + 1) * t)) // (n * t)
    r = REGISTRY["customers_revenue_gini"].fn(spark, SF_SMOKE).collect()
    assert len(r) == 1
    assert (r[0].n_customers, r[0].total_rev_e2, r[0].gini_ppm) == (n, t, gini)


def test_autocorr_lag1_matches_bruteforce(spark):
    """stats_autocorr_lag1: the mean-cleared integer ACF recomputed
    directly from the daily sequence in Python."""
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("orders", ["CAST(o_orderdate AS DATE)"])
    daily = Counter(d for (d,) in rows)
    xs = [daily[d] for d in sorted(daily)]
    m, s = len(xs), sum(xs)
    num = sum((m * a - s) * (m * b - s) for a, b in zip(xs, xs[1:]))
    den = sum((m * a - s) ** 2 for a in xs)
    r1 = 0 if den == 0 else (1_000_000 * num + 2_000_000 * den) // den - 2_000_000
    r = REGISTRY["stats_autocorr_lag1"].fn(spark, SF_SMOKE).collect()
    assert len(r) == 1
    assert (r[0].n_days, r[0].n_pairs, r[0].r1_e6) == (m, m - 1, r1)


def test_segment_transitions_matches_bruteforce(spark):
    """customers_segment_transitions: per-customer yearly banding and
    consecutive-year pairing recomputed in Python."""
    import math
    from collections import Counter, defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("orders", ["o_custkey", "o_orderdate", "o_totalprice"])
    spend = defaultdict(int)
    for ck, od, tp in rows:
        spend[(ck, od.year)] += math.floor(100 * tp + 0.5)

    def band(v):
        return "high" if v >= 20_000_000 else "mid" if v >= 5_000_000 else "low"

    by_cust = defaultdict(dict)
    for (ck, yr), v in spend.items():
        by_cust[ck][yr] = band(v)
    trans = Counter()
    for ck, years in by_cust.items():
        for yr in sorted(years):
            if yr + 1 in years:
                trans[(years[yr], years[yr + 1])] += 1
    got = {
        (r.seg_from, r.seg_to): r.n_customers
        for r in REGISTRY["customers_segment_transitions"].fn(spark, SF_SMOKE).collect()
    }
    assert got == dict(trans)


def test_spearman_rho_matches_bruteforce(spark):
    """stats_spearman_rho: midranks via classic sorted assignment (the
    engine derives them from grid cumulatives — different route), then
    the exact integer Pearson pieces and ρ recomputed in Python; also
    cross-checked against the closed-form Spearman on midranks."""
    import math
    from collections import Counter, defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("orders", ["o_custkey", "o_totalprice"])
    agg = defaultdict(lambda: [0, 0])
    for ck, tp in rows:
        agg[ck][0] += 1
        agg[ck][1] += math.floor(100 * tp + 0.5)

    def midrank2(values):
        rank, i = {}, 0
        for v, t in sorted(Counter(values).items()):
            rank[v] = 2 * i + t + 1
            i += t
        return rank

    avals = [a for a, _ in agg.values()]
    bvals = [b for _, b in agg.values()]
    ra, rb = midrank2(avals), midrank2(bvals)
    xy = [(ra[a], rb[b]) for a, b in agg.values()]
    n = len(xy)
    sxy = sum(x * y for x, y in xy)
    sx = sum(x for x, _ in xy)
    sy = sum(y for _, y in xy)
    sxx = sum(x * x for x, _ in xy)
    syy = sum(y * y for _, y in xy)
    num, d1, d2 = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    r = REGISTRY["stats_spearman_rho"].fn(spark, SF_SMOKE).collect()
    assert len(r) == 1
    assert (r[0].n_customers, r[0].num, r[0].d1, r[0].d2) == (n, num, d1, d2)
    if d1 and d2:
        assert abs(r[0].rho_r6 - num / math.sqrt(d1 * d2)) < 2e-6
    # midrank sums are an invariant of the construction
    assert sx == n * (n + 1) and sy == n * (n + 1)


def test_cusum_changepoint_matches_bruteforce(spark):
    """stats_cusum_changepoint: the mean-cleared integer CUSUM walk,
    its peak, and the earliest-date argmax recomputed in Python."""
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("orders", ["CAST(o_orderdate AS DATE)"])
    daily = Counter(d for (d,) in rows)
    days = sorted(daily)
    m, s = len(days), sum(daily.values())
    cu, best = 0, None
    for d in days:
        cu += m * daily[d] - s
        a = abs(cu)
        if best is None or a > best[0]:
            best = (a, d)
    assert cu == 0  # the walk closes by construction
    peak, cp = best
    r = REGISTRY["stats_cusum_changepoint"].fn(spark, SF_SMOKE).collect()
    assert len(r) == 1
    assert (r[0].n_days, r[0].cp_date, r[0].peak_abs, r[0].peak_ppm) == (
        m,
        cp,
        peak,
        (1_000_000 * peak) // (m * s),
    )


def test_poisson_dispersion_matches_bruteforce(spark):
    """stats_poisson_dispersion: D = (nΣx²−(Σx)²)/((n−1)Σx) per event
    type recomputed from the raw events in Python."""
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("events", ["event_type", "CAST(ts AS DATE)"])
    daily = Counter(rows)
    expect = {}
    for et in {t for t, _ in daily}:
        xs = [c for (t, _), c in daily.items() if t == et]
        n, sx, sxx = len(xs), sum(xs), sum(x * x for x in xs)
        disp = 0
        if n > 1 and sx > 0:
            disp = (1_000_000 * (n * sxx - sx * sx)) // ((n - 1) * sx)
        expect[et] = (n, (1_000_000 * sx) // n, disp)
    got = {
        r.event_type: (r.n_days, r.mean_ppm, r.disp_ppm)
        for r in REGISTRY["stats_poisson_dispersion"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect
    # the fixture's traffic is genuinely clumped for at least one type
    assert any(d > 1_000_000 for _, _, d in expect.values())


def test_simpson_diversity_matches_bruteforce(spark):
    """corpus_simpson_diversity: the without-replacement collision
    probability and its complement recomputed per source in Python."""
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["source", "lang"])
    cell = Counter(rows)
    expect = {}
    for src in {s for s, _ in cell}:
        cs = [c for (s, _), c in cell.items() if s == src]
        n, pairs = sum(cs), sum(c * (c - 1) for c in cs)
        simpson = (
            (1_000_000 * pairs) // (n * (n - 1)) if n > 1 else 1_000_000
        )
        gini = (
            (1_000_000 * (n * (n - 1) - pairs)) // (n * (n - 1))
            if n > 1
            else 0
        )
        expect[src] = (n, len(cs), simpson, gini)
    got = {
        r.source: (r.n_docs, r.n_langs, r.simpson_ppm, r.gini_simpson_ppm)
        for r in REGISTRY["corpus_simpson_diversity"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_kruskal_wallis_matches_bruteforce(spark):
    """stats_kruskal_wallis: pooled midranks, per-priority doubled rank
    sums, and the floored micro-unit H' decomposition recomputed from
    the raw orders in Python. Also asserts the rank-sum closure
    invariant Σ_g R_g_x2 = N(N+1)."""
    from collections import Counter, defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table(
        "orders", ["CAST(round(100 * o_totalprice) AS BIGINT)", "o_orderpriority"]
    )
    cnt = Counter(v for v, _ in rows)
    cum, mid = 0, {}
    for v in sorted(cnt):
        cum += cnt[v]
        mid[v] = 2 * cum - cnt[v] + 1
    r_x2, n_g = defaultdict(int), Counter(p for _, p in rows)
    for v, p in rows:
        r_x2[p] += mid[v]
    n = len(rows)
    tie = sum(c * c * c - c for c in cnt.values())
    dd = n * n * n - n - tie
    assert sum(r_x2.values()) == n * (n + 1)
    got = {
        r.pri: (
            r.n_g, r.r_x2, r.rmean_e6, r.contrib_e6, r.base_e6,
            r.n_total, r.tie_cubes,
        )
        for r in REGISTRY["stats_kruskal_wallis"].fn(spark, SF_SMOKE).collect()
    }
    base = (1_000_000 * 3 * (n - 1) * n * (n + 1) * (n + 1)) // dd
    expect = {
        p: (
            n_g[p],
            r_x2[p],
            (1_000_000 * r_x2[p]) // (2 * n_g[p]),
            (1_000_000 * 3 * (n - 1) * r_x2[p] * r_x2[p]) // (n_g[p] * dd),
            base,
            n,
            tie,
        )
        for p in n_g
    }
    assert got == expect


def test_wilson_ci_matches_bruteforce(spark):
    """stats_wilson_ci: both Wilson bounds recomputed per language with
    Python's exact math.isqrt and integer floors (z²·1e6 = 3841600)."""
    import math
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["lang", "n_chars"])
    n = Counter(lang for lang, _ in rows)
    s = Counter(lang for lang, nc in rows if nc >= 200)
    U = 3841600
    expect = {}
    for lang in n:
        nn, ss = n[lang], s[lang]
        rt = math.isqrt(U * nn * (U * nn + 4_000_000 * ss * (nn - ss)))
        den = 2 * nn * (1_000_000 * nn + U)
        expect[lang] = (
            nn,
            ss,
            (1_000_000 * ss) // nn,
            (1_000_000 * ((2_000_000 * ss + U) * nn - rt)) // den,
            (1_000_000 * ((2_000_000 * ss + U) * nn + rt)) // den,
        )
    got = {
        r.lang: (r.n_docs, r.n_pass, r.p_ppm, r.wilson_low_ppm, r.wilson_high_ppm)
        for r in REGISTRY["stats_wilson_ci"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect
    for lang, (_, _, p, lo, hi) in expect.items():
        assert 0 <= lo <= p <= hi <= 1_000_000


def test_tukey_outliers_matches_bruteforce(spark):
    """dq_tukey_outliers: percentile_disc quartiles from a plain sorted
    list, doubled-integer fences, and the per-side counts — negatives
    included."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table(
        "customer", ["c_mktsegment", "CAST(round(100 * c_acctbal) AS BIGINT)"]
    )
    by_seg = defaultdict(list)
    for seg, v in rows:
        by_seg[seg].append(v)
    expect = {}
    for seg, vs in by_seg.items():
        vs.sort()
        t = len(vs)

        def pdisc(num, den):
            for i, v in enumerate(vs, start=1):
                if den * i >= num * t:
                    return v
            raise AssertionError("unreachable")

        q1, q3 = pdisc(1, 4), pdisc(3, 4)
        low_x2, high_x2 = 5 * q1 - 3 * q3, 5 * q3 - 3 * q1
        expect[seg] = (
            t, q1, q3,
            sum(1 for v in vs if 2 * v < low_x2),
            sum(1 for v in vs if 2 * v > high_x2),
        )
    got = {
        r.c_mktsegment: (r.n_customers, r.q1_cents, r.q3_cents, r.n_low, r.n_high)
        for r in REGISTRY["dq_tukey_outliers"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_bpe_pair_counts_matches_bruteforce(spark):
    """tokenize_bpe_pair_counts: word-frequency-weighted adjacent char
    pairs with within-word multiplicity, top-30 with the lexicographic
    tie-break, recomputed in Python."""
    import re
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["text"])
    vocab = Counter()
    for (text,) in rows:
        vocab.update(re.split(r"\s+", text.strip().lower()))
    pairs = Counter()
    for w, f in vocab.items():
        for i in range(len(w) - 1):
            pairs[w[i : i + 2]] += f
    expect = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    got = [
        (r.pair, r.n)
        for r in REGISTRY["tokenize_bpe_pair_counts"].fn(spark, SF_SMOKE).collect()
    ]
    assert got == expect
    # the fixture's synthetic vocabulary has no within-word repeated
    # pair, so pin the multiplicity semantics directly: the engine's
    # position-enumerated pair expression must count 'aaa' -> 'aa' TWICE
    # (real BPE counts positions, not distinct pairs per word)
    [(pairs_of_aaa,)] = spark.sql(
        "SELECT transform(sequence(1, length('aaa') - 1),"
        " i -> substring('aaa', i, 2))"
    ).collect()
    assert list(pairs_of_aaa) == ["aa", "aa"]


def test_audience_overlap_matches_bruteforce(spark):
    """events_audience_overlap: user-set Jaccard per type pair from raw
    Python sets with the exact floored-ppm union formula."""
    from collections import defaultdict
    from itertools import combinations

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("events", ["user_id", "event_type"])
    users = defaultdict(set)
    for uid, et in rows:
        users[et].add(uid)
    expect = {}
    for ta, tb in combinations(sorted(users), 2):
        inter = len(users[ta] & users[tb])
        if inter:
            expect[(ta, tb)] = (
                len(users[ta]),
                len(users[tb]),
                inter,
                (1_000_000 * inter)
                // (len(users[ta]) + len(users[tb]) - inter),
            )
    got = {
        (r.type_a, r.type_b): (r.n_a, r.n_b, r.n_both, r.jaccard_ppm)
        for r in REGISTRY["events_audience_overlap"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_systematic_sample_matches_bruteforce(spark):
    """sample_systematic: the md5-rank order, start offset, every-20th
    selection, and the per-language id/char checksums recomputed with
    hashlib — certifying the EXACT selected set. Also asserts the
    selection-size invariant floor((N − start)/20) + 1."""
    import hashlib
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    def h15(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = _smoke_table("documents", ["doc_id", "lang", "n_chars"])
    ranked = sorted(rows, key=lambda r: (h15(f"sys{r[0]}"), r[0]))
    start = 1 + h15("sysstart") % 20
    sel = [r for pos, r in enumerate(ranked, start=1)
           if (pos - start) % 20 == 0]
    assert len(sel) == (len(ranked) - start) // 20 + 1
    expect = defaultdict(lambda: [0, 0, 0])
    for doc_id, lang, n_chars in sel:
        e = expect[lang]
        e[0] += 1
        e[1] += doc_id
        e[2] += n_chars
    got = {
        r.lang: [r.n_selected, r.id_checksum, r.char_sum]
        for r in REGISTRY["sample_systematic"].fn(spark, SF_SMOKE).collect()
    }
    assert got == dict(expect)


def test_pq_distortion_matches_bruteforce(spark):
    """embed_pq_distortion: codebook derivation (md5 % 2049 − 1024),
    floor(x·1024) quantization, argmin with centroid-id tie-break, and
    the per-subspace rollup recomputed in plain Python/hashlib."""
    import hashlib
    import math
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    def h15(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    cb = {
        (s, j, d): h15(f"pq{s}-{j}-{d}") % 2049 - 1024
        for s in range(8)
        for j in range(8)
        for d in range(8)
    }
    rows = _smoke_table("embeddings", ["vec_id", "embedding"])
    agg = defaultdict(lambda: [0, 0, set()])
    for vec_id, emb in rows:
        q = [math.floor(float(x) * 1024) for x in emb]
        for s in range(8):
            best = min(
                (
                    sum(
                        (q[s * 8 + d] - cb[(s, j, d)]) ** 2
                        for d in range(8)
                    ),
                    j,
                )
                for j in range(8)
            )
            a = agg[s]
            a[0] += 1
            a[1] += best[0]
            a[2].add(best[1])
    expect = {s: (a[0], a[1], len(a[2])) for s, a in agg.items()}
    got = {
        r.subspace: (r.n_vectors, r.sum_distortion, r.n_codes_used)
        for r in REGISTRY["embed_pq_distortion"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_benjamini_hochberg_matches_bruteforce(spark):
    """stats_benjamini_hochberg: arms, per-type conversion counts, the
    exact micro-unit z², the critical-value p-ladder, and the integer
    BH step-up recomputed in Python."""
    import hashlib
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    def h15(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = _smoke_table("events", ["user_id", "event_type"])
    users = {uid for uid, _ in rows}
    arm = {uid: h15(f"bh{uid}") % 2 for uid in users}
    n_a = sum(1 for g in arm.values() if g == 0)
    n_b = len(users) - n_a
    conv = defaultdict(set)
    for uid, et in rows:
        conv[et].add(uid)
    ladder = [
        (10827566, 1000), (7879439, 5000), (6634897, 10000),
        (5023886, 25000), (3841459, 50000), (2705543, 100000),
    ]
    stats = {}
    for et, us in conv.items():
        c_a = sum(1 for u in us if arm[u] == 0)
        c_b = len(us) - c_a
        c, n = c_a + c_b, n_a + n_b
        z2 = 0
        if 0 < c < n:
            z2 = (1_000_000 * (c_a * n_b - c_b * n_a) ** 2 * n) // (
                n_a * n_b * c * (n - c)
            )
        p = next((pp for thr, pp in ladder if z2 >= thr), 1_000_000)
        stats[et] = (c_a, c_b, z2, p)
    m = len(stats)
    ranked = sorted(stats.items(), key=lambda kv: (kv[1][3], kv[0]))
    k_max = max(
        (rk for rk, (_, (_, _, _, p)) in enumerate(ranked, 1)
         if p * m <= rk * 50000),
        default=0,
    )
    expect = {}
    for rk, (et, (c_a, c_b, z2, p)) in enumerate(ranked, 1):
        expect[et] = (n_a, n_b, c_a, c_b, z2, p, rk, rk <= k_max)
    got = {
        r.event_type: (
            r.n_a, r.n_b, r.c_a, r.c_b, r.z2_e6, r.p_ppm, r.rk, r.bh_rejected
        )
        for r in REGISTRY["stats_benjamini_hochberg"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


@pytest.mark.nightly  # heavyweight replay: default tier must fit the driver's verify budget (r15)
def test_ivf_probe_curve_matches_bruteforce(spark):
    """sim_ivf_probe_curve: the full IVF pipeline (centroids,
    assignments, probes, per-bucket top-5) and recall vs the exact top-5
    recomputed in numpy at each probe count; recall must be monotone
    non-decreasing in n_probe (superset candidate sets)."""
    import numpy as np

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("embeddings", ["vec_id", "embedding"])
    ids = np.array([r[0] for r in rows])
    X = np.array([r[1] for r in rows], dtype=np.float64)
    nrm = np.sqrt((X * X).sum(axis=1))

    def cos(i, j):
        return round(float(X[i] @ X[j] / (nrm[i] * nrm[j])), 6)

    idx = {v: i for i, v in enumerate(ids)}
    cents = sorted(v for v in ids if v % 100 == 0)
    # assignments: nearest centroid, tie by centroid id
    assign = {}
    for v in ids:
        best = max(((cos(idx[v], idx[c]), -c) for c in cents))
        assign[v] = -best[1]
    buckets = {}
    for v, c in assign.items():
        buckets.setdefault(c, []).append(v)
    qids = sorted(v for v in ids if v < 10)
    exact = {}
    for q in qids:
        scored = sorted(
            ((cos(idx[q], idx[x]), -x) for x in ids if x != q), reverse=True
        )[:5]
        exact[q] = {-s[1] for s in scored}
    n_pairs = sum(len(s) for s in exact.values())
    prev = -1
    for np_probe in (1, 2, 4):
        hits = 0
        for q in qids:
            probes = sorted(
                ((cos(idx[q], idx[c]), -c) for c in cents), reverse=True
            )[:np_probe]
            cand = [
                x
                for _, negc in probes
                for x in buckets.get(-negc, [])
                if x != q
            ]
            topk = sorted(((cos(idx[q], idx[x]), -x) for x in cand),
                          reverse=True)[:5]
            hits += len({-t[1] for t in topk} & exact[q])
        got = [
            r
            for r in REGISTRY["sim_ivf_probe_curve"].fn(spark, SF_SMOKE).collect()
            if r.n_probe == np_probe
        ]
        assert len(got) == 1
        r = got[0]
        assert (r.n_queries, r.n_hits, r.recall_ppm) == (
            len(qids),
            hits,
            (hits * 1_000_000) // n_pairs,
        )
        assert r.recall_ppm >= prev  # monotone in n_probe
        prev = r.recall_ppm


def test_backlog_aging_matches_bruteforce(spark):
    """orders_backlog_aging: reference date, integer day ages, inclusive
    bucket boundaries, and exact cents totals recomputed in Python."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table(
        "orders",
        [
            "CAST(o_orderdate AS DATE)",
            "o_orderstatus",
            "CAST(round(100 * o_totalprice) AS BIGINT)",
        ],
    )
    ref = max(d for d, _, _ in rows)
    agg = defaultdict(lambda: [0, 0])
    for d, st, cents in rows:
        if st == "F":
            continue
        age = (ref - d).days
        b = "0-30" if age <= 30 else "31-60" if age <= 60 else \
            "61-90" if age <= 90 else "90+"
        agg[b][0] += 1
        agg[b][1] += cents
    got = {
        r.age_bucket: [r.n_orders, r.open_cents]
        for r in REGISTRY["orders_backlog_aging"].fn(spark, SF_SMOKE).collect()
    }
    assert got == {b: list(v) for b, v in agg.items()}


def test_kendall_tau_matches_bruteforce(spark):
    """stats_kendall_tau: concordant/discordant/tie pair counts over
    the per-nation aggregate and the shifted-floor τ-b recomputed in
    Python with math.isqrt; |τ-b| ≤ 1 asserted."""
    import math
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    orders = _smoke_table(
        "orders", ["o_custkey", "CAST(round(100 * o_totalprice) AS BIGINT)"]
    )
    cust = dict(_smoke_table("customer", ["c_custkey", "c_nationkey"]))
    per_nation = defaultdict(lambda: [0, 0])
    for ck, cents in orders:
        nk = cust[ck]
        per_nation[nk][0] += cents
        per_nation[nk][1] += 1
    pts = [tuple(v) for _, v in sorted(per_nation.items())]
    C = D = tx = ty = n_pairs = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            n_pairs += 1
            dx = pts[i][0] - pts[j][0]
            dy = pts[i][1] - pts[j][1]
            if dx * dy > 0:
                C += 1
            elif dx * dy < 0:
                D += 1
            elif dx == 0 and dy != 0:
                tx += 1
            elif dy == 0 and dx != 0:
                ty += 1
    den2 = (n_pairs - tx) * (n_pairs - ty)
    rt = math.isqrt(den2)
    tau = 0 if rt == 0 else (1_000_000 * (C - D) + 2_000_000 * rt) // rt - 2_000_000
    r = REGISTRY["stats_kendall_tau"].fn(spark, SF_SMOKE).collect()
    assert len(r) == 1
    assert (
        r[0].n_pairs, r[0].concordant, r[0].discordant,
        r[0].ties_x_only, r[0].ties_y_only, r[0].tau_b_e6,
    ) == (n_pairs, C, D, tx, ty, tau)
    assert -1_000_000 <= tau <= 1_000_000


def test_user_rate_ladder_matches_bruteforce(spark):
    """events_user_rate_ladder: per-user exact-microsecond spans, the
    power-of-2 cross-multiplied bucket rule (incl. the k<0 multiply-not-
    divide arm and the zero-span sentinel), and the rollup recomputed in
    Python. The fixture must populate >= 2 buckets so the ladder is not
    vacuous."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("events", ["user_id", "epoch_us(ts)"])
    per_user = defaultdict(list)
    for uid, us in rows:
        per_user[uid].append(us)

    def bucket(n, span):
        if span == 0:
            return 14
        nd = n * 86_400_000_000
        for k in range(13, -7, -1):
            if k >= 0:
                ok = nd >= (2 ** k) * span
            else:
                ok = nd * (2 ** (-k)) >= span
            if ok:
                return k
        return -7

    agg = defaultdict(lambda: [0, 0, None, None])
    for uid, ts in per_user.items():
        n, span = len(ts), max(ts) - min(ts)
        a = agg[bucket(n, span)]
        a[0] += 1
        a[1] += n
        a[2] = n if a[2] is None else min(a[2], n)
        a[3] = n if a[3] is None else max(a[3], n)
    got = {
        r.rate_k: [r.n_users, r.n_events_total, r.min_events, r.max_events]
        for r in REGISTRY["events_user_rate_ladder"].fn(spark, SF_SMOKE).collect()
    }
    assert got == {k: list(v) for k, v in agg.items()}
    assert len(agg) >= 2, agg


def test_eval_protocol_matches_bruteforce(spark):
    """pipeline_eval_protocol: the systematic split, per-split Wilson
    bounds, and the cross-split fingerprint leak counts recomputed in
    Python end to end; split sizes must sum to the corpus and the eval
    fraction must be exactly the systematic size."""
    import hashlib
    import math
    import re

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    def h15(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = _smoke_table("documents", ["doc_id", "n_chars", "text"])
    ranked = sorted(rows, key=lambda r: (h15(f"sys{r[0]}"), r[0]))
    start = 1 + h15("sysstart") % 20
    split_of, fp_of = {}, {}
    for pos, (doc_id, n_chars, text) in enumerate(ranked, start=1):
        split_of[doc_id] = "eval" if (pos - start) % 20 == 0 else "train"
        prefix = " ".join(re.split(r"\s+", text.strip().lower())[:8])
        fp_of[doc_id] = hashlib.md5(prefix.encode()).hexdigest()
    fp_splits = {}
    for doc_id, fp in fp_of.items():
        fp_splits.setdefault(fp, set()).add(split_of[doc_id])
    leak = {"eval": 0, "train": 0}
    for doc_id, fp in fp_of.items():
        if len(fp_splits[fp]) == 2:
            leak[split_of[doc_id]] += 1
    U = 3841600
    expect = {}
    for split in ("eval", "train"):
        docs = [d for d, s in split_of.items() if s == split]
        nc = {d: c for d, c, _ in rows}
        nn = len(docs)
        ss = sum(1 for d in docs if nc[d] >= 200)
        rt = math.isqrt(U * nn * (U * nn + 4_000_000 * ss * (nn - ss)))
        den = 2 * nn * (1_000_000 * nn + U)
        expect[split] = (
            nn, ss,
            (1_000_000 * ss) // nn,
            (1_000_000 * ((2_000_000 * ss + U) * nn - rt)) // den,
            (1_000_000 * ((2_000_000 * ss + U) * nn + rt)) // den,
            leak[split],
        )
    assert expect["eval"][0] == (len(rows) - start) // 20 + 1
    assert expect["eval"][0] + expect["train"][0] == len(rows)
    got = {
        r.split: (
            r.n_docs, r.n_pass, r.p_ppm,
            r.wilson_low_ppm, r.wilson_high_ppm, r.leak_docs,
        )
        for r in REGISTRY["pipeline_eval_protocol"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_randomization_test_matches_bruteforce(spark):
    """stats_randomization_test: the observed cross-multiplied gap, all
    32 md5 re-randomizations, the common-scale extremeness comparison,
    and the add-one ppm p-value recomputed in Python."""
    import hashlib

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    def h15(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = _smoke_table(
        "orders",
        [
            "o_orderkey",
            "CAST(round(100 * o_totalprice) AS BIGINT)",
            "o_orderpriority",
        ],
    )
    f = [(k, c, p == "1-URGENT") for k, c, p in rows
         if p in ("1-URGENT", "5-LOW")]
    s_u = sum(c for _, c, u in f if u)
    s_l = sum(c for _, c, u in f if not u)
    n_u = sum(1 for *_, u in f if u)
    n_l = len(f) - n_u
    d_obs, w_obs = abs(s_u * n_l - s_l * n_u), n_u * n_l
    n_extreme = 0
    for bi in range(1, 33):
        ps_u = ps_l = pn_u = pn_l = 0
        for k, c, _ in f:
            if h15(f"perm{bi}:{k}") % 2 == 0:
                ps_u += c
                pn_u += 1
            else:
                ps_l += c
                pn_l += 1
        d_b, w_b = abs(ps_u * pn_l - ps_l * pn_u), pn_u * pn_l
        if d_b * w_obs >= d_obs * w_b:
            n_extreme += 1
    r = REGISTRY["stats_randomization_test"].fn(spark, SF_SMOKE).collect()
    assert len(r) == 1
    assert (
        r[0].n_perms, r[0].n_urgent, r[0].n_low,
        r[0].sum_urgent_cents, r[0].sum_low_cents,
        r[0].n_extreme, r[0].p_ppm,
    ) == (32, n_u, n_l, s_u, s_l, n_extreme,
          (1_000_000 * (n_extreme + 1)) // 33)
    # null labels on null data: p must never be an impossible zero
    assert r[0].p_ppm >= 30303


def test_cusum_per_type_matches_bruteforce(spark):
    """events_cusum_per_type: each type's mean-cleared integer walk,
    peak, and earliest-date argmax recomputed in Python (the keyed
    generalization of the stats_cusum_changepoint pin); every walk must
    close at 0."""
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("events", ["event_type", "CAST(ts AS DATE)"])
    daily = Counter(rows)
    expect = {}
    for et in {t for t, _ in daily}:
        days = sorted(d for (t, d) in daily if t == et)
        m = len(days)
        s = sum(daily[(et, d)] for d in days)
        cu, best = 0, None
        for d in days:
            cu += m * daily[(et, d)] - s
            a = abs(cu)
            if best is None or a > best[0]:
                best = (a, d)
        assert cu == 0
        expect[et] = (m, best[1], best[0], (1_000_000 * best[0]) // (m * s))
    got = {
        r.event_type: (r.n_days, r.cp_date, r.peak_abs, r.peak_ppm)
        for r in REGISTRY["events_cusum_per_type"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_attribution_window_curve_matches_bruteforce(spark):
    """events_attribution_window_curve: the running last-view time in
    (ts, event_id) order, microsecond deltas, and the 4-point curve
    recomputed in Python; the curve must be monotone non-decreasing in
    the window and must attribute at least one purchase somewhere."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table(
        "events", ["user_id", "event_type", "event_id", "epoch_us(ts)"]
    )
    per_user = defaultdict(list)
    for uid, et, eid, us in rows:
        per_user[uid].append((us, eid, et))
    deltas = []
    for uid, evs in per_user.items():
        evs.sort()
        last_view = None
        for us, _, et in evs:
            if et == "view":
                last_view = us
            elif et == "purchase":
                deltas.append(None if last_view is None else us - last_view)
    n_p = len(deltas)
    got = {
        r.window_s: (r.n_purchases, r.n_attributed, r.attributed_ppm)
        for r in REGISTRY["events_attribution_window_curve"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    prev = -1
    for w in (3600, 21600, 86400, 259200):
        attr = sum(1 for d in deltas if d is not None and d <= w * 1_000_000)
        assert got[w] == (n_p, attr, (1_000_000 * attr) // max(n_p, 1))
        assert got[w][1] >= prev
        prev = got[w][1]
    assert prev > 0  # the fixture attributes something at 72h


def test_repeat_rate_matches_bruteforce(spark):
    """orders_repeat_rate: per-customer order counts/cents and both
    floored-ppm shares recomputed per segment in Python."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    orders = _smoke_table(
        "orders", ["o_custkey", "CAST(round(100 * o_totalprice) AS BIGINT)"]
    )
    seg = dict(_smoke_table("customer", ["c_custkey", "c_mktsegment"]))
    per_c = defaultdict(lambda: [0, 0])
    for ck, cents in orders:
        per_c[ck][0] += 1
        per_c[ck][1] += cents
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for ck, (n, cents) in per_c.items():
        a = agg[seg[ck]]
        a[0] += 1
        a[2] += cents
        if n >= 2:
            a[1] += 1
            a[3] += cents
    expect = {
        s: (
            n_c, n_r, (1_000_000 * n_r) // n_c,
            rev, rrev, (1_000_000 * rrev) // max(rev, 1),
        )
        for s, (n_c, n_r, rev, rrev) in agg.items()
    }
    got = {
        r.c_mktsegment: (
            r.n_customers, r.n_repeat, r.repeat_ppm,
            r.revenue_cents, r.repeat_revenue_cents, r.repeat_revenue_ppm,
        )
        for r in REGISTRY["orders_repeat_rate"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_embed_dims_profile_matches_bruteforce(spark):
    """embed_dims_profile: floor(x·1024) quantization and the exact
    per-dimension sums / variance numerator recomputed in Python;
    var_num ≥ 0 always (it is n times a sum of squared deviations)."""
    import math
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("embeddings", ["embedding"])
    agg = defaultdict(lambda: [0, 0, 0])
    for (emb,) in rows:
        for d, x in enumerate(emb):
            q = math.floor(float(x) * 1024)
            a = agg[d]
            a[0] += 1
            a[1] += q
            a[2] += q * q
    expect = {
        d: (n, s, ss, n * ss - s * s) for d, (n, s, ss) in agg.items()
    }
    got = {
        r.dim: (r.n_vecs, r.sum_q, r.sumsq_q, r.var_num)
        for r in REGISTRY["embed_dims_profile"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert all(v[3] >= 0 for v in expect.values())


def test_sign_test_matches_bruteforce(spark):
    """stats_sign_test: paired per-customer year spends, tie handling,
    and the exact micro-unit z² recomputed in Python; the fixture must
    produce a non-degenerate pair set with at least one move in each
    direction."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table(
        "orders",
        [
            "o_custkey",
            "year(o_orderdate)",
            "CAST(round(100 * o_totalprice) AS BIGINT)",
        ],
    )
    per = defaultdict(int)
    for ck, y, cents in rows:
        if y in (1995, 1996):
            per[(ck, y)] += cents
    custs = {ck for ck, y in per if y == 1995} & {
        ck for ck, y in per if y == 1996
    }
    up = sum(1 for ck in custs if per[(ck, 1996)] > per[(ck, 1995)])
    down = sum(1 for ck in custs if per[(ck, 1996)] < per[(ck, 1995)])
    tie = len(custs) - up - down
    m = up + down
    z2 = 0 if m == 0 else (1_000_000 * (up - down) * (up - down)) // m
    r = REGISTRY["stats_sign_test"].fn(spark, SF_SMOKE).collect()
    assert len(r) == 1
    assert (
        r[0].n_pairs, r[0].n_up, r[0].n_down, r[0].n_tie,
        r[0].z2_e6, r[0].significant,
    ) == (len(custs), up, down, tie, z2,
          m > 0 and 1_000_000 * (up - down) ** 2 >= 3841459 * m)
    assert up > 0 and down > 0


def test_wma_daily_matches_bruteforce(spark):
    """ts_wma_daily: triangular weights over the trailing calendar week
    and the full-window filter recomputed in Python; every reported
    fraction must satisfy den == 28 and num == Σ(7-k)·x(d-k)."""
    from collections import defaultdict
    from datetime import timedelta

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table(
        "orders",
        ["CAST(o_orderdate AS DATE)", "CAST(round(100 * o_totalprice) AS BIGINT)"],
    )
    daily = defaultdict(int)
    for d, cents in rows:
        daily[d] += cents
    expect = {}
    for d in daily:
        vals = [daily.get(d - timedelta(days=k)) for k in range(7)]
        if all(v is not None for v in vals):
            expect[d] = (
                daily[d],
                sum((7 - k) * v for k, v in enumerate(vals)),
                28,
            )
    got = {
        r.d: (r.cents, r.wma_num, r.wma_den)
        for r in REGISTRY["ts_wma_daily"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert len(expect) > 0


def test_id_continuity_matches_bruteforce(spark):
    """dq_id_continuity: the id − rank island decomposition of the
    fulfilled-order id space recomputed in Python; islands must
    partition the rows and the audit must be non-degenerate (the status
    filter genuinely fragments the id space)."""
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table(
        "orders", ["o_orderkey", "o_orderstatus"]
    )
    ids = sorted(k for k, st in rows if st == "F")
    islands = Counter(i - rank for rank, i in enumerate(ids, start=1))
    r = REGISTRY["dq_id_continuity"].fn(spark, SF_SMOKE).collect()
    assert len(r) == 1
    assert (
        r[0].n_rows, r[0].id_min, r[0].id_max, r[0].n_missing,
        r[0].n_islands, r[0].largest_island,
    ) == (
        len(ids), ids[0], ids[-1], ids[-1] - ids[0] + 1 - len(ids),
        len(islands), max(islands.values()),
    )
    assert sum(islands.values()) == len(ids)
    assert len(islands) > 1  # the filter fragments the space


def test_source_hapax_share_matches_bruteforce(spark):
    """corpus_source_hapax_share: corpus-global document-frequency,
    per-source hapax attribution, and the floored ppm share recomputed
    in Python; hapax totals must reconcile with the corpus spectrum."""
    import re
    from collections import Counter, defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["source", "text"])
    toks = []
    for src, text in rows:
        for w in re.split(r"\s+", text.strip().lower()):
            toks.append((src, w))
    df = Counter(w for _, w in toks)
    agg = defaultdict(lambda: [0, 0])
    for src, w in toks:
        agg[src][0] += 1
        if df[w] == 1:
            agg[src][1] += 1
    expect = {
        s: (n, h, (1_000_000 * h) // n) for s, (n, h) in agg.items()
    }
    got = {
        r.source: (r.n_tokens, r.n_hapax, r.hapax_share_ppm)
        for r in REGISTRY["corpus_source_hapax_share"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert sum(h for _, h, _ in expect.values()) == sum(
        1 for c in df.values() if c == 1
    )


def test_word_length_profile_matches_bruteforce(spark):
    """text_word_length_profile: length counts, ppm shares, and the
    exact rank-straddle median/p95 flags recomputed in Python; exactly
    one bucket carries each flag."""
    import re
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["text"])
    cnt = Counter()
    for (text,) in rows:
        for w in re.split(r"\s+", text.strip().lower()):
            cnt[len(w)] += 1
    t = sum(cnt.values())
    expect, cw = {}, 0
    for wl in sorted(cnt):
        n = cnt[wl]
        cw += n
        expect[wl] = (
            n,
            (1_000_000 * n) // t,
            2 * cw >= t and 2 * (cw - n) < t,
            20 * cw >= 19 * t and 20 * (cw - n) < 19 * t,
        )
    got = {
        r.word_len: (r.n, r.share_ppm, r.is_median_len, r.is_p95_len)
        for r in REGISTRY["text_word_length_profile"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert sum(1 for v in expect.values() if v[2]) == 1
    assert sum(1 for v in expect.values() if v[3]) == 1


def _pq_train_replica(rows, m=8, k=8, iters=2, scale=1024):
    """Plain-Python replay of operators/clustering.py::pq_train_quantized:
    floor(x*scale + 0.5) quantization (the formula as written — floor of
    the shifted value, identical on all three engines including negative
    components), seeds = first k vectors by vec_id, BIGINT distances with
    code-index tie-break, floor(double(S)/n) centroid updates, empty codes
    keeping their previous centroid. Returns (codebook, assign) where
    assign maps (vec_id, s) -> (code, d2) under the FINAL codebook."""
    import math

    q = {
        vid: [math.floor(float(x) * scale + 0.5) for x in emb]
        for vid, emb in rows
    }
    sd = len(next(iter(q.values()))) // m
    seeds = [q[vid] for vid in sorted(q)[:k]]
    cb = [[seeds[j][s * sd : (s + 1) * sd] for j in range(k)] for s in range(m)]

    def nearest(sub, per_s):
        return min(
            (sum((a - b) ** 2 for a, b in zip(sub, c)), j)
            for j, c in enumerate(per_s)
        )

    for _ in range(iters):
        sums = {}
        for vid, xq in q.items():
            for s in range(m):
                sub = xq[s * sd : (s + 1) * sd]
                _, j = nearest(sub, cb[s])
                acc = sums.setdefault((s, j), [0, [0] * sd])
                acc[0] += 1
                for d in range(sd):
                    acc[1][d] += sub[d]
        cb = [
            [
                [
                    math.floor(float(sums[(s, j)][1][d]) / sums[(s, j)][0])
                    for d in range(sd)
                ]
                if (s, j) in sums
                else cb[s][j]
                for j in range(k)
            ]
            for s in range(m)
        ]
    assign = {}
    for vid, xq in q.items():
        for s in range(m):
            d2, j = nearest(xq[s * sd : (s + 1) * sd], cb[s])
            assign[(vid, s)] = (j, d2)
    return cb, assign


def test_pq_codebook_train_matches_bruteforce(spark):
    """embed_pq_codebook_train: the full grouped-Lloyd training
    trajectory (seeds, two assignment/update rounds, final rollup)
    recomputed in plain Python — and the trained codebook must beat the
    embed_pq_distortion md5 stand-in's distortion on EVERY subspace (the
    reason to train at all; the stand-in quantizes floor(x*1024) vs the
    trainer's floor(x*1024 + 0.5), a <=1-per-component difference dwarfed
    by the fitted-vs-random gap)."""
    import hashlib
    import math
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("embeddings", ["vec_id", "embedding"])
    _, assign = _pq_train_replica(rows)
    agg = defaultdict(lambda: [0, 0, set()])
    for (vid, s), (j, d2) in assign.items():
        a = agg[s]
        a[0] += 1
        a[1] += d2
        a[2].add(j)
    expect = {s: (a[0], a[1], len(a[2])) for s, a in agg.items()}
    got = {
        r.subspace: (r.n_vectors, r.sum_distortion, r.n_codes_used)
        for r in REGISTRY["embed_pq_codebook_train"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect

    def h15(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    standin = defaultdict(int)
    for vid, emb in rows:
        xq = [math.floor(float(x) * 1024) for x in emb]
        for s in range(8):
            standin[s] += min(
                sum(
                    (xq[s * 8 + d] - (h15(f"pq{s}-{j}-{d}") % 2049 - 1024))
                    ** 2
                    for d in range(8)
                )
                for j in range(8)
            )
    for s in range(8):
        assert expect[s][1] < standin[s], (s, expect[s][1], standin[s])


def test_ann_serving_matches_bruteforce(spark):
    """pipeline_ann_serving: coarse IVF assignment (vec_id % 100
    centroids), probe expansion, trained-codebook ADC scoring, served
    top-5, exact integer-L2 ground truth, and the recall/cost rollup —
    the whole serving path recomputed in plain Python."""
    import math
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("embeddings", ["vec_id", "embedding"])
    cb, assign = _pq_train_replica(rows)
    q = {
        vid: [math.floor(float(x) * 1024 + 0.5) for x in emb]
        for vid, emb in rows
    }
    cents = {vid: xq for vid, xq in q.items() if vid % 100 == 0}

    def l2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    coarse = {}  # vid -> sorted [(dist, cid), ...]
    for vid, xq in q.items():
        coarse[vid] = sorted((l2(xq, c), cid) for cid, c in cents.items())
    asg = {vid: ds[0][1] for vid, ds in coarse.items()}
    inv = defaultdict(set)
    for vid, cid in asg.items():
        inv[cid].add(vid)

    queries = sorted(v for v in q if v < 10)
    exact = {
        qv: set(
            n
            for _, n in sorted(
                (l2(q[qv], q[n]), n) for n in q if n != qv
            )[:5]
        )
        for qv in queries
    }
    n_pairs = sum(len(v) for v in exact.values())

    expect = {}
    for n_probe in (1, 2, 4):
        n_scored, n_hits = 0, 0
        for qv in queries:
            cand = set()
            for _, cid in coarse[qv][:n_probe]:
                cand |= inv[cid]
            cand.discard(qv)
            n_scored += len(cand)
            scored = []
            for n in cand:
                adc = sum(
                    l2(
                        q[qv][s * 8 : (s + 1) * 8],
                        cb[s][assign[(n, s)][0]],
                    )
                    for s in range(8)
                )
                scored.append((adc, n))
            served = set(n for _, n in sorted(scored)[:5])
            n_hits += len(served & exact[qv])
        expect[n_probe] = (
            len(queries),
            n_scored,
            n_hits,
            n_hits * 1_000_000 // n_pairs,
        )
    got = {
        r.n_probe: (r.n_queries, r.n_scored, r.n_hits, r.recall_ppm)
        for r in REGISTRY["pipeline_ann_serving"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


@pytest.mark.nightly  # heavyweight replay: default tier must fit the driver's verify budget (r15)
def test_pq_residual_gain_matches_bruteforce(spark):
    """embed_pq_residual_gain: coarse assignment, integer residuals, BOTH
    training trajectories (direct at scale=1024, residual at the scale=1
    identity), and the per-subspace comparison recomputed in plain
    Python. Also pins the corpus's honest verdict: on these unclustered
    synthetic embeddings the 5-centroid coarse quantizer captures no
    structure, so residual encoding LOSES on every subspace (d2_delta
    < 0) — the sign the measure-first docstring tells a user to read."""
    import math
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("embeddings", ["vec_id", "embedding"])
    _, d_assign = _pq_train_replica(rows)
    q = {
        vid: [math.floor(float(x) * 1024 + 0.5) for x in emb]
        for vid, emb in rows
    }
    cents = {vid: xq for vid, xq in q.items() if vid % 100 == 0}

    def l2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    res_rows = []
    for vid, xq in q.items():
        _, cid = min((l2(xq, c), cid) for cid, c in cents.items())
        res_rows.append((vid, [a - b for a, b in zip(xq, cents[cid])]))
    _, r_assign = _pq_train_replica(res_rows, scale=1)

    agg = defaultdict(lambda: [0, 0, 0])
    for (vid, s), (_, d2) in d_assign.items():
        agg[s][0] += 1
        agg[s][1] += d2
    for (vid, s), (_, d2) in r_assign.items():
        agg[s][2] += d2
    expect = {
        s: (a[0], a[1], a[2], a[1] - a[2]) for s, a in agg.items()
    }
    got = {
        r.subspace: (r.n_vectors, r.direct_d2, r.residual_d2, r.d2_delta)
        for r in REGISTRY["embed_pq_residual_gain"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert all(v[3] < 0 for v in expect.values())


@pytest.mark.nightly  # heavyweight replay: default tier must fit the driver's verify budget (r15)
def test_ann_rerank_matches_bruteforce(spark):
    """pipeline_ann_rerank: stage-1 shortlist (IVF n_probe=2 -> ADC
    top-10), stage-2 exact re-rank, both stages' hits against the exact
    top-5 ground truth, recomputed in plain Python — plus the dominance
    law the docstring proves: re-ranked recall equals the shortlist's
    full retained recall (every ground-truth member in the shortlist
    sorts first under the exact order), so reranked >= adc always."""
    import math
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("embeddings", ["vec_id", "embedding"])
    cb, assign = _pq_train_replica(rows)
    q = {
        vid: [math.floor(float(x) * 1024 + 0.5) for x in emb]
        for vid, emb in rows
    }
    cents = {vid: xq for vid, xq in q.items() if vid % 100 == 0}

    def l2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    coarse = {
        vid: sorted((l2(xq, c), cid) for cid, c in cents.items())
        for vid, xq in q.items()
    }
    inv = defaultdict(set)
    for vid, ds in coarse.items():
        inv[ds[0][1]].add(vid)

    queries = sorted(v for v in q if v < 10)
    exact = {
        qv: set(
            n for _, n in sorted((l2(q[qv], q[n]), n) for n in q if n != qv)[:5]
        )
        for qv in queries
    }
    n_pairs = sum(len(v) for v in exact.values())

    n_short, h_adc, h_rr = 0, 0, 0
    for qv in queries:
        cand = set()
        for _, cid in coarse[qv][:2]:
            cand |= inv[cid]
        cand.discard(qv)
        scored = sorted(
            (
                sum(
                    l2(q[qv][s * 8 : (s + 1) * 8], cb[s][assign[(n, s)][0]])
                    for s in range(8)
                ),
                n,
            )
            for n in cand
        )
        short = [n for _, n in scored[:10]]
        n_short += len(short)
        h_adc += len(set(short[:5]) & exact[qv])
        rr = sorted(short, key=lambda n: (l2(q[qv], q[n]), n))[:5]
        h_rr += len(set(rr) & exact[qv])
    expect = {
        "adc": (len(queries), 0, h_adc, h_adc * 1_000_000 // n_pairs),
        "reranked": (len(queries), n_short, h_rr, h_rr * 1_000_000 // n_pairs),
    }
    got = {
        r.stage: (r.n_queries, r.n_exact_scored, r.n_hits, r.recall_ppm)
        for r in REGISTRY["pipeline_ann_rerank"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert expect["reranked"][2] >= expect["adc"][2]


def test_bpe_merge_trajectory_matches_bruteforce(spark):
    """tokenize_bpe_merge_trajectory: the full three-merge training run
    (vocabulary build, delimited-symbol representation, pair counts with
    within-word multiplicity, argmax with lexicographic tie-break, the
    greedy left-to-right merge application) recomputed in plain Python
    str.replace — the same non-overlapping semantics all three engines
    were verified to share."""
    import re
    from collections import Counter, defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["text"])
    vocab = Counter()
    for (text,) in rows:
        for w in re.split(r"\s+", text.strip().lower()):
            if re.fullmatch(r"[a-z]+", w):
                vocab[w] += 1
    v = {"".join(f"<{c}>" for c in w): f for w, f in vocab.items()}

    expect = []
    for step in range(1, 4):
        pc = defaultdict(int)
        for w, f in v.items():
            syms = w[1:-1].split("><")
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (l, r), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((step, l, r, n))
        v = {
            w.replace(f"<{l}><{r}>", f"<{l}{r}>"): f for w, f in v.items()
        }
    got = [
        (r.merge_step, r.left_sym, r.right_sym, r.pair_n)
        for r in REGISTRY["tokenize_bpe_merge_trajectory"]
        .fn(spark, SF_SMOKE)
        .collect()
    ]
    assert got == expect
    assert len(expect) == 3


def test_bpe_compression_matches_bruteforce(spark):
    """tokenize_bpe_compression: the per-stage symbol rollups recomputed
    in plain Python over the same training replay — plus the two laws:
    corpus_symbols strictly decreases, and each step's drop is at most
    the step's counted pair frequency (applications never exceed counts;
    they fall short exactly on overlapping occurrences)."""
    import re
    from collections import Counter, defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["text"])
    vocab = Counter()
    for (text,) in rows:
        for w in re.split(r"\s+", text.strip().lower()):
            if re.fullmatch(r"[a-z]+", w):
                vocab[w] += 1
    v = {"".join(f"<{c}>" for c in w): f for w, f in vocab.items()}

    def rollup(vd):
        syms, tot = set(), 0
        for w, f in vd.items():
            ss = w[1:-1].split("><")
            syms.update(ss)
            tot += f * len(ss)
        return len(syms), tot

    expect = {0: rollup(v)}
    pair_ns = {}
    for step in range(1, 4):
        pc = defaultdict(int)
        for w, f in v.items():
            ss = w[1:-1].split("><")
            for a, b in zip(ss, ss[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (l, r), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        pair_ns[step] = n
        v = {w.replace(f"<{l}><{r}>", f"<{l}{r}>"): f for w, f in v.items()}
        expect[step] = rollup(v)
    got = {
        r.stage: (r.n_distinct_symbols, r.corpus_symbols)
        for r in REGISTRY["tokenize_bpe_compression"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect
    for step in range(1, 4):
        drop = expect[step - 1][1] - expect[step][1]
        assert 0 < drop <= pair_ns[step], (step, drop, pair_ns[step])


def test_bpe_encode_matches_bruteforce(spark):
    """pipeline_bpe_encode: the full train-then-encode serving path
    recomputed in plain Python — the three-merge training replay, the
    final-vocabulary word -> symbol-count map, and every per-language
    rollup column — plus the two laws that make the report meaningful:
    compression_ppm ≤ 1e6 per language (merges only shrink), and the
    cross-query closure Σ_lang bpe_symbols == the final-stage
    corpus_symbols that tokenize_bpe_compression reports (encoding the
    corpus with the trained table costs exactly what the trained
    vocabulary says it costs)."""
    import re
    from collections import Counter, defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["lang", "text"])
    lw = Counter()
    for lang, text in rows:
        for w in re.split(r"\s+", text.strip().lower()):
            if re.fullmatch(r"[a-z]+", w):
                lw[(lang, w)] += 1
    vocab = Counter()
    for (_, w), f in lw.items():
        vocab[w] += f
    n_sym = _bpe_train_replica(vocab)

    stats = defaultdict(lambda: [0, 0, 0, 0])  # nw_distinct, nw, chars, syms
    for (lang, w), f in lw.items():
        s = stats[lang]
        s[0] += 1
        s[1] += f
        s[2] += f * len(w)
        s[3] += f * n_sym[w]
    expect = {
        lang: (
            s[0],
            s[1],
            s[2],
            s[3],
            1_000_000 * s[3] // s[1],
            1_000_000 * s[3] // s[2],
        )
        for lang, s in stats.items()
    }
    got = {
        r.lang: (
            r.n_distinct_words,
            r.n_words,
            r.word_chars,
            r.bpe_symbols,
            r.fertility_ppm,
            r.compression_ppm,
        )
        for r in REGISTRY["pipeline_bpe_encode"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert all(vals[5] <= 1_000_000 for vals in expect.values())
    # closure vs the trained vocabulary's own cost accounting
    total_syms = sum(f * n_sym[w] for (_, w), f in lw.items())
    assert sum(vals[3] for vals in expect.values()) == total_syms
    assert total_syms == sum(f * n_sym[w] for w, f in vocab.items())


def test_bpe_rate_distortion_matches_bruteforce(spark):
    """tokenize_bpe_rate_distortion: the full merge-budget grid
    recomputed in plain Python via ONE 5-merge replay with prefix-stage
    snapshots (the nested-prefix property the query rides — the first i
    merges of a 5-merge run ARE the i-merge tokenizer), plus the curve
    laws: corpus cost non-increasing in the budget, every saved_*
    column exactly derived from the baseline, and the cross-query
    closure that the budget-3 row equals tokenize_bpe_compression's
    final stage."""
    import re
    from collections import Counter

    from dend_spark_data_lake_spark.queries import BPE_RD_BUDGETS, REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["text"])
    vocab = Counter()
    for (text,) in rows:
        for w in re.split(r"\s+", text.strip().lower()):
            if re.fullmatch(r"[a-z]+", w):
                vocab[w] += 1
    stage = _bpe_stage_costs_replica(vocab, set(BPE_RD_BUDGETS))
    base = stage[0][1]
    expect = {
        b: (
            stage[b][0],
            stage[b][1],
            base - stage[b][1],
            1_000_000 * (base - stage[b][1]) // base,
            0 if b == 0 else (base - stage[b][1]) // b,
        )
        for b in BPE_RD_BUDGETS
    }
    got = {
        r.n_merges: (
            r.n_distinct_symbols,
            r.corpus_symbols,
            r.saved_symbols,
            r.saved_ppm,
            r.saved_per_merge,
        )
        for r in REGISTRY["tokenize_bpe_rate_distortion"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    assert got == expect
    costs = [stage[b][1] for b in sorted(BPE_RD_BUDGETS)]
    assert costs == sorted(costs, reverse=True)
    comp = {
        r.stage: (r.n_distinct_symbols, r.corpus_symbols)
        for r in REGISTRY["tokenize_bpe_compression"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    assert comp[3] == (stage[3][0], stage[3][1])


def _bpe_stage_costs_replica(vocab, budgets):
    """(n_distinct_symbols, corpus_symbols) per merge budget, replaying
    ONE greedy training to max(budgets) and snapshotting the prefix
    stages — the same argmax (count desc, then lexicographic) and
    non-overlapping left-to-right replace as _bpe_train_replica; a
    dried-out step leaves the vocabulary unchanged so later snapshots
    repeat it, exactly as both engines carry the last stage forward."""
    from collections import defaultdict

    v = {"".join(f"<{c}>" for c in w): f for w, f in vocab.items()}

    def cost(vv):
        syms, total = set(), 0
        for w, f in vv.items():
            s = w[1:-1].split("><")
            syms.update(s)
            total += f * len(s)
        return len(syms), total

    out = {}
    if 0 in budgets:
        out[0] = cost(v)
    for step in range(1, max(budgets) + 1):
        pc = defaultdict(int)
        for w, f in v.items():
            syms = w[1:-1].split("><")
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if pc:
            (l, r), _n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            v = {
                w.replace(f"<{l}><{r}>", f"<{l}{r}>"): f for w, f in v.items()
            }
        if step in budgets:
            out[step] = cost(v)
    return out


def _bpe_train_replica(vocab):
    """Shared Python replica of operators/packing.py::bpe_train: three
    merge iterations over a {word: freq} dict, returning the final
    word -> trained-symbol-count map."""
    from collections import defaultdict

    v = {"".join(f"<{c}>" for c in w): f for w, f in vocab.items()}
    for _step in range(1, 4):
        pc = defaultdict(int)
        for w, f in v.items():
            syms = w[1:-1].split("><")
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (l, r), _n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        v = {w.replace(f"<{l}><{r}>", f"<{l}{r}>"): f for w, f in v.items()}
    return {
        w.replace("<", "").replace(">", ""): len(w[1:-1].split("><"))
        for w in v
    }


def test_bpe_oov_audit_matches_bruteforce(spark):
    """tokenize_bpe_oov_audit: the frozen-tokenizer audit recomputed in
    plain Python — vocabulary trained on doc_id % 10 < 8 only, the
    arriving batch (doc_id % 10 >= 8) encoded with character fallback
    for OOV words — plus the closure law bpe_symbols splits exactly into
    the in-vocab trained cost and oov_char_symbols."""
    import re
    from collections import Counter, defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["doc_id", "lang", "text"])
    train_vocab = Counter()
    batch_lw = Counter()
    for doc_id, lang, text in rows:
        for w in re.split(r"\s+", text.strip().lower()):
            if not re.fullmatch(r"[a-z]+", w):
                continue
            if doc_id % 10 < 8:
                train_vocab[w] += 1
            else:
                batch_lw[(lang, w)] += 1
    n_sym = _bpe_train_replica(train_vocab)

    stats = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for (lang, w), f in batch_lw.items():
        s = stats[lang]
        s[0] += f
        s[1] += 1
        if w not in n_sym:
            s[2] += f
            s[3] += 1
            s[4] += f * len(w)
            s[5] += f * len(w)
        else:
            s[4] += f * n_sym[w]
    expect = {
        lang: (
            s[0],
            s[1],
            s[2],
            s[3],
            s[4],
            s[5],
            1_000_000 * s[2] // s[0],
            1_000_000 * s[4] // s[0],
        )
        for lang, s in stats.items()
    }
    got = {
        r.lang: (
            r.n_words,
            r.n_distinct_words,
            r.n_oov_words,
            r.n_oov_distinct,
            r.bpe_symbols,
            r.oov_char_symbols,
            r.oov_ppm,
            r.fertility_ppm,
        )
        for r in REGISTRY["tokenize_bpe_oov_audit"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect
    # closure: symbols = in-vocab trained cost + OOV char fallback
    for lang, s in stats.items():
        in_vocab_syms = sum(
            f * n_sym[w]
            for (lg, w), f in batch_lw.items()
            if lg == lang and w in n_sym
        )
        assert expect[lang][4] == in_vocab_syms + expect[lang][5]


def test_bpe_budget_matches_bruteforce(spark):
    """curation_bpe_token_budget: the trained-tokenizer-priced selection
    recomputed in plain Python — the training replay, per-document BPE
    symbol cost (0 for documents with no in-contract words), the
    stopword-density score, the (score desc, doc_id) greedy fill at 40%
    of total cost — plus the budget law (selected cost never exceeds the
    budget) and the closure that total corpus cost equals the encode
    query's Σ_lang bpe_symbols (same full-corpus training)."""
    import re
    from collections import Counter, defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["doc_id", "lang", "text"])
    vocab = Counter()
    words_by_doc = {}
    for doc_id, _lang, text in rows:
        ws = [
            w
            for w in re.split(r"\s+", text.strip().lower())
            if re.fullmatch(r"[a-z]+", w)
        ]
        words_by_doc[doc_id] = ws
        vocab.update(ws)
    n_sym = _bpe_train_replica(vocab)

    stop = {"the", "a", "of", "and", "to", "in", "is", "it"}
    docs = []
    for doc_id, lang, text in rows:
        toks = re.split(r"\s+", text.strip().lower()) if text.strip() else []
        tok = len(toks)
        nstop = sum(1 for t in toks if t in stop)
        score = (100 * nstop) // tok if tok > 0 else 0
        cost = sum(n_sym[w] for w in words_by_doc[doc_id])
        docs.append((doc_id, lang, score, cost))

    total = sum(c for *_, c in docs)
    budget = (total * 2) // 5
    docs.sort(key=lambda r: (-r[2], r[0]))
    expect = defaultdict(lambda: [0, 0])
    cum = 0
    selected_cost = 0
    for _doc_id, lang, _score, cost in docs:
        cum += cost
        if cum > budget:
            break
        expect[lang][0] += 1
        expect[lang][1] += cost
        selected_cost += cost
    got = {
        r.lang: [r.n_selected, r.symbols_selected]
        for r in REGISTRY["curation_bpe_token_budget"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    assert got == dict(expect)
    assert selected_cost <= budget
    # closure: the corpus' total trained cost is what the encode query bills
    enc_rows = REGISTRY["pipeline_bpe_encode"].fn(spark, SF_SMOKE).collect()
    assert total == sum(r.bpe_symbols for r in enc_rows)


def test_bpe_pack_matches_bruteforce(spark):
    """pack_sequences_bpe: the trained-tokenizer-priced greedy packing
    recomputed in plain Python — the training replay, the per-document
    BPE symbol cost (0 for documents with no in-contract words), then
    the exact greedy fold per 64-doc shard in doc_id order — every
    (doc -> shard, pack, weight) assignment compared, plus the budget
    law (no pack exceeds BPE_PACK_BUDGET unless it is a singleton
    overweight document) and the closure that total packed weight
    equals pipeline_bpe_encode's Σ_lang bpe_symbols (the same corpus
    total read at (doc) vs (lang) grain)."""
    import re
    from collections import Counter, defaultdict

    from dend_spark_data_lake_spark.queries import (
        BPE_PACK_BUDGET,
        REGISTRY,
    )
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["doc_id", "lang", "text"])
    vocab = Counter()
    words_by_doc = {}
    for doc_id, _lang, text in rows:
        ws = [
            w
            for w in re.split(r"\s+", text.strip().lower())
            if re.fullmatch(r"[a-z]+", w)
        ]
        words_by_doc[doc_id] = ws
        vocab.update(ws)
    n_sym = _bpe_train_replica(vocab)

    cost = {
        doc_id: sum(n_sym[w] for w in words_by_doc[doc_id])
        for doc_id, _lang, _text in rows
    }
    by_shard = defaultdict(list)
    for doc_id in sorted(cost):
        by_shard[doc_id // 64].append(doc_id)
    expect = {}
    for shard, ids in by_shard.items():
        pack, acc = -1, BPE_PACK_BUDGET + 1
        for doc_id in ids:
            w = cost[doc_id]
            if acc + w <= BPE_PACK_BUDGET:
                acc += w
            else:
                pack, acc = pack + 1, w
            expect[doc_id] = (shard, pack, w)

    got_rows = REGISTRY["pack_sequences_bpe"].fn(spark, SF_SMOKE).collect()
    got = {r.doc_id: (r.shard, r.pack_id, r.weight) for r in got_rows}
    assert got == expect

    pack_totals = defaultdict(lambda: [0, 0])
    for _doc, (shard, pack, w) in got.items():
        pack_totals[(shard, pack)][0] += w
        pack_totals[(shard, pack)][1] += 1
    for (shard, pack), (tot, n) in pack_totals.items():
        assert tot <= BPE_PACK_BUDGET or n == 1, (shard, pack, tot, n)

    enc_rows = REGISTRY["pipeline_bpe_encode"].fn(spark, SF_SMOKE).collect()
    assert sum(w for _s, _p, w in got.values()) == sum(
        r.bpe_symbols for r in enc_rows
    )


def test_pack_budget_curve_matches_bruteforce(spark):
    """pack_budget_curve: every curve cell recomputed in plain Python —
    train, price, then the greedy fold at each of the four budgets with
    exact pack-count / overweight / waste / floored-ppm accounting —
    plus the monotonicity laws (n_packs and n_overweight non-increasing
    in the budget; tokens_used and n_docs constant) and the closure
    that the budget-1024 row is exactly pack_sequences_bpe's layout
    rolled up."""
    import re
    from collections import Counter, defaultdict

    from dend_spark_data_lake_spark.queries import (
        BPE_PACK_BUDGET,
        PACK_CURVE_BUDGETS,
        REGISTRY,
    )
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["doc_id", "lang", "text"])
    vocab = Counter()
    words_by_doc = {}
    for doc_id, _lang, text in rows:
        ws = [
            w
            for w in re.split(r"\s+", text.strip().lower())
            if re.fullmatch(r"[a-z]+", w)
        ]
        words_by_doc[doc_id] = ws
        vocab.update(ws)
    n_sym = _bpe_train_replica(vocab)
    cost = {
        doc_id: sum(n_sym[w] for w in words_by_doc[doc_id])
        for doc_id, _lang, _text in rows
    }
    by_shard = defaultdict(list)
    for doc_id in sorted(cost):
        by_shard[doc_id // 64].append(doc_id)

    expect = {}
    for budget in PACK_CURVE_BUDGETS:
        totals = defaultdict(int)
        ndocs = defaultdict(int)
        for shard, ids in by_shard.items():
            pack, acc = -1, budget + 1
            for doc_id in ids:
                w = cost[doc_id]
                if acc + w <= budget:
                    acc += w
                else:
                    pack, acc = pack + 1, w
                totals[(shard, pack)] += w
                ndocs[(shard, pack)] += 1
        n_packs = len(totals)
        tokens = sum(totals.values())
        waste = sum(max(0, budget - t) for t in totals.values())
        expect[budget] = (
            n_packs,
            sum(ndocs.values()),
            tokens,
            sum(1 for t in totals.values() if t > budget),
            waste,
            (1_000_000 * tokens) // (n_packs * budget),
            (1_000_000 * waste) // (n_packs * budget),
        )

    got = {
        r.budget: (
            r.n_packs,
            r.n_docs,
            r.tokens_used,
            r.n_overweight,
            r.waste_symbols,
            r.fill_ppm,
            r.waste_ppm,
        )
        for r in REGISTRY["pack_budget_curve"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect

    budgets = sorted(got)
    for lo, hi in zip(budgets, budgets[1:]):
        assert got[lo][0] >= got[hi][0], (lo, hi)  # n_packs non-increasing
        assert got[lo][3] >= got[hi][3], (lo, hi)  # overweight non-increasing
        assert got[lo][1] == got[hi][1]  # every doc always packed
        assert got[lo][2] == got[hi][2]  # corpus cost budget-independent

    # closure: the 1024 row IS pack_sequences_bpe's layout rolled up
    pk = REGISTRY["pack_sequences_bpe"].fn(spark, SF_SMOKE).collect()
    packs = defaultdict(int)
    for r in pk:
        packs[(r.shard, r.pack_id)] += r.weight
    row = got[BPE_PACK_BUDGET]
    assert row[0] == len(packs)
    assert row[2] == sum(packs.values())
    assert row[4] == sum(
        max(0, BPE_PACK_BUDGET - t) for t in packs.values()
    )


def test_pack_append_prefix_property_and_replica(spark):
    """pack_sequences_append: (a) exact Python replica of the
    (is_batch, doc_id)-ordered greedy fold; (b) the LEFT-FOLD PREFIX
    LAW — every standing document's (shard, pack, weight) is identical
    to the standing-only fold, i.e. appending the batch disturbs
    nothing already shipped; (c) the semantics genuinely differ from a
    full repack: whenever the bare-doc_id-order fold assigns any
    standing document differently, the query must match the APPEND
    fold, not the repack (at this corpus the two DO diverge — asserted,
    so the test cannot silently degrade into checking nothing)."""
    import re
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["doc_id", "text"])
    wt = {
        doc_id: (len(re.split(r"\s+", text.strip())) if text.strip() else 0)
        for doc_id, text in rows
    }

    def fold(ids_by_shard):
        out = {}
        for shard, ids in ids_by_shard.items():
            pack, acc = -1, 256 + 1
            for doc_id in ids:
                w = wt[doc_id]
                if acc + w <= 256:
                    acc += w
                else:
                    pack, acc = pack + 1, w
                out[doc_id] = (shard, pack, w)
        return out

    append_order = defaultdict(list)
    repack_order = defaultdict(list)
    standing_order = defaultdict(list)
    for doc_id in sorted(wt):
        shard = doc_id // 64
        repack_order[shard].append(doc_id)
        if doc_id % 10 >= 8:
            continue
        standing_order[shard].append(doc_id)
    for shard, ids in repack_order.items():
        append_order[shard] = sorted(ids, key=lambda i: (i % 10 >= 8, i))

    expect = fold(append_order)
    got = {
        r.doc_id: (r.shard, r.pack_id, r.weight)
        for r in REGISTRY["pack_sequences_append"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect

    standing_only = fold(standing_order)
    for doc_id, asg in standing_only.items():
        assert got[doc_id] == asg, (doc_id, got[doc_id], asg)

    # non-vacuity: the full-repack fold must assign some standing doc
    # differently on this corpus — otherwise the prefix law above would
    # hold trivially and distinguish nothing (got != repack on these
    # docs follows from got == standing_only ≠ repack, already asserted)
    repack = fold(repack_order)
    diverged = [
        doc_id
        for doc_id in standing_only
        if repack[doc_id] != standing_only[doc_id]
    ]
    assert diverged, "corpus too degenerate: repack == append everywhere"


def test_pack_append_bpe_prefix_law_and_oov_closure(spark):
    """pack_append_bpe: (a) exact Python replica — tokenizer FROZEN on
    the standing slice only, OOV character-fallback pricing at
    (doc, word) grain, then the (is_batch, doc_id)-ordered greedy fold
    at BPE_PACK_BUDGET; (b) the left-fold PREFIX LAW under BPE pricing
    — every standing assignment identical to the standing-only fold;
    (c) the frozen-tokenizer closure VERDICT r12 asked for: the batch
    documents' total pack weight equals tokenize_bpe_oov_audit's
    Σ_lang bpe_symbols (the same frozen-vocabulary total read at (doc)
    vs (lang) grain); (d) non-vacuity — the bare-repack fold must
    assign some standing document differently under BPE pricing, or
    the prefix law would hold trivially. The driver corpus's 31-word
    vocabulary is fully covered by the standing slice (no OOV mass at
    any test SF), so the character-fallback pricing path is pinned by
    test_pack_append_bpe_oov_fallback_synthetic on a constructed
    corpus instead."""
    import re
    from collections import Counter, defaultdict

    from dend_spark_data_lake_spark.queries import (
        BPE_PACK_BUDGET,
        REGISTRY,
    )
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["doc_id", "text"])
    words_by_doc = {}
    vocab = Counter()
    for doc_id, text in rows:
        ws = [
            w
            for w in re.split(r"\s+", text.strip().lower())
            if re.fullmatch(r"[a-z]+", w)
        ]
        words_by_doc[doc_id] = ws
        if doc_id % 10 < 8:
            vocab.update(ws)
    n_sym = _bpe_train_replica(vocab)
    cost = {
        d: sum(n_sym.get(w, len(w)) for w in ws)
        for d, ws in words_by_doc.items()
    }

    def fold(ids_by_shard):
        out = {}
        for shard, ids in ids_by_shard.items():
            pack, acc = -1, BPE_PACK_BUDGET + 1
            for doc_id in ids:
                w = cost[doc_id]
                if acc + w <= BPE_PACK_BUDGET:
                    acc += w
                else:
                    pack, acc = pack + 1, w
                out[doc_id] = (shard, pack, w)
        return out

    append_order = defaultdict(list)
    standing_order = defaultdict(list)
    for doc_id in sorted(cost):
        shard = doc_id // 64
        append_order[shard].append(doc_id)
        if doc_id % 10 < 8:
            standing_order[shard].append(doc_id)
    for shard in append_order:
        append_order[shard].sort(key=lambda i: (i % 10 >= 8, i))

    expect = {
        d: (*a, int(d % 10 >= 8)) for d, a in fold(append_order).items()
    }
    got = {
        r.doc_id: (r.shard, r.pack_id, r.weight, r.is_batch)
        for r in REGISTRY["pack_append_bpe"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect

    standing_only = fold(standing_order)
    for doc_id, asg in standing_only.items():
        assert got[doc_id][:3] == asg, (doc_id, got[doc_id], asg)

    audit = REGISTRY["tokenize_bpe_oov_audit"].fn(spark, SF_SMOKE).collect()
    batch_weight = sum(w for (_s, _p, w, b) in got.values() if b == 1)
    assert batch_weight == sum(r.bpe_symbols for r in audit)

    repack_order = {
        shard: sorted(ids) for shard, ids in append_order.items()
    }
    repack = fold(repack_order)
    diverged = [
        doc_id
        for doc_id in standing_only
        if repack[doc_id] != standing_only[doc_id]
    ]
    assert diverged, "corpus too degenerate: repack == append everywhere"


def test_pack_append_bpe_oov_fallback_synthetic(spark, tmp_path):
    """The OOV character-fallback pricing path of pack_append_bpe,
    pinned on a CONSTRUCTED corpus (the driver corpus's vocabulary is
    fully covered by the standing slice, so nothing there ever takes
    the fallback): batch documents carrying words the frozen
    standing-slice vocabulary has never seen must be priced at
    length(word) per occurrence — the worst-case symbol cost a stale
    tokenizer bills for fresh data — and the whole layout must match
    the Python replica of train -> fallback-price -> ordered fold."""
    import re
    from collections import Counter, defaultdict

    from dend_spark_data_lake_spark.queries import (
        BPE_PACK_BUDGET,
        REGISTRY,
    )

    docs = [
        # standing slice (doc_id % 10 < 8): a tiny trainable vocabulary
        (0, "en", "alpha beta alpha"),
        (1, "en", "beta gamma"),
        (2, "en", "alpha alpha beta"),
        (3, "en", "gamma gamma"),
        (4, "en", "alpha beta gamma"),
        (5, "en", "beta beta"),
        (6, "en", "alpha"),
        (7, "en", "gamma beta alpha"),
        # arriving batch: one covered word, two OOV words
        (8, "en", "alpha zyxwv"),
        (9, "en", "zyxwv qqqqqqq zyxwv"),
    ]
    spark.createDataFrame(
        docs, "doc_id long, lang string, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    vocab = Counter()
    words_by_doc = {}
    for doc_id, _lang, text in docs:
        ws = [
            w
            for w in re.split(r"\s+", text.strip().lower())
            if re.fullmatch(r"[a-z]+", w)
        ]
        words_by_doc[doc_id] = ws
        if doc_id % 10 < 8:
            vocab.update(ws)
    n_sym = _bpe_train_replica(vocab)
    assert "zyxwv" not in n_sym and "qqqqqqq" not in n_sym
    cost = {
        d: sum(n_sym.get(w, len(w)) for w in ws)
        for d, ws in words_by_doc.items()
    }
    # the fallback genuinely fires: doc 9 is priced purely by characters
    assert cost[9] == 2 * len("zyxwv") + len("qqqqqqq")

    order = defaultdict(list)
    for doc_id in sorted(cost):
        order[doc_id // 64].append(doc_id)
    for shard in order:
        order[shard].sort(key=lambda i: (i % 10 >= 8, i))
    expect = {}
    for shard, ids in order.items():
        pack, acc = -1, BPE_PACK_BUDGET + 1
        for doc_id in ids:
            w = cost[doc_id]
            if acc + w <= BPE_PACK_BUDGET:
                acc += w
            else:
                pack, acc = pack + 1, w
            expect[doc_id] = (shard, pack, w, int(doc_id % 10 >= 8))

    got = {
        r.doc_id: (r.shard, r.pack_id, r.weight, r.is_batch)
        for r in REGISTRY["pack_append_bpe"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect


def test_sim_filtered_topk_replica_and_postfilter_law(spark):
    """sim_filtered_topk: full Python replica (float64 dots, round-6
    cosine, (cosine desc, id) tie-break) of both rankings; the law
    rank_global >= rank_filtered on every row; non-vacuity — this
    corpus must produce at least one winner with rank_global > 5 (a
    neighbor post-filtering would have missed, the reason the query
    exists); and the cross-query closure that every winner with
    rank_global <= 5 appears in sim_cosine_topk's global top-5 with the
    identical cosine and rank."""
    import math
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("embeddings", ["vec_id", "label", "embedding"])
    vecs = {r[0]: (r[1], [float(x) for x in r[2]]) for r in rows}
    queries = {i: vecs[i] for i in vecs if i < 10}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(
            sum(x * x for x in b)
        )
        return round(num / den, 6)

    expect = {}
    for qid, (qlabel, qv) in queries.items():
        scored = [
            (cos(qv, cv), nid, label)
            for nid, (label, cv) in vecs.items()
            if nid != qid
        ]
        ordered = sorted(scored, key=lambda t: (-t[0], t[1]))
        grank = {nid: i + 1 for i, (_c, nid, _l) in enumerate(ordered)}
        flt = [t for t in ordered if t[2] == qlabel]
        for i, (c, nid, label) in enumerate(flt[:5]):
            expect[(qid, nid)] = (label, c, i + 1, grank[nid])

    got = {
        (r.query_id, r.neighbor_id): (
            r.label,
            r.cosine,
            r.rank_filtered,
            r.rank_global,
        )
        for r in REGISTRY["sim_filtered_topk"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect

    assert all(rg >= rf for (_l, _c, rf, rg) in got.values())
    assert any(rg > 5 for (_l, _c, _rf, rg) in got.values()), (
        "corpus too degenerate: post-filtering would lose nothing"
    )

    topk = {
        (r.query_id, r.neighbor_id): (r.cosine, r.rank)
        for r in REGISTRY["sim_cosine_topk"].fn(spark, SF_SMOKE).collect()
    }
    for (qid, nid), (_l, c, _rf, rg) in got.items():
        if rg <= 5:
            assert topk[(qid, nid)] == (c, rg)


def test_l_diversity_lattice_replica_and_laws(spark):
    """dq_l_diversity: exact Python replica of all three lattice levels
    (within-class distinct-band counting, homogeneity accounting,
    floored exposure ppm), the homogeneity laws the docstring claims —
    level 0 is total disclosure by construction (min_l = 1, every
    class homogeneous, exposure = 1e6 ppm), min_l non-decreasing and
    exposed rows non-increasing up the lattice, row total invariant —
    plus non-vacuity (level 1 must hold BOTH homogeneous and diverse
    classes, or the audit distinguishes nothing) and the cross-query
    closure that (n_classes, n_rows, min_k) per level equal
    dq_k_anonymity's certified lattice exactly."""
    import math
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table(
        "customer", ["c_nationkey", "c_mktsegment", "c_acctbal"]
    )
    expect = {}
    for level in (0, 1, 2):
        classes = defaultdict(lambda: [0, set()])
        for nat, seg, bal in rows:
            band = int(math.floor(bal / 1000))
            key = {0: (nat, seg, band), 1: (nat, seg), 2: (nat,)}[level]
            classes[key][0] += 1
            classes[key][1].add(band)
        ks = [k for k, _s in classes.values()]
        homog = [(k, s) for k, s in classes.values() if len(s) == 1]
        expect[level] = (
            len(classes),
            sum(ks),
            min(ks),
            min(len(s) for _k, s in classes.values()),
            len(homog),
            sum(k for k, _s in homog),
            (1_000_000 * sum(k for k, _s in homog)) // sum(ks),
        )

    got = {
        r.level: (
            r.n_classes,
            r.n_rows,
            r.min_k,
            r.min_l,
            r.homogeneous_classes,
            r.exposed_rows,
            r.exposed_ppm,
        )
        for r in REGISTRY["dq_l_diversity"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect

    # level 0 keeps the band in the QI: total disclosure by construction
    assert got[0][3] == 1
    assert got[0][4] == got[0][0]
    assert got[0][6] == 1_000_000
    # lattice laws up the ladder
    for lo, hi in ((0, 1), (1, 2)):
        assert got[lo][1] == got[hi][1]  # row total invariant
        assert got[lo][3] <= got[hi][3]  # min_l non-decreasing
    assert got[1][5] >= got[2][5]  # exposed rows non-increasing 1 -> 2
    # non-vacuity: the interesting level must mix homogeneous + diverse
    assert 0 < got[1][4] < got[1][0], (
        "corpus too degenerate: level 1 is all-homogeneous or "
        "all-diverse"
    )

    kanon = {
        r.level: (r.n_classes, r.n_rows, r.min_k)
        for r in REGISTRY["dq_k_anonymity"].fn(spark, SF_SMOKE).collect()
    }
    for level, vals in got.items():
        assert kanon[level] == vals[:3]


def test_release_ladder_closures_and_decision(spark):
    """dq_release_ladder: the one-pass ladder must report EXACTLY the
    three certified audits' numbers — min_k per level ==
    dq_k_anonymity's, min_l == dq_l_diversity's, t_ppm at levels 1/2
    == dq_t_closeness's, n_classes everywhere — with every pass/fail
    flag consistent with its own value and release_ok their
    conjunction; level 0's t (the point-mass EMD only this query
    reports) replica-checked and >= level 1's by W1 convexity (finer
    classes sit farther from the population than their unions)."""
    import math
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    got = {
        r.level: r
        for r in REGISTRY["dq_release_ladder"].fn(spark, SF_SMOKE).collect()
    }
    assert sorted(got) == [0, 1, 2]

    kanon = {
        r.level: r
        for r in REGISTRY["dq_k_anonymity"].fn(spark, SF_SMOKE).collect()
    }
    ldiv = {
        r.level: r
        for r in REGISTRY["dq_l_diversity"].fn(spark, SF_SMOKE).collect()
    }
    tcl = {
        r.level: r
        for r in REGISTRY["dq_t_closeness"].fn(spark, SF_SMOKE).collect()
    }
    for level, r in got.items():
        assert r.n_classes == kanon[level].n_classes
        assert r.min_k == kanon[level].min_k
        assert r.min_l == ldiv[level].min_l
        if level in tcl:
            assert r.t_ppm == tcl[level].t_ppm
        assert r.k_ok == (r.min_k >= 5)
        assert r.l_ok == (r.min_l >= 2)
        assert r.t_ok == (r.t_ppm <= 200_000)
        assert r.release_ok == (r.k_ok and r.l_ok and r.t_ok)

    # level-0 point-mass EMD replica (the one number without a
    # standalone-audit closure partner)
    rows = _smoke_table(
        "customer", ["c_nationkey", "c_mktsegment", "c_acctbal"]
    )
    gdist = Counter(
        int(math.floor(bal / 1000)) for _n, _s, bal in rows
    )
    bands = sorted(gdist)
    m, total = len(bands), sum(gdist.values())
    best = 0
    for cls_band in {
        (nat, seg, int(math.floor(bal / 1000)))
        for nat, seg, bal in rows
    }:
        cum_g = d = 0
        for band in bands:
            cum_g += gdist[band]
            cum_c_ppm = 1_000_000 if band >= cls_band[2] else 0
            d += abs(cum_c_ppm - cum_g * 1_000_000 // total)
        best = max(best, d // (m - 1))
    assert got[0].t_ppm == best
    assert got[0].t_ppm >= got[1].t_ppm


def test_chunk_dedup_tax_replica_and_closures(spark):
    """curation_chunk_dedup_tax: Python replica of the whole 1-row
    report; closures against the certified chunker — n_chunks and
    chunk_tokens equal text_chunk_windows rolled up; and the
    non-vacuity that justifies the query: chunk-grain dedup must find
    duplicate mass this corpus's doc-grain hashing misses
    (chunk_dup_ppm > doc_dup_ppm), and the overlap tax must exceed
    1e6 ppm (the stride genuinely re-emits boundary tokens)."""
    import hashlib
    import re
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["doc_id", "text"])
    chunk_hist = Counter()
    chunk_toks = {}
    doc_hist = Counter()
    doc_toks = {}
    for _doc_id, text in rows:
        if not text.strip():
            continue
        t = re.split(r"\s+", text.strip())
        n = len(t)
        dh = hashlib.md5(" ".join(t).encode()).hexdigest()
        doc_hist[dh] += 1
        doc_toks[dh] = n
        n_chunks = 1 + max(0, -(-(n - 64) // 48)) if n > 64 else 1
        for k in range(n_chunks):
            toks = t[k * 48 : k * 48 + 64]
            h = hashlib.md5(" ".join(toks).encode()).hexdigest()
            chunk_hist[h] += 1
            chunk_toks[h] = len(toks)

    n_docs = len(doc_hist)
    doc_tokens = sum(doc_hist[h] * doc_toks[h] for h in doc_hist)
    dup_doc = sum((doc_hist[h] - 1) * doc_toks[h] for h in doc_hist)
    n_chunks = sum(chunk_hist.values())
    chunk_tokens = sum(chunk_hist[h] * chunk_toks[h] for h in chunk_hist)
    dup_chunk = sum((chunk_hist[h] - 1) * chunk_toks[h] for h in chunk_hist)
    expect = (
        n_docs,
        doc_tokens,
        n_chunks,
        chunk_tokens,
        chunk_tokens * 1_000_000 // doc_tokens,
        dup_doc,
        dup_chunk,
        dup_doc * 1_000_000 // doc_tokens,
        dup_chunk * 1_000_000 // chunk_tokens,
    )

    [r] = REGISTRY["curation_chunk_dedup_tax"].fn(spark, SF_SMOKE).collect()
    got = (
        r.n_docs,
        r.doc_tokens,
        r.n_chunks,
        r.chunk_tokens,
        r.overlap_tax_ppm,
        r.dup_doc_tokens,
        r.dup_chunk_tokens,
        r.doc_dup_ppm,
        r.chunk_dup_ppm,
    )
    assert got == expect

    chunks = REGISTRY["text_chunk_windows"].fn(spark, SF_SMOKE).collect()
    assert r.n_chunks == len(chunks)
    assert r.chunk_tokens == sum(c.n_toks for c in chunks)

    assert r.chunk_dup_ppm > r.doc_dup_ppm, (
        "corpus too degenerate: chunk grain sees nothing doc grain "
        "misses"
    )
    assert r.overlap_tax_ppm > 1_000_000


def test_chunk_windows_replica_and_coverage(spark):
    """text_chunk_windows: exact Python replica of the strided
    chunker (64-token windows, stride 48, md5 of the reconstructed
    chunk text); the coverage law — every token index of every
    non-empty document falls inside at least one window; the
    closed-form count law n_chunks = 1 + ceil(max(n - 64, 0)/48); the
    only-last-window-short law; and non-vacuity (this corpus must
    contain multi-chunk documents, or stride/overlap semantics are
    untested)."""
    import hashlib
    import re
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("documents", ["doc_id", "text"])
    expect = {}
    per_doc = defaultdict(list)
    for doc_id, text in rows:
        if not text.strip():
            continue
        t = re.split(r"\s+", text.strip())
        n = len(t)
        n_chunks = 1 + max(0, -(-(n - 64) // 48)) if n > 64 else 1
        for k in range(n_chunks):
            start = k * 48
            toks = t[start : start + 64]
            expect[(doc_id, k)] = (
                start + 1,
                len(toks),
                hashlib.md5(" ".join(toks).encode()).hexdigest(),
            )
            per_doc[doc_id].append((start, len(toks), n))

    got = {
        (r.doc_id, r.chunk_idx): (r.start_tok, r.n_toks, r.chunk_md5)
        for r in REGISTRY["text_chunk_windows"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect

    for doc_id, chunks in per_doc.items():
        n = chunks[0][2]
        covered = set()
        for start, ln, _n in chunks:
            covered.update(range(start, start + ln))
        assert covered == set(range(n)), doc_id
        # every window but the last is full-width
        for start, ln, _n in chunks[:-1]:
            assert ln == 64, (doc_id, start, ln)

    assert any(len(c) > 1 for c in per_doc.values()), (
        "corpus too degenerate: no document spans multiple windows"
    )


def test_matryoshka_recall_replica_and_baseline(spark):
    """embed_matryoshka_recall: Python replica of the truncated-prefix
    recall curve at d in {16, 32, 64}; the d = 64 row must read recall
    = 1e6 exactly (it IS the baseline); and non-vacuity — the d = 16
    prefix must lose recall on this corpus, or the curve distinguishes
    nothing."""
    import math

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("embeddings", ["vec_id", "embedding"])
    vecs = {r[0]: [float(x) for x in r[1]] for r in rows}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(
            sum(x * x for x in b)
        )
        return round(num / den, 6)

    topk = {}
    for dim in (16, 32, 64):
        for qid, qv in vecs.items():
            if qid >= 10:
                continue
            ranked = sorted(
                (
                    (-cos(qv[:dim], cv[:dim]), nid)
                    for nid, cv in vecs.items()
                    if nid != qid
                )
            )[:5]
            topk[(dim, qid)] = {nid for _c, nid in ranked}

    exact = {
        (qid, nid)
        for (dim, qid), nids in topk.items()
        if dim == 64
        for nid in nids
    }
    n_pairs = len(exact)
    expect = {}
    for dim in (16, 32, 64):
        hits = sum(
            1
            for (d, qid), nids in topk.items()
            if d == dim
            for nid in nids
            if (qid, nid) in exact
        )
        expect[dim] = (
            len({q for q, _n in exact}),
            hits,
            hits * 1_000_000 // n_pairs,
        )

    got = {
        r.dim: (r.n_queries, r.n_hits, r.recall_ppm)
        for r in REGISTRY["embed_matryoshka_recall"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    assert got == expect
    assert got[64][2] == 1_000_000
    assert got[16][2] < 1_000_000, (
        "corpus too degenerate: the 16-dim prefix loses nothing"
    )

    # cross-query closure: sim_truncated_dim_recall is the per-query
    # DETAIL view of this curve's d=16 point — its n_overlap rolls up
    # to exactly that row's hit count
    detail = (
        REGISTRY["sim_truncated_dim_recall"].fn(spark, SF_SMOKE).collect()
    )
    assert got[16][1] == sum(r.n_overlap for r in detail)


def test_t_closeness_emd_replica_and_laws(spark):
    """dq_t_closeness: exact Python replica of the per-class ordered
    Earth Mover's Distance at both lattice levels — floor-of-cumsum
    ppm shares against the global band distribution, zero-filled band
    spine, (m - 1)-step normalization, the t = 0.2 breach accounting —
    plus the laws: every EMD in [0, 1e6]; t non-increasing up the
    ladder (classes merge TOWARD the population — W1 is convex in the
    class distribution); non-vacuity (both levels must mix breaching
    and conforming classes); and the closure that n_classes per level
    equals dq_k_anonymity's certified lattice at levels 1 and 2."""
    import math
    from collections import Counter, defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table(
        "customer", ["c_nationkey", "c_mktsegment", "c_acctbal"]
    )
    banded = [
        (nat, seg, int(math.floor(bal / 1000))) for nat, seg, bal in rows
    ]
    gdist = Counter(band for _n, _s, band in banded)
    bands = sorted(gdist)
    m, total = len(bands), sum(gdist.values())

    expect = {}
    for level in (1, 2):
        by_class = defaultdict(Counter)
        for nat, seg, band in banded:
            key = (nat, seg) if level == 1 else (nat,)
            by_class[key][band] += 1
        emds = {}
        for key, dist in by_class.items():
            k = sum(dist.values())
            cum_c = cum_g = d = 0
            for band in bands:
                cum_c += dist.get(band, 0)
                cum_g += gdist[band]
                d += abs(cum_c * 1_000_000 // k - cum_g * 1_000_000 // total)
            emds[key] = (d // (m - 1), k)
        breach = [(e, k) for e, k in emds.values() if e > 200_000]
        expect[level] = (
            len(emds),
            max(e for e, _k in emds.values()),
            len(breach),
            sum(k for _e, k in breach),
            (
                1_000_000 * sum(k for _e, k in breach)
            ) // sum(k for _e, k in emds.values()),
        )

    got = {
        r.level: (
            r.n_classes,
            r.t_ppm,
            r.breach_classes,
            r.breach_rows,
            r.breach_ppm,
        )
        for r in REGISTRY["dq_t_closeness"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect

    for level, (_n, t, b, _br, _bp) in got.items():
        assert 0 <= t <= 1_000_000, (level, t)
        assert 0 < b < got[level][0], (
            "corpus too degenerate: a level is all-breaching or "
            "all-conforming"
        )
    assert got[2][1] <= got[1][1]  # t non-increasing up the ladder

    kanon = {
        r.level: r.n_classes
        for r in REGISTRY["dq_k_anonymity"].fn(spark, SF_SMOKE).collect()
    }
    for level in (1, 2):
        assert got[level][0] == kanon[level]


def test_t_closeness_single_band_degenerate_corpus(spark, tmp_path):
    """The EMD normalization guard (ADVICE r13), pinned on a CONSTRUCTED
    single-band corpus: when every account balance lands in ONE band the
    step count m - 1 degenerates to 0, and an unguarded division yields
    NULL emd_ppm plus NULL-propagating breach/t_ok flags on BOTH
    engines. With the greatest(m - 1, 1) guard the distance is exactly 0
    (a one-band class distribution IS the population distribution), so
    every class conforms and the ladder's t rung passes while its
    l rung fails (one band => l = 1 homogeneous classes) — asserted
    value-for-value against the DuckDB oracle on the same corpus, and
    as concrete non-NULL expectations on the Spark side."""
    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.oracle_utils import compare

    rows = [
        (nat, seg, float(100 * (1 + i)))
        for nat in (0, 1)
        for seg in ("AUTOMOBILE", "BUILDING")
        for i in range(5)
    ]
    spark.createDataFrame(
        rows, "c_nationkey int, c_mktsegment string, c_acctbal double"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{tmp_path}/customer.parquet/*.parquet')"
    )
    for name in ("dq_t_closeness", "dq_release_ladder"):
        spec = REGISTRY[name]
        problems = compare(spec.fn(spark, str(tmp_path)), con, spec.oracle)
        assert not problems, (name, problems)

    tc = {
        r.level: r
        for r in REGISTRY["dq_t_closeness"].fn(spark, str(tmp_path)).collect()
    }
    assert tc[1].n_classes == 4 and tc[2].n_classes == 2
    for level in (1, 2):
        assert tc[level].t_ppm == 0, "guard regressed: EMD must be 0, not NULL"
        assert tc[level].breach_classes == 0
        assert tc[level].breach_ppm == 0

    lad = {
        r.level: r
        for r in REGISTRY["dq_release_ladder"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert set(lad) == {0, 1, 2}
    for level, r in lad.items():
        assert r.t_ppm == 0 and r.t_ok is True, (level, r)
        assert r.min_l == 1 and r.l_ok is False, (level, r)
        assert r.k_ok is True and r.release_ok is False, (level, r)


def test_sim_ivf_filtered_probe_curve_monotone_and_closure(spark):
    """sim_ivf_filtered_probe_curve: Python replica of the filtered
    recall curve (per-setting filtered IVF top-5 vs the exact
    pre-filtered top-5); recall monotone non-decreasing in n_probe
    (superset candidate sets); recall_ppm bounded by 1e6; non-vacuity
    (the curve must actually CLIMB somewhere — a flat curve would mean
    the probe setting changes nothing on this corpus); and the closure
    that the n_probe = 2 point equals sim_ivf_filtered's hit count."""
    import math

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("embeddings", ["vec_id", "label", "embedding"])
    vecs = {r[0]: (r[1], [float(x) for x in r[2]]) for r in rows}
    centroids = {i: v for i, (_l, v) in vecs.items() if i % 100 == 0}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(
            sum(x * x for x in b)
        )
        return round(num / den, 6)

    assign = {
        nid: min(((-cos(v, cv), cid) for cid, cv in centroids.items()))[1]
        for nid, (_l, v) in vecs.items()
    }
    exact = set()
    probe_rank = {}
    for qid, (qlabel, qv) in vecs.items():
        if qid >= 10:
            continue
        probe_rank[qid] = [
            cid
            for _c, cid in sorted(
                ((-cos(qv, cv), cid) for cid, cv in centroids.items())
            )
        ]
        for _c, nid in sorted(
            (
                (-cos(qv, cv), nid)
                for nid, (label, cv) in vecs.items()
                if nid != qid and label == qlabel
            )
        )[:5]:
            exact.add((qid, nid))

    expect = {}
    for np_ in (1, 2, 4):
        hits = 0
        for qid, (qlabel, qv) in vecs.items():
            if qid >= 10:
                continue
            probes = set(probe_rank[qid][:np_])
            cands = [
                (cos(qv, cv), nid)
                for nid, (label, cv) in vecs.items()
                if nid != qid and label == qlabel and assign[nid] in probes
            ]
            for _c, nid in sorted(cands, key=lambda t: (-t[0], t[1]))[:5]:
                if (qid, nid) in exact:
                    hits += 1
        expect[np_] = (
            len({q for q, _n in exact}),
            hits,
            hits * 1_000_000 // len(exact) if exact else 0,
        )

    got = {
        r.n_probe: (r.n_queries, r.n_hits, r.recall_ppm)
        for r in REGISTRY["sim_ivf_filtered_probe_curve"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    assert got == expect

    rec = [got[np_][2] for np_ in (1, 2, 4)]
    assert rec == sorted(rec), "recall must be monotone in n_probe"
    assert all(0 <= r <= 1_000_000 for r in rec)
    assert rec[0] < rec[-1], (
        "corpus too degenerate: the filtered probe curve is flat"
    )

    flags = (
        REGISTRY["sim_ivf_filtered"].fn(spark, SF_SMOKE).collect()
    )
    assert got[2][1] == sum(1 for r in flags if r.in_exact_top5)


def test_sim_ivf_filtered_replica_and_recall_closure(spark):
    """sim_ivf_filtered: full Python replica of the filtered IVF path —
    deterministic centroids (vec_id % 100 == 0), rounded-cosine
    inverted-file assignment with the cid tie-break, 2-probe lists,
    same-label candidates only, round-6 top-5 — including the
    in_exact_top5 flag; non-vacuity BOTH ways (this corpus must yield
    at least one hit and one miss, or the recall readout is
    meaningless); and the cross-query closure VERDICT r12 asked for:
    the hit flag must agree row-for-row with membership in
    sim_filtered_topk's certified exact pre-filtered top-5."""
    import math

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("embeddings", ["vec_id", "label", "embedding"])
    vecs = {r[0]: (r[1], [float(x) for x in r[2]]) for r in rows}
    centroids = {i: v for i, (_l, v) in vecs.items() if i % 100 == 0}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(
            sum(x * x for x in b)
        )
        return round(num / den, 6)

    assign = {
        nid: min(
            ((-cos(v, cv), cid) for cid, cv in centroids.items())
        )[1]
        for nid, (_l, v) in vecs.items()
    }

    expect = {}
    for qid, (qlabel, qv) in vecs.items():
        if qid >= 10:
            continue
        probes = {
            cid
            for _c, cid in sorted(
                ((-cos(qv, cv), cid) for cid, cv in centroids.items())
            )[:2]
        }
        cands = [
            (cos(qv, cv), nid, label)
            for nid, (label, cv) in vecs.items()
            if nid != qid and label == qlabel and assign[nid] in probes
        ]
        exact5 = {
            nid
            for _c, nid in sorted(
                (
                    (-cos(qv, cv), nid)
                    for nid, (label, cv) in vecs.items()
                    if nid != qid and label == qlabel
                )
            )[:5]
        }
        for i, (c, nid, label) in enumerate(
            sorted(cands, key=lambda t: (-t[0], t[1]))[:5]
        ):
            expect[(qid, nid)] = (label, c, i + 1, nid in exact5)

    got = {
        (r.query_id, r.neighbor_id): (
            r.label,
            r.cosine,
            r.rank,
            r.in_exact_top5,
        )
        for r in REGISTRY["sim_ivf_filtered"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect

    hits = [h for (_l, _c, _r, h) in got.values()]
    assert any(hits), "corpus too degenerate: the probe found nothing"
    assert not all(hits), (
        "corpus too degenerate: no probe miss — the recall readout is "
        "vacuous"
    )

    sft = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["sim_filtered_topk"].fn(spark, SF_SMOKE).collect()
    }
    for (qid, nid), (_l, _c, _r, hit) in got.items():
        assert hit == ((qid, nid) in sft)


def test_k_anonymity_lattice_replica_and_monotonicity(spark):
    """dq_k_anonymity: exact Python replica of all three lattice levels
    (equivalence classing on the quasi-identifier ladder, k < 5 risk
    accounting, floored ppm), plus the lattice monotonicity laws the
    docstring claims — coarser level ⇒ classes are unions of finer
    classes ⇒ n_classes and risk_classes and risk_rows non-increasing,
    min_k non-decreasing, n_rows invariant — asserted on the actual
    output, not assumed."""
    import math
    from collections import Counter

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table(
        "customer", ["c_nationkey", "c_mktsegment", "c_acctbal"]
    )
    expect = {}
    for level in (0, 1, 2):
        classes = Counter()
        for nat, seg, bal in rows:
            band = int(math.floor(bal / 1000))
            key = {0: (nat, seg, band), 1: (nat, seg), 2: (nat,)}[level]
            classes[key] += 1
        ks = list(classes.values())
        risk = [k for k in ks if k < 5]
        expect[level] = (
            len(ks),
            sum(ks),
            min(ks),
            len(risk),
            sum(risk),
            (1_000_000 * sum(risk)) // sum(ks),
        )

    got = {
        r.level: (
            r.n_classes,
            r.n_rows,
            r.min_k,
            r.risk_classes,
            r.risk_rows,
            r.risk_ppm,
        )
        for r in REGISTRY["dq_k_anonymity"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect

    for lo, hi in ((0, 1), (1, 2)):
        assert got[lo][0] >= got[hi][0]  # n_classes non-increasing
        assert got[lo][1] == got[hi][1]  # row total invariant
        assert got[lo][2] <= got[hi][2]  # min_k non-decreasing
        assert got[lo][3] >= got[hi][3]  # risk_classes non-increasing
        assert got[lo][4] >= got[hi][4]  # risk_rows non-increasing


def test_floordiv_cols_adversarial_values(spark):
    """_floordiv_cols backs every ppm/e6 ratio in the registry; pin its
    correction branches directly against Python integer floor division:
    exact quotients, HALF_UP-estimate-too-high (x.9999995 rounds up at
    Spark's derived scale 6 — the branch the helper exists for), the
    half-boundary just above an integer, den = 0, and in-domain huge
    values (quotient up to 10^31, numerators to 10^37)."""
    from dend_spark_data_lake_spark.queries import _floordiv_cols

    cases = [
        (0, 1),
        (1, 1),
        (1, 3),
        (2, 3),
        (5, 0),
        (3_999_999, 2_000_000),  # 1.9999995 -> HALF_UP estimate 2, floor 1
        (4_000_001, 2_000_000),  # 2.0000005 -> floor 2
        (2**63 - 1, 1),  # largest BIGINT-representable quotient
        (10**37, 10**19),
        (999_999_999_999, 1_000_000),
        (10**36 + 1, 10**18),
        (123456789012345678901234567, 987654321),
        (10**37 - 1, 10**19 + 7),
    ]
    df = spark.createDataFrame(
        [(str(n), str(d)) for n, d in cases], "n string, d string"
    ).selectExpr(
        "CAST(n AS DECIMAL(38,0)) AS n", "CAST(d AS DECIMAL(38,0)) AS d"
    )
    got = {(r.n, r.d): r.q for r in _floordiv_cols(df, "n", "d", "q").collect()}
    for n, d in cases:
        expect = 0 if d == 0 else n // d
        assert got[(n, d)] == expect, (n, d, got[(n, d)], expect)


def test_floordiv_cols_fails_loudly_outside_domain(spark):
    """Outside the documented domain the helper must RAISE (ANSI decimal
    or bigint overflow), never return a silently wrong floor: a quotient
    beyond BIGINT, a quotient beyond DECIMAL(38,6)'s integral capacity,
    and a numerator so close to the 38-digit cap that the correction's
    (est+1)*den comparison overflows."""
    import pytest

    from dend_spark_data_lake_spark.queries import _floordiv_cols

    for n, d in ((2**63, 1), (10**37, 3), (10**38 - 1, 10**7)):
        df = spark.createDataFrame(
            [(str(n), str(d))], "n string, d string"
        ).selectExpr(
            "CAST(n AS DECIMAL(38,0)) AS n", "CAST(d AS DECIMAL(38,0)) AS d"
        )
        with pytest.raises(Exception):
            _floordiv_cols(df, "n", "d", "q").collect()


def test_text_family_unicode_cross_engine(spark, tmp_path):
    """The driver fixtures are ASCII, so the text family's
    lower()/trim()/length()/split() paths have never been
    parity-checked on unicode — a latent seam if the testdata ever
    gains it. A corpus with umlauts, eszett case-folding (GRÖSSE),
    CJK, and combining-accent latin must hash-match across engines for
    the representative text queries (char-length semantics, unicode
    lowercasing, and whitespace splitting all agree)."""
    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.oracle_utils import compare

    rows = [
        (1, "de", "Straße GRÖSSE müde Äpfel der und", "web"),
        (2, "zh", "你好 世界 数据 湖 的", "web"),
        (3, "en", "Cafe CAFÉ naïve coöperate the a of", "books"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, text string, source string"
    ).selectExpr(
        "doc_id", "text", "lang", "source",
        "CAST(length(text) AS LONG) AS n_chars",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    for name in (
        "text_token_counts",
        "tokenizer_fertility_by_lang",
        "text_quality",
        "text_normalize",
    ):
        spec = REGISTRY[name]
        problems = compare(spec.fn(spark, str(tmp_path)), con, spec.oracle)
        assert not problems, (name, problems)


@pytest.mark.nightly  # heavyweight replay: default tier must fit the driver's verify budget (r15)
def test_text_family_null_and_blank_text_cross_engine(spark, tmp_path):
    """NULL text, the empty string, and whitespace-only text never occur
    in the driver fixtures, yet every text-family query has an implicit
    stance on them (split(NULL) propagates NULL and explodes to zero
    rows; trim('') drops; the BPE chain's regexp contract filters them).
    Pin that both engines take the SAME stance across the text, BPE, and
    curation representatives — including the whitespace-token subtlety
    that splitting '   ' yields empty-string tokens, not nothing."""
    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.oracle_utils import compare

    rows = [
        (1, "en", "the quick brown fox the", "web"),
        (2, "en", None, "web"),
        (3, "fr", "", "web"),
        (4, "de", "   ", "books"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, text string, source string"
    ).selectExpr(
        "doc_id", "text", "lang", "source",
        "CAST(coalesce(length(text), 0) AS LONG) AS n_chars",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    for name in (
        "text_token_counts",
        "tokenizer_fertility_by_lang",
        "text_quality",
        "text_normalize",
        "pipeline_bpe_encode",
        "tokenize_bpe_merge_trajectory",
        "curation_token_budget",
        "dedup_exact_docs",
    ):
        spec = REGISTRY[name]
        problems = compare(spec.fn(spark, str(tmp_path)), con, spec.oracle)
        assert not problems, (name, problems)


def test_attribution_grid_with_unattributable_purchases(spark, tmp_path):
    """events_attribution_window_curve's other degenerate branch: the
    corpus HAS purchases but not a single same-user preceding view, so
    every delta is NULL — the curve must report n_purchases > 0 with
    n_attributed = attributed_ppm = 0 on all four grid rows, on both
    engines (the conditional aggregate's NULL-condition -> 0 path and
    the oracle's delta IS NOT NULL filter must agree)."""
    import datetime

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.oracle_utils import compare

    base = datetime.datetime(2024, 3, 1)
    rows = []
    for i in range(30):
        # views and purchases on DISJOINT users; views also come AFTER
        # the user's purchases where users repeat, so no running max hits
        rows.append(
            (
                i,
                i % 5,
                "purchase",
                base + datetime.timedelta(minutes=i),
            )
        )
        rows.append(
            (
                100 + i,
                10 + i % 5,
                "view",
                base + datetime.timedelta(minutes=i),
            )
        )
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    spec = REGISTRY["events_attribution_window_curve"]
    got = spec.fn(spark, str(tmp_path)).collect()
    assert [r.window_s for r in got] == [3600, 21600, 86400, 259200], got
    assert all(r.n_purchases == 30 for r in got), got
    assert all(
        r.n_attributed == 0 and r.attributed_ppm == 0 for r in got
    ), got
    problems = compare(spec.fn(spark, str(tmp_path)), con, spec.oracle)
    assert not problems, problems


def test_bpe_trajectory_tiebreak_cross_engine(spark, tmp_path):
    """The BPE argmax tie-break (count desc, then LEXICOGRAPHIC (l, r))
    on a corpus crafted to tie twice: step 1 ties (a,b) vs (c,d) at
    count 3 (l-level tie), step 3 ties (x,y) vs (x,z) at count 2
    (r-level tie under the same l). Both engines must learn the
    identical merge table — the natural fixtures never hit an exact
    tie, so this is the only executable check that Spark's orderBy and
    DuckDB's ORDER BY break ties the same way on multi-engine string
    comparison. Also pins the exact expected table, so a tie-break
    regression is attributed, not just detected."""
    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.oracle_utils import compare

    df = spark.createDataFrame(
        [(1, "en", "ab ab ab cd cd cd xy xy xz xz")],
        "doc_id long, lang string, text string",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    spec = REGISTRY["tokenize_bpe_merge_trajectory"]
    got = [
        (r.merge_step, r.left_sym, r.right_sym, r.pair_n)
        for r in spec.fn(spark, str(tmp_path)).collect()
    ]
    assert got == [(1, "a", "b", 3), (2, "c", "d", 3), (3, "x", "y", 2)]
    problems = compare(spec.fn(spark, str(tmp_path)), con, spec.oracle)
    assert not problems, problems


def test_bpe_tiebreak_multichar_symbols_cross_engine(spark, tmp_path):
    """Tie-break on MULTI-character symbols: after step 1 merges (a,b),
    step 2 ties (ab,c) vs (ab,d) at count 2 — the left symbol is now the
    two-character 'ab', so an engine that compared symbols length-first
    (or by any non-codepoint collation) would diverge here while passing
    every single-character tie. Both engines must pick (ab,c)."""
    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.oracle_utils import compare

    df = spark.createDataFrame(
        [(1, "en", "abc abc abd abd")],
        "doc_id long, lang string, text string",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    spec = REGISTRY["tokenize_bpe_merge_trajectory"]
    got = [
        (r.merge_step, r.left_sym, r.right_sym, r.pair_n)
        for r in spec.fn(spark, str(tmp_path)).collect()
    ]
    assert got[:2] == [(1, "a", "b", 4), (2, "ab", "c", 2)], got
    problems = compare(spec.fn(spark, str(tmp_path)), con, spec.oracle)
    assert not problems, problems


@pytest.mark.nightly  # heavyweight replay: default tier must fit the driver's verify budget (r15)
def test_bpe_serving_queries_on_degenerate_corpora(spark, tmp_path):
    """The three round-10 BPE serving queries on the two corpora their
    shared training chain treats specially: (a) a single-word corpus
    whose training DRIES UP before the third merge ('aaaa' -> (a,a) ->
    (aa,aa) -> no pairs), so the Spark side must encode with the
    carried-forward final stage exactly as the oracle's LEFT-JOIN chain
    does; (b) a corpus with NO in-contract words at all, where the
    encode and OOV audits emit zero rows on both engines and the budget
    query selects EVERY document at zero cost (total = budget = 0 and
    the inclusive cum <= budget keeps all zero-cost rows). Cross-engine
    compared per query, with the budget shape asserted explicitly."""
    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.oracle_utils import compare

    cases = {
        "dry": [
            (i, "en" if i % 2 == 0 else "fr", "aaaa aaaa") for i in range(20)
        ],
        "nowords": [
            (i, "en" if i % 2 == 0 else "fr", "123 456 %%%") for i in range(10)
        ],
    }
    for name, rows in cases.items():
        path = tmp_path / name
        df = spark.createDataFrame(
            rows, "doc_id long, lang string, text string"
        )
        df.coalesce(1).write.parquet(str(path / "documents.parquet"))
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{path}/documents.parquet/*.parquet')"
        )
        for qname in (
            "pipeline_bpe_encode",
            "tokenize_bpe_oov_audit",
            "curation_bpe_token_budget",
            # round-11: the rate-distortion curve rides the same chain at
            # t=5 — 'dry' exercises the stage-clamp / LEFT-JOIN
            # carry-forward, 'nowords' the NULL-base (empty-aggregate)
            # path on both engines
            "tokenize_bpe_rate_distortion",
        ):
            spec = REGISTRY[qname]
            problems = compare(spec.fn(spark, str(path)), con, spec.oracle)
            assert not problems, (name, qname, problems)
        got = {
            r.lang: (r.n_selected, r.symbols_selected)
            for r in REGISTRY["curation_bpe_token_budget"]
            .fn(spark, str(path))
            .collect()
        }
        if name == "nowords":
            # zero-cost corpus: budget 0 keeps every (free) document
            assert got == {"en": (5, 0), "fr": (5, 0)}, got
        else:
            # dried training still prices: 'aaaa' costs 1 trained symbol,
            # each doc holds 2 occurrences; 40% of 40 symbols = 16 -> the
            # first 8 docs by (score, doc_id) fit
            assert sum(n for n, _ in got.values()) == 8, got
            assert sum(s for _, s in got.values()) == 16, got
        con.close()


def test_bpe_oov_audit_nonzero_oov_path(spark, tmp_path):
    """The driver fixtures share one template vocabulary between the
    train and batch slices, so the natural corpus exercises only the
    OOV=0 branch; this synthetic corpus puts NOVEL words in the arriving
    batch (doc_id % 10 >= 8) and pins the fallback path cross-engine:
    nonzero n_oov_words, oov_char_symbols = the exact character mass of
    the novel words, and both engines agree value-for-value."""
    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.oracle_utils import compare

    rows = []
    for i in range(40):  # train slice: doc_id 0..39 -> % 10 < 8 for most
        rows.append((i, "en", "alpha beta gamma alpha beta"))
    rows.append((8, "en", "alpha beta"))  # ensure batch ids exist
    rows.append((18, "en", "alpha novelword beta"))
    rows.append((28, "en", "zzz alpha"))
    rows.append((19, "fr", "beta unknownterm unknownterm"))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    spec = REGISTRY["tokenize_bpe_oov_audit"]
    got = {r.lang: r for r in spec.fn(spark, str(tmp_path)).collect()}
    assert got["en"].n_oov_words == 2, got  # novelword + zzz
    assert got["en"].oov_char_symbols == len("novelword") + len("zzz")
    assert got["fr"].n_oov_words == 2  # unknownterm twice
    assert got["fr"].oov_char_symbols == 2 * len("unknownterm")
    problems = compare(spec.fn(spark, str(tmp_path)), con, spec.oracle)
    assert not problems, problems


@pytest.mark.nightly  # heavyweight replay: default tier must fit the driver's verify budget (r15)
def test_pq_bits_tradeoff_matches_bruteforce(spark):
    """embed_pq_bits_tradeoff: all three training trajectories (m = 4,
    8, 16) recomputed in plain Python via the shared replica — plus the
    curve's reason to exist on this fixture: total distortion strictly
    decreases as bits increase."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("embeddings", ["vec_id", "embedding"])
    expect = {}
    for m in (4, 8, 16):
        _, assign = _pq_train_replica(rows, m=m)
        tot = sum(d2 for _, d2 in assign.values())
        used = {(s, j) for (_, s), (j, _) in assign.items()}
        expect[m] = (m * 3, tot, len(used))
    got = {
        r.n_subspaces: (r.bits_per_vector, r.total_d2, r.n_codes_used)
        for r in REGISTRY["embed_pq_bits_tradeoff"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert expect[4][1] > expect[8][1] > expect[16][1]


@pytest.mark.nightly  # heavyweight replay: default tier must fit the driver's verify budget (r15)
def test_ann_grid_preserved_on_empty_query_slice(spark, tmp_path):
    """pipeline_ann_serving / pipeline_ann_rerank docstring claim, made
    executable: on a corpus whose vec_ids all exceed the query cap (so
    the query slice is EMPTY), both engines must still emit the full
    probe/stage grid with zero counts — the grid-preserving LEFT JOIN /
    1-row-aggregate shape that sim_ivf_probe_curve adopted once it left
    the frozen grading window (ADVICE r8, applied round 10). Cross-engine
    compared on the same synthetic parquet, not just row-counted."""
    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.oracle_utils import compare

    rows = [
        (
            100 + i,
            [((100 + i) * 31 + d * 7) % 97 / 50.0 - 0.9 for d in range(64)],
            i % 3,
        )
        for i in range(100)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "embeddings.parquet"))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet/*.parquet')"
    )
    for name, n_rows in (
        ("pipeline_ann_serving", 3),
        ("pipeline_ann_rerank", 2),
        ("sim_ivf_probe_curve", 3),
    ):
        spec = REGISTRY[name]
        out = spec.fn(spark, str(tmp_path))
        got = out.collect()
        assert len(got) == n_rows, (name, got)
        assert all(r.n_hits == 0 and r.recall_ppm == 0 for r in got), got
        problems = compare(spec.fn(spark, str(tmp_path)), con, spec.oracle)
        assert not problems, (name, problems)


def test_attribution_grid_preserved_on_zero_purchases(spark, tmp_path):
    """events_attribution_window_curve grid preservation (the other half
    of the deferred ADVICE r8 fix): on an events table with ZERO purchase
    rows, both engines must still emit the full 4-row window grid with
    n_purchases = n_attributed = attributed_ppm = 0 — the 1-row
    conditional-aggregate + stack shape never drops grid rows."""
    import datetime

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.oracle_utils import compare

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (
            i,
            i % 7,
            "view" if i % 2 == 0 else "click",
            base + datetime.timedelta(minutes=i),
        )
        for i in range(50)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    spec = REGISTRY["events_attribution_window_curve"]
    got = spec.fn(spark, str(tmp_path)).collect()
    assert [r.window_s for r in got] == [3600, 21600, 86400, 259200], got
    assert all(
        r.n_purchases == 0 and r.n_attributed == 0 and r.attributed_ppm == 0
        for r in got
    ), got
    problems = compare(spec.fn(spark, str(tmp_path)), con, spec.oracle)
    assert not problems, problems


def test_ann_index_maintenance_matches_bruteforce(spark):
    """ann_index_maintenance: coarse assignment of the full corpus to
    the frozen centroid set, the built-vs-upsert split, per-list ppm
    shares, and the integer-cross-multiplied hot-list trigger recomputed
    in plain Python — plus the closure law (lists partition the corpus:
    Σ n_after = |corpus|)."""
    import math
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("embeddings", ["vec_id", "embedding"])
    q = {
        vid: [math.floor(float(x) * 1024 + 0.5) for x in emb]
        for vid, emb in rows
    }
    cents = {vid: xq for vid, xq in q.items() if vid % 100 == 0}

    def l2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    lists = defaultdict(lambda: [0, 0])
    for vid, xq in q.items():
        _, cid = min((l2(xq, c), cid) for cid, c in cents.items())
        lists[cid][0 if vid % 10 < 8 else 1] += 1
    t = sum(b + u for b, u in lists.values())
    nl = len(lists)
    expect = {
        cid: (
            b,
            u,
            b + u,
            1_000_000 * (b + u) // t,
            (b + u) * nl > 2 * t,
        )
        for cid, (b, u) in lists.items()
    }
    got = {
        r.cid: (r.n_built, r.n_upserts, r.n_after, r.share_ppm, r.is_hot)
        for r in REGISTRY["ann_index_maintenance"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert sum(v[2] for v in expect.values()) == len(rows)


@pytest.mark.nightly  # heavyweight replay: default tier must fit the driver's verify budget (r15)
def test_bpe_grid_preserved_when_training_dries_up(spark, tmp_path):
    """BPE dry-out parity, made executable (found by the round-9 code
    review): on a corpus whose vocabulary exhausts its merges early
    (single word 'ab' — one merge, then no pairs), the compression
    query must still emit the full 4-row stage grid with the dried-up
    stages repeating the prior vocabulary, on BOTH engines (the
    oracle's LEFT JOIN carry-forward vs bpe_train's early break + stage
    padding); the trajectory must emit exactly the 1 applied merge on
    both (its oracle unions empty m-CTEs away)."""
    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.oracle_utils import compare

    df = spark.createDataFrame(
        [(1, "ab AB ab!", "en", 9, "s1")],
        "doc_id long, text string, lang string, n_chars int, source string",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    comp = REGISTRY["tokenize_bpe_compression"]
    rows = comp.fn(spark, str(tmp_path)).collect()
    # 'ab AB ab!' lowers to vocab {'ab': 2} ('ab!' fails ^[a-z]+$):
    # stage 0 = <a><b> (2 symbols, corpus cost 4), one merge -> <ab>,
    # stages 2 and 3 repeat stage 1
    assert [
        (r.stage, r.n_distinct_symbols, r.corpus_symbols) for r in rows
    ] == [(0, 2, 4), (1, 1, 2), (2, 1, 2), (3, 1, 2)]
    assert not compare(comp.fn(spark, str(tmp_path)), con, comp.oracle)
    traj = REGISTRY["tokenize_bpe_merge_trajectory"]
    got = traj.fn(spark, str(tmp_path)).collect()
    assert [
        (r.merge_step, r.left_sym, r.right_sym, r.pair_n) for r in got
    ] == [(1, "a", "b", 2)]
    assert not compare(traj.fn(spark, str(tmp_path)), con, traj.oracle)
    # round-11: the rate-distortion curve on the same dried corpus —
    # budgets 1/3/5 all carry the one-merge stage forward; saved = 2 of
    # the 4 baseline symbols (500000 ppm exactly), per-merge floors to
    # 2/1, 2//3, 2//5
    rd = REGISTRY["tokenize_bpe_rate_distortion"]
    got_rd = rd.fn(spark, str(tmp_path)).collect()
    assert [
        (
            r.n_merges,
            r.n_distinct_symbols,
            r.corpus_symbols,
            r.saved_symbols,
            r.saved_ppm,
            r.saved_per_merge,
        )
        for r in got_rd
    ] == [
        (0, 2, 4, 0, 0, 0),
        (1, 1, 2, 2, 500000, 2),
        (3, 1, 2, 2, 500000, 0),
        (5, 1, 2, 2, 500000, 0),
    ]
    assert not compare(rd.fn(spark, str(tmp_path)), con, rd.oracle)


def _chunk_minhash_replica():
    """Python replica of the chunk-grain near-dup relation: certified
    64/48 chunker -> lowercased distinct word-3-gram shingles ->
    md5-portable 8-hash MinHash -> 4x2 banded candidates -> exact
    Jaccard >= 0.5. Returns (chunks, sets, pairs): ckey -> raw token
    slice, ckey -> shingle set, (ka, kb) -> exact jaccard float."""
    import hashlib
    import re
    from collections import defaultdict

    docs = _smoke_table("documents", ["doc_id", "text"])
    chunks = {}
    for doc_id, text in docs:
        if text.strip() == "":
            continue
        t = re.split(r"\s+", text.strip())
        n = len(t)
        n_chunks = 1 + ((n - 64 + 47) // 48 if n > 64 else 0)
        for k in range(n_chunks):
            chunks[doc_id * 1_000_000 + k] = t[k * 48 : k * 48 + min(64, n - k * 48)]
    sets = {}
    for ckey, ct in chunks.items():
        lt = [x.lower() for x in ct]
        sh = {" ".join(lt[i : i + 3]) for i in range(len(lt) - 2)}
        if sh:
            sets[ckey] = sh

    def mh(i, s):
        return int(hashlib.md5(f"{i}:{s}".encode()).hexdigest()[:15], 16)

    sig = {
        k: [min(mh(i, s) for s in sh) for i in range(8)]
        for k, sh in sets.items()
    }
    buckets = defaultdict(list)
    for k, m in sig.items():
        for b in range(4):
            buckets[(b, f"{m[2 * b]}_{m[2 * b + 1]}")].append(k)
    cand = set()
    for ks in buckets.values():
        ks = sorted(ks)
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                cand.add((ks[i], ks[j]))
    pairs = {}
    for a, b in cand:
        sa, sb = sets[a], sets[b]
        ni = len(sa & sb)
        jac = ni / (len(sa) + len(sb) - ni)
        if jac >= 0.5:
            pairs[(a, b)] = jac
    return chunks, sets, pairs


def test_chunk_minhash_replica_and_laws(spark):
    """dedup_chunk_minhash: exact Python replica of the whole relation
    (chunker, shingles, md5 MinHash, banding, verify), plus the laws:
    canonical ordering (doc_a, chunk_a) < (doc_b, chunk_b) with
    doc_a < doc_b strictly (cross-document by contract); jaccard in
    [0.5, 1]; and non-vacuity BOTH ways — at least one exact pair
    (jaccard = 1) and at least one genuinely FUZZY pair (jaccard < 1),
    so the query demonstrably finds what exact hashing cannot."""
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    _chunks, _sets, pairs = _chunk_minhash_replica()
    expect = {
        (a // 1_000_000, a % 1_000_000, b // 1_000_000, b % 1_000_000): j
        for (a, b), j in pairs.items()
        if a // 1_000_000 != b // 1_000_000
    }
    got = {
        (r.doc_a, r.chunk_a, r.doc_b, r.chunk_b): r.jaccard
        for r in REGISTRY["dedup_chunk_minhash"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expect)
    for k, v in got.items():
        assert abs(v - expect[k]) < 1e-6, (k, v, expect[k])
        assert 0.5 <= v <= 1.0
        assert k[0] < k[2], k
    assert any(v == 1.0 for v in got.values()), "no exact pair found"
    assert any(v < 1.0 for v in got.values()), (
        "no fuzzy pair: the near-dup pass adds nothing over exact here"
    )


def test_chunk_doc_overlap_closure(spark):
    """dedup_chunk_doc_overlap is EXACTLY the doc-pair rollup of
    dedup_chunk_minhash (cross-query closure): pair counts, distinct
    matched-chunk coverage on both sides, ppm as exact floored ints of
    the certified chunker's per-doc chunk counts; coverage bounded by
    1e6; every reported doc pair has >= 1 pair."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    pair_rows = REGISTRY["dedup_chunk_minhash"].fn(spark, SF_SMOKE).collect()
    nch = defaultdict(int)
    for r in (
        REGISTRY["text_chunk_windows"].fn(spark, SF_SMOKE).collect()
    ):
        nch[r.doc_id] += 1
    agg = defaultdict(lambda: [0, set(), set()])
    for r in pair_rows:
        a = agg[(r.doc_a, r.doc_b)]
        a[0] += 1
        a[1].add(r.chunk_a)
        a[2].add(r.chunk_b)
    expect = {
        (da, db): (
            n,
            nch[da],
            nch[db],
            len(ca) * 1_000_000 // nch[da],
            len(cb) * 1_000_000 // nch[db],
        )
        for (da, db), (n, ca, cb) in agg.items()
    }
    got = {
        (r.doc_a, r.doc_b): (
            r.n_pairs,
            r.n_chunks_a,
            r.n_chunks_b,
            r.cov_a_ppm,
            r.cov_b_ppm,
        )
        for r in (
            REGISTRY["dedup_chunk_doc_overlap"].fn(spark, SF_SMOKE).collect()
        )
    }
    assert got == expect
    for (da, db), (n, _na, _nb, ca, cb) in got.items():
        assert n >= 1 and 0 < ca <= 1_000_000 and 0 < cb <= 1_000_000


def test_chunk_near_tax_replica_and_laws(spark):
    """curation_chunk_near_tax: Python replica over the replica pair
    relation (exact losers = all-but-one per identical RAW chunk text;
    near losers = every chunk with a smaller-key matched partner), plus
    the subset law the report exists to demonstrate:
    near_loser_tokens >= exact_loser_tokens ALWAYS (identical chunks
    always band together), strict on this corpus (fuzzy_gain_ppm > 0 —
    the budget case for the fuzzy pass), and the grain closure that
    n_chunks / chunk_tokens equal the shingleable (>= 3 token) slice of
    the certified chunker output."""
    from collections import defaultdict

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    chunks, sets, pairs = _chunk_minhash_replica()
    sing = {k: v for k, v in chunks.items() if len(v) >= 3}
    assert set(sing) == set(sets)
    groups = defaultdict(list)
    for k, ct in sing.items():
        groups[" ".join(ct)].append(len(ct))
    n_chunks = sum(len(v) for v in groups.values())
    chunk_tokens = sum(sum(v) for v in groups.values())
    exact_loser = sum(sum(v) - min(v) for v in groups.values())
    losers = {b for _a, b in pairs}
    near_loser = sum(len(sing[k]) for k in losers)

    row = (
        REGISTRY["curation_chunk_near_tax"].fn(spark, SF_SMOKE).collect()[0]
    )
    assert row.n_chunks == n_chunks
    assert row.chunk_tokens == chunk_tokens
    assert row.exact_loser_tokens == exact_loser
    assert row.near_loser_tokens == near_loser
    assert row.exact_dup_ppm == exact_loser * 1_000_000 // chunk_tokens
    assert row.near_dup_ppm == near_loser * 1_000_000 // chunk_tokens
    assert row.near_loser_tokens >= row.exact_loser_tokens
    assert row.fuzzy_gain_ppm > 0, (
        "corpus too degenerate: fuzzy pass reclaims nothing over exact"
    )


def test_chunk_clusters_replica_and_laws(spark):
    """dedup_chunk_clusters: union-find replica of the transitive
    closure over the replica pair graph — membership is exactly the
    pair graph's vertex set, every cluster label is the component's
    minimum packed key AND a member of the component, and both
    endpoints of every mined pair land in the same cluster."""
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    _chunks, _sets, pairs = _chunk_minhash_replica()
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {k: find(k) for k in parent}
    mins = {}
    for k, c in comp.items():
        mins[c] = min(mins.get(c, k), k)
    expect = {
        (k // 1_000_000, k % 1_000_000): (
            mins[c] // 1_000_000,
            mins[c] % 1_000_000,
        )
        for k, c in comp.items()
    }
    got = {
        (r.doc_id, r.chunk_idx): (r.cluster_doc, r.cluster_chunk)
        for r in (
            REGISTRY["dedup_chunk_clusters"].fn(spark, SF_SMOKE).collect()
        )
    }
    assert got == expect
    labels = set(expect.values())
    assert labels <= set(expect), "a cluster label is not itself a member"
    # transitivity non-vacuity: some component must have > 2 members,
    # i.e. {a,b},{b,c} genuinely collapsed even though (a,c) may never
    # have been a mined pair — otherwise this query is just the pair
    # list re-keyed
    from collections import Counter

    sizes = Counter(expect.values())
    assert max(sizes.values()) > 2, dict(sizes)


def test_mmr_rerank_replica_and_laws(spark):
    """sim_mmr_rerank: Python replica of the greedy MMR selection
    (exact cosine top-10 candidates, lambda = 0.5 as the unscaled
    rel - max_sim difference, neighbor_id tie-break), plus the laws:
    pick 1 equals sim_cosine_topk's rank-1 neighbor (cross-query
    closure — same certified relevance order); mmr_score is
    non-increasing from pick 2 onward (pick 1 is pure relevance, a
    different objective — a negative max_sim can push pick 2 above
    it); each query selects exactly 5 distinct candidates from its
    top-10; and the selection diverges from plain top-5 for at least
    one query (non-vacuity: MMR must actually trade relevance for
    diversity on this corpus)."""
    from decimal import ROUND_HALF_UP, Decimal

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    def r6(x):
        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )

    emb = {
        vid: [float(x) for x in v]
        for vid, v in _smoke_table("embeddings", ["vec_id", "embedding"])
    }

    def cos(a, b):
        va, vb = emb[a], emb[b]
        dot = sum(x * y for x, y in zip(va, vb))
        na = sum(x * x for x in va) ** 0.5
        nb = sum(x * x for x in vb) ** 0.5
        return r6(dot / (na * nb))

    queries = sorted(v for v in emb if v < 10)
    expect = {}
    for q in queries:
        rel = {n: cos(q, n) for n in emb if n != q}
        cand = sorted(rel, key=lambda n: (-rel[n], n))[:10]
        sel = [min(cand, key=lambda n: (-rel[n], n))]
        for _step in range(4):
            rem = [n for n in cand if n not in sel]
            score = {
                n: rel[n] - max(cos(n, s) for s in sel) for n in rem
            }
            sel.append(min(rem, key=lambda n: (-score[n], n)))
        expect[q] = sel

    rows = REGISTRY["sim_mmr_rerank"].fn(spark, SF_SMOKE).collect()
    got = {}
    for r in rows:
        got.setdefault(r.query_id, {})[r.pick] = r
    assert set(got) == set(expect)
    top1 = {
        r.query_id: r.neighbor_id
        for r in REGISTRY["sim_cosine_topk"].fn(spark, SF_SMOKE).collect()
        if r.rank == 1
    }
    diverged = 0
    for q, sel in expect.items():
        picks = got[q]
        assert sorted(picks) == [1, 2, 3, 4, 5]
        assert [picks[i].neighbor_id for i in range(1, 6)] == sel, (
            q,
            sel,
            [picks[i].neighbor_id for i in range(1, 6)],
        )
        assert picks[1].neighbor_id == top1[q]
        assert picks[1].max_sim == 0.0
        for i in range(2, 5):
            assert picks[i].mmr_score >= picks[i + 1].mmr_score - 1e-12
        rel = {n: cos(q, n) for n in emb if n != q}
        plain5 = sorted(rel, key=lambda n: (-rel[n], n))[:5]
        if set(sel) != set(plain5):
            diverged += 1
    assert diverged > 0, "MMR never diverged from plain top-5"


@pytest.mark.nightly  # heavyweight replay: default tier must fit the driver's verify budget (r15)
def test_mmr_lambda_curve_replica_and_laws(spark):
    """sim_mmr_lambda_curve: full Python replica of the 4-row tradeoff
    curve (greedy MMR re-run at lambda in {0.25, 0.5, 0.75, 1.0} over
    the exact cosine top-10 grid, rolled up to integer-e6 relevance and
    selected-pair similarity masses), plus the laws: lambda = 1.0 is
    plain top-5 so its relevance mass dominates every row (top-5-by-rel
    maximizes relevance over any 5-subset — a theorem, not a corpus
    fact); mean selected-pair similarity is non-decreasing in lambda on
    this corpus and STRICTLY lower at 0.25 than at 1.0 (the diversity
    the re-rank actually buys — non-vacuity); and the lambda = 0.5
    rollup is exactly sim_mmr_rerank's selection re-aggregated
    (cross-query closure: positive scaling by the exact power of two
    preserves every IEEE comparison)."""
    from decimal import ROUND_HALF_UP, Decimal

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    def r6(x):
        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )

    def e6(x):
        return int(
            Decimal(repr(x * 1_000_000)).quantize(Decimal("1"), ROUND_HALF_UP)
        )

    emb = {
        vid: [float(x) for x in v]
        for vid, v in _smoke_table("embeddings", ["vec_id", "embedding"])
    }

    def cos(a, b):
        va, vb = emb[a], emb[b]
        dot = sum(x * y for x, y in zip(va, vb))
        na = sum(x * x for x in va) ** 0.5
        nb = sum(x * x for x in vb) ** 0.5
        return r6(dot / (na * nb))

    queries = sorted(v for v in emb if v < 10)
    expect = {}
    sels = {}
    for pct in (25, 50, 75, 100):
        lam = pct / 100.0
        n_picks = tot_rel = n_pairs = tot_sim = 0
        sels[pct] = {}
        for q in queries:
            rel = {n: cos(q, n) for n in emb if n != q}
            cand = sorted(rel, key=lambda n: (-rel[n], n))[:10]
            sel = [min(cand, key=lambda n: (-rel[n], n))]
            for _step in range(4):
                rem = [n for n in cand if n not in sel]
                score = {
                    n: lam * rel[n] - (1 - lam) * max(cos(n, s) for s in sel)
                    for n in rem
                }
                sel.append(min(rem, key=lambda n: (-score[n], n)))
            sels[pct][q] = sel
            n_picks += 5
            tot_rel += sum(e6(rel[n]) for n in sel)
            for a in sel:
                for b in sel:
                    if a < b:
                        n_pairs += 1
                        tot_sim += e6(cos(a, b))
        expect[pct] = (
            n_picks,
            tot_rel,
            tot_rel // n_picks,
            n_pairs,
            tot_sim,
            tot_sim // n_pairs,
        )

    rows = REGISTRY["sim_mmr_lambda_curve"].fn(spark, SF_SMOKE).collect()
    got = {
        r.lam_pct: (
            r.n_picks,
            r.sum_rel_e6,
            r.mean_rel_e6,
            r.n_pairs,
            r.sum_sim_e6,
            r.mean_sim_e6,
        )
        for r in rows
    }
    assert got == expect
    # lambda = 1.0 relevance dominance (theorem)
    assert all(got[100][1] >= got[p][1] for p in got)
    # diversity monotonicity on this corpus, strict at the extremes
    sim_by_lam = [got[p][5] for p in (25, 50, 75, 100)]
    assert sim_by_lam == sorted(sim_by_lam)
    assert got[25][5] < got[100][5], "lambda sweep bought no diversity"
    # lambda = 0.5 closure against sim_mmr_rerank's selection
    rerank = REGISTRY["sim_mmr_rerank"].fn(spark, SF_SMOKE).collect()
    rr_rel = sum(e6(r.relevance) for r in rerank)
    rr_sel = {}
    for r in rerank:
        rr_sel.setdefault(r.query_id, []).append(r.neighbor_id)
    assert {q: sorted(v) for q, v in rr_sel.items()} == {
        q: sorted(v) for q, v in sels[50].items()
    }
    assert got[50][1] == rr_rel


@pytest.mark.nightly  # heavyweight replay: default tier must fit the driver's verify budget (r15)
def test_pipeline_chunk_dedup_replica_and_laws(spark):
    """pipeline_chunk_dedup: union-find replica of the full pass
    accounting — totals at the FULL chunk grain, cluster membership
    over the mined pair graph, drops = non-label members priced in
    tokens — plus the law chain the report exists to demonstrate:
    kept + dropped partition the corpus exactly; every cluster keeps
    exactly one representative (clustered = n_clusters + dropped); the
    drop set is a superset of curation_chunk_near_tax's greedy
    smaller-partner losers (cross-query law: a smaller direct partner
    implies a smaller component label, never vice versa); and the ppm
    is the exact floor."""
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    chunks, _sets, pairs = _chunk_minhash_replica()
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {k: find(k) for k in parent}
    mins = {}
    for k, c in comp.items():
        mins[c] = min(mins.get(c, k), k)
    dropped = {k for k, c in comp.items() if k != mins[c]}
    n_chunks = len(chunks)
    chunk_tokens = sum(len(v) for v in chunks.values())
    dropped_tokens = sum(len(chunks[k]) for k in dropped)

    row = REGISTRY["pipeline_chunk_dedup"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_chunks == n_chunks
    assert row.chunk_tokens == chunk_tokens
    assert row.clustered_chunks == len(comp)
    assert row.n_clusters == len(mins)
    assert row.dropped_chunks == len(dropped)
    assert row.dropped_tokens == dropped_tokens
    assert row.kept_tokens == chunk_tokens - dropped_tokens
    assert row.dropped_ppm == dropped_tokens * 1_000_000 // chunk_tokens
    assert row.clustered_chunks == row.n_clusters + row.dropped_chunks
    # cross-query law chain: component drops >= greedy near losers
    # (>= exact losers, already pinned in the near-tax test)
    losers = {b for _a, b in pairs}
    assert losers <= dropped
    tax = REGISTRY["curation_chunk_near_tax"].fn(spark, SF_SMOKE).collect()[0]
    assert row.dropped_tokens >= tax.near_loser_tokens


@pytest.mark.nightly  # heavyweight replay: default tier must fit the driver's verify budget (r15)
def test_pipeline_chunk_dedup_bridge_strictness(spark, tmp_path):
    """pipeline_chunk_dedup vs curation_chunk_near_tax on a constructed
    BRIDGE corpus — the case where the component drop rule is STRICTLY
    stronger than the greedy smaller-partner rule: docs 1 and 2 share
    nothing, doc 3 overlaps both (jaccard exactly 0.5 each side, banded
    together under the certified md5 MinHash — verified offline), so
    the mined pairs are (1,3) and (2,3) only. Chunk 2 has no smaller
    direct partner (it is never a near-loser) yet its component label
    is 1, so the pass drops BOTH 2 and 3: dropped 13 tokens > near
    8 > exact 0 — the full chain strict on one corpus. Both reports
    are value-compared against their DuckDB oracles on the same
    corpus (cross-engine closure on a degenerate input)."""
    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.oracle_utils import compare

    df = spark.createDataFrame(
        [
            (1, "w12 w25 w26 w09 w15", "en", 19, "s1"),
            (2, "w09 w15 w11 w18 w06", "en", 19, "s1"),
            (3, "w12 w25 w26 w09 w15 w11 w18 w06", "en", 31, "s1"),
        ],
        "doc_id long, text string, lang string, n_chars int, source string",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    ded = REGISTRY["pipeline_chunk_dedup"]
    row = ded.fn(spark, str(tmp_path)).collect()[0]
    assert (
        row.n_chunks,
        row.chunk_tokens,
        row.n_clusters,
        row.clustered_chunks,
        row.dropped_chunks,
        row.dropped_tokens,
        row.kept_tokens,
        row.dropped_ppm,
    ) == (3, 18, 1, 3, 2, 13, 5, 13 * 1_000_000 // 18)
    tax = REGISTRY["curation_chunk_near_tax"]
    trow = tax.fn(spark, str(tmp_path)).collect()[0]
    assert trow.near_loser_tokens == 8
    assert trow.exact_loser_tokens == 0
    assert row.dropped_tokens > trow.near_loser_tokens
    assert trow.near_loser_tokens > trow.exact_loser_tokens
    assert not compare(ded.fn(spark, str(tmp_path)), con, ded.oracle)
    assert not compare(tax.fn(spark, str(tmp_path)), con, tax.oracle)


@pytest.mark.nightly  # heavyweight replay: default tier must fit the driver's verify budget (r15)
def test_sim_ivf_matryoshka_replica_and_closures(spark):
    """sim_ivf_matryoshka: the full slice-then-bucket pipeline
    (per-dim prefix slice, mod-100 centroids, rounded-cosine
    assignment, 2 probes, per-bucket top-5) and recall vs the
    FULL-WIDTH exact top-5, recomputed in numpy at each dim; the
    d = 64 row must equal sim_ivf_probe_curve's n_probe = 2 row
    EXACTLY (the slice is the identity — cross-query closure to the
    certified single-cut tier), and at every dim the combined
    truncation+bucketing recall is bounded by embed_matryoshka_recall's
    truncation-only recall on this corpus (bucketing can only lose
    candidates the sliced exact ranking would have kept — a corpus
    fact here, not a theorem: a pruned bucket could in principle evict
    a sliced-exact non-hit in favor of a hit)."""
    import numpy as np

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = _smoke_table("embeddings", ["vec_id", "embedding"])
    ids = np.array([r[0] for r in rows])
    X64 = np.array([r[1] for r in rows], dtype=np.float64)
    idx = {v: i for i, v in enumerate(ids)}
    cents = sorted(v for v in ids if v % 100 == 0)
    qids = sorted(v for v in ids if v < 10)

    nrm64 = np.sqrt((X64 * X64).sum(axis=1))
    exact = {}
    for q in qids:
        scored = sorted(
            (
                (
                    round(float(X64[idx[q]] @ X64[idx[x]] /
                                (nrm64[idx[q]] * nrm64[idx[x]])), 6),
                    -x,
                )
                for x in ids
                if x != q
            ),
            reverse=True,
        )[:5]
        exact[q] = {-s[1] for s in scored}
    n_pairs = sum(len(s) for s in exact.values())

    got = {
        r.dim: r
        for r in REGISTRY["sim_ivf_matryoshka"].fn(spark, SF_SMOKE).collect()
    }
    assert sorted(got) == [16, 32, 64]
    for d in (16, 32, 64):
        X = X64[:, :d]
        nrm = np.sqrt((X * X).sum(axis=1))

        def cos(i, j):
            return round(float(X[i] @ X[j] / (nrm[i] * nrm[j])), 6)

        assign = {}
        for v in ids:
            best = max(((cos(idx[v], idx[c]), -c) for c in cents))
            assign[v] = -best[1]
        buckets = {}
        for v, c in assign.items():
            buckets.setdefault(c, []).append(v)
        hits = 0
        for q in qids:
            probes = sorted(
                ((cos(idx[q], idx[c]), -c) for c in cents), reverse=True
            )[:2]
            cand = [
                x
                for _, negc in probes
                for x in buckets.get(-negc, [])
                if x != q
            ]
            topk = sorted(
                ((cos(idx[q], idx[x]), -x) for x in cand), reverse=True
            )[:5]
            hits += len({-t[1] for t in topk} & exact[q])
        r = got[d]
        assert (r.n_queries, r.n_hits, r.recall_ppm) == (
            len(qids),
            hits,
            (hits * 1_000_000) // n_pairs,
        ), (d, tuple(r))
    # closure: identity slice == the certified probe curve at n_probe=2
    pc = {
        r.n_probe: (r.n_hits, r.recall_ppm)
        for r in REGISTRY["sim_ivf_probe_curve"].fn(spark, SF_SMOKE).collect()
    }
    assert (got[64].n_hits, got[64].recall_ppm) == pc[2]
    # combined cut never beats the truncation-only cut on this corpus
    mat = {
        r.dim: r.recall_ppm
        for r in (
            REGISTRY["embed_matryoshka_recall"].fn(spark, SF_SMOKE).collect()
        )
    }
    for d in (16, 32, 64):
        assert got[d].recall_ppm <= mat[d], (d, got[d].recall_ppm, mat[d])


def test_dq_release_emit_refusal_and_ladder_closure(spark):
    """dq_release_emit at SF_SMOKE: NO ladder level passes release_ok
    on this corpus (verified against dq_release_ladder's rows), so the
    emit must be EMPTY — the honest refusal is a real code path, not a
    theoretical one. The emptiness closure is two-sided: empty iff the
    ladder shows no release_ok level."""
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    ladder = REGISTRY["dq_release_ladder"].fn(spark, SF_SMOKE).collect()
    ok_levels = [r.level for r in ladder if r.release_ok]
    rows = REGISTRY["dq_release_emit"].fn(spark, SF_SMOKE).collect()
    assert ok_levels == [], ladder
    assert rows == []


def test_dq_release_emit_ships_first_ok_level(spark, tmp_path):
    """dq_release_emit on a constructed corpus where level 0 fails
    k-anonymity (band-grain classes of 3 < 5) but level 1 passes all
    three bars (k = 6, l = 2, EMD = 0 — both nations share the global
    band distribution exactly): the emit must ship level 1 — the FIRST
    release_ok level read from the data — with the band column
    generalized to '*', one row per (nation, segment) class, and the
    deterministic Laplace noisy count recomputable from the public
    md5 plumbing (the dp_laplace_release formula over the released
    class key). Closures vs dq_release_ladder on the same corpus:
    chosen level == first release_ok row, class count == n_classes,
    min k == min_k. Both queries value-compared against their DuckDB
    oracles on the corpus."""
    import duckdb
    import hashlib
    import math

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.oracle_utils import compare

    rows = []
    for nat in (1, 2):
        rows += [(nat, "A", 500.0)] * 3 + [(nat, "A", 1500.0)] * 3
    df = spark.createDataFrame(
        [(i, n, s, b) for i, (n, s, b) in enumerate(rows)],
        "c_custkey long, c_nationkey long, c_mktsegment string,"
        " c_acctbal double",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "customer.parquet"))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{tmp_path}/customer.parquet/*.parquet')"
    )
    ladder = REGISTRY["dq_release_ladder"]
    lrows = {r.level: r for r in ladder.fn(spark, str(tmp_path)).collect()}
    assert not lrows[0].release_ok and lrows[1].release_ok, lrows
    emit = REGISTRY["dq_release_emit"]
    erows = emit.fn(spark, str(tmp_path)).collect()
    assert [
        (r.level, r.nat, r.seg, r.band, r.k) for r in erows
    ] == [(1, 1, "A", "*", 6), (1, 2, "A", "*", 6)]
    assert len(erows) == lrows[1].n_classes
    assert min(r.k for r in erows) == lrows[1].min_k
    # noise replica: md5 inverse-CDF Laplace over the released key
    for r in erows:
        h = int(
            hashlib.md5(
                f"{r.nat}|{r.seg}|{r.band}:release".encode()
            ).hexdigest()[:4],
            16,
        )
        u = (h + 0.5) / 65536.0
        c = u - 0.5
        noise = -1.0 * math.copysign(1.0, c) * math.log(1 - 2 * abs(c))
        assert abs(r.noise - round(noise, 6)) < 1e-9, (tuple(r), noise)
        assert r.k_released == max(0, math.floor(r.k + noise + 0.5))
    assert not compare(emit.fn(spark, str(tmp_path)), con, emit.oracle)
    assert not compare(ladder.fn(spark, str(tmp_path)), con, ladder.oracle)


@pytest.mark.nightly  # heavyweight replay: default tier must fit the driver's verify budget (r15)
def test_chunk_doc_survival_replica_and_closure(spark):
    """dedup_chunk_doc_survival: per-doc union-find replica (group the
    non-label component members by document, price in tokens against
    the doc's full chunk grain), plus the closure the query exists
    for: its rows sum EXACTLY to pipeline_chunk_dedup's corpus-level
    dropped_chunks / dropped_tokens (same relation re-keyed), every
    row has at least one dropped chunk (inner-join contract, output
    bounded by touched docs), and kept_ppm is the exact floor in
    [0, 1e6)."""
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    chunks, _sets, pairs = _chunk_minhash_replica()
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {k: find(k) for k in parent}
    mins = {}
    for k, c in comp.items():
        mins[c] = min(mins.get(c, k), k)
    expect = {}
    for k, c in comp.items():
        if k != mins[c]:
            d = k // 1_000_000
            dc, dt = expect.get(d, (0, 0))
            expect[d] = (dc + 1, dt + len(chunks[k]))
    dtot = {}
    for k, ct in chunks.items():
        d = k // 1_000_000
        nc, tk = dtot.get(d, (0, 0))
        dtot[d] = (nc + 1, tk + len(ct))

    rows = (
        REGISTRY["dedup_chunk_doc_survival"].fn(spark, SF_SMOKE).collect()
    )
    got = {r.doc_id: r for r in rows}
    assert set(got) == set(expect)
    for d, (dc, dt) in expect.items():
        r = got[d]
        nc, tk = dtot[d]
        assert (r.n_chunks, r.doc_tokens) == (nc, tk), (d, tuple(r))
        assert (r.dropped_chunks, r.dropped_tokens) == (dc, dt)
        assert r.kept_tokens == tk - dt
        assert r.kept_ppm == (tk - dt) * 1_000_000 // tk
        assert r.dropped_chunks >= 1
        assert 0 <= r.kept_ppm < 1_000_000
    rep = REGISTRY["pipeline_chunk_dedup"].fn(spark, SF_SMOKE).collect()[0]
    assert sum(r.dropped_chunks for r in rows) == rep.dropped_chunks
    assert sum(r.dropped_tokens for r in rows) == rep.dropped_tokens


def test_chunk_incremental_closure_and_batch_only_orientation(spark):
    """dedup_chunk_incremental: the incremental relation must be
    EXACTLY dedup_chunk_minhash's certified pair set restricted to
    mixed-parity document pairs (batch = doc % 10 >= 8), re-oriented
    new-first — band matching is symmetric, so mining batch x corpus
    only loses nothing against the full relation on that slice
    (closure). Orientation law: every row's new_doc is a batch doc and
    old_doc a corpus doc; non-vacuity: the slice is non-empty at
    SF_SMOKE (20 mixed pairs) so the closure is not trivially
    satisfied."""
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    full = REGISTRY["dedup_chunk_minhash"].fn(spark, SF_SMOKE).collect()
    expect = {}
    for r in full:
        pa, pb = r.doc_a % 10 >= 8, r.doc_b % 10 >= 8
        if pa == pb:
            continue
        if pa:
            expect[(r.doc_a, r.chunk_a, r.doc_b, r.chunk_b)] = r.jaccard
        else:
            expect[(r.doc_b, r.chunk_b, r.doc_a, r.chunk_a)] = r.jaccard
    rows = REGISTRY["dedup_chunk_incremental"].fn(spark, SF_SMOKE).collect()
    got = {
        (r.new_doc, r.new_chunk, r.old_doc, r.old_chunk): r.jaccard
        for r in rows
    }
    assert got == expect
    assert len(got) > 0, "no mixed-parity pairs: closure vacuous"
    for nd, _nc, od, _oc in got:
        assert nd % 10 >= 8 and od % 10 < 8


@pytest.mark.nightly  # heavyweight replay: default tier must fit the driver's verify budget (r15)
def test_pipeline_mmr_serving_replica_and_composition_laws(spark):
    """pipeline_mmr_serving: Python replica of the composed pipeline —
    IVF approximate top-10 candidates (mod-100 centroids,
    rounded-cosine assignment, 2 probes) re-ranked by the greedy MMR
    machine (lambda = 0.5 as the unscaled rel - max_sim difference,
    neighbor_id tie-breaks) — plus the composition laws: pick 1 is
    sim_ann_ivf's rank-1 neighbor (same tier, closure); every pick is
    inside the replica's IVF top-10 (containment); the served set
    diverges from the exact-candidate MMR (sim_mmr_rerank) for at
    least one query (the approximation is visible) AND from the plain
    IVF top-5 for at least one query (the diversity is visible)."""
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    import numpy as np

    rows = _smoke_table("embeddings", ["vec_id", "embedding"])
    ids = [r[0] for r in rows]
    X = np.array([r[1] for r in rows], dtype=np.float64)
    nrm = np.sqrt((X * X).sum(axis=1))
    idx = {v: i for i, v in enumerate(ids)}

    def cos(a, b):
        return round(float(X[idx[a]] @ X[idx[b]] / (nrm[idx[a]] * nrm[idx[b]])), 6)

    cents = sorted(v for v in ids if v % 100 == 0)
    assign = {}
    for v in ids:
        best = max(((cos(v, c), -c) for c in cents))
        assign[v] = -best[1]
    buckets = {}
    for v, c in assign.items():
        buckets.setdefault(c, []).append(v)
    qids = sorted(v for v in ids if v < 10)
    expect = {}
    cand10 = {}
    for q in qids:
        probes = sorted(((cos(q, c), -c) for c in cents), reverse=True)[:2]
        candset = [
            x for _, negc in probes for x in buckets.get(-negc, []) if x != q
        ]
        rel = {x: cos(q, x) for x in candset}
        cand = sorted(rel, key=lambda n: (-rel[n], n))[:10]
        cand10[q] = set(cand)
        sel = [min(cand, key=lambda n: (-rel[n], n))]
        for _step in range(4):
            rem = [n for n in cand if n not in sel]
            score = {n: rel[n] - max(cos(n, s) for s in sel) for n in rem}
            sel.append(min(rem, key=lambda n: (-score[n], n)))
        expect[q] = sel

    got = {}
    for r in REGISTRY["pipeline_mmr_serving"].fn(spark, SF_SMOKE).collect():
        got.setdefault(r.query_id, {})[r.pick] = r.neighbor_id
    assert set(got) == set(expect)
    for q, sel in expect.items():
        assert [got[q][i] for i in range(1, 6)] == sel, (q, sel, got[q])
        assert set(sel) <= cand10[q]
    ivf1 = {
        r.query_id: r.neighbor_id
        for r in REGISTRY["sim_ann_ivf"].fn(spark, SF_SMOKE).collect()
        if r.rank == 1
    }
    for q in expect:
        assert got[q][1] == ivf1[q]
    exact_mmr = {}
    for r in REGISTRY["sim_mmr_rerank"].fn(spark, SF_SMOKE).collect():
        exact_mmr.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert any(
        set(expect[q]) != exact_mmr[q] for q in expect
    ), "IVF candidates never changed the served set: approximation vacuous"
    plain5 = {
        q: set(
            sorted(
                cand10[q],
                key=lambda n: (-cos(q, n), n),
            )[:5]
        )
        for q in expect
    }
    assert any(
        set(expect[q]) != plain5[q] for q in expect
    ), "MMR never diverged from plain IVF top-5: diversity vacuous"


def test_pipeline_chunk_dedup_empty_corpus(spark, tmp_path):
    """pipeline_chunk_dedup on an EMPTY documents table: the report
    must be the all-zero row on BOTH engines (chunk_tokens coalesced,
    dropped_ppm nullif-guarded — the degenerate-corpus discipline
    ADVICE r13 asked for on the EMD normalizers), not a NULL-infested
    row or a division error."""
    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.oracle_utils import compare

    spark.createDataFrame(
        [],
        "doc_id long, text string, lang string, n_chars int, source string",
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    spec = REGISTRY["pipeline_chunk_dedup"]
    rows = spec.fn(spark, str(tmp_path)).collect()
    assert [tuple(r) for r in rows] == [(0, 0, 0, 0, 0, 0, 0, 0)]
    assert not compare(spec.fn(spark, str(tmp_path)), con, spec.oracle)


def test_dp_epsilon_curve_scaling_and_closure(spark):
    """dp_epsilon_curve: the eps_pct = 100 slice must reproduce
    dp_laplace_release's certified rows EXACTLY (same key, salt, and
    b = 1 — cross-query closure); per language the noise must be the
    base draw scaled by exactly 1/eps (b = 10/2/1/0.5 are exact binary
    factors: noise(eps_pct) == round(b * bnoise, 6) with ONE shared
    bnoise recovered from the b = 1 row's pre-rounded replica), and
    abs_err_e6 must be non-increasing in eps_pct row-by-row (monotone
    rounding of a positively-scaled magnitude)."""
    import hashlib
    import math

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = REGISTRY["dp_epsilon_curve"].fn(spark, SF_SMOKE).collect()
    by_eps = {}
    for r in rows:
        by_eps.setdefault(r.eps_pct, {})[r.lang] = r
    assert sorted(by_eps) == [10, 50, 100, 200]
    rel = {
        r.lang: r
        for r in REGISTRY["dp_laplace_release"].fn(spark, SF_SMOKE).collect()
    }
    assert set(by_eps[100]) == set(rel)
    for lang, r in by_eps[100].items():
        assert (r.n_docs, r.noise, r.n_released) == (
            rel[lang].n_docs,
            rel[lang].noise,
            rel[lang].n_released,
        )
    for lang in rel:
        h = int(
            hashlib.md5(f"{lang}:laplace".encode()).hexdigest()[:4], 16
        )
        u = (h + 0.5) / 65536.0
        c = u - 0.5
        bnoise = -1.0 * math.copysign(1.0, c) * math.log(1 - 2 * abs(c))
        prev = None
        for eps_pct in (10, 50, 100, 200):
            r = by_eps[eps_pct][lang]
            assert abs(r.noise - round((100.0 / eps_pct) * bnoise, 6)) < 1e-12
            if prev is not None:
                assert r.abs_err_e6 <= prev, (lang, eps_pct)
            prev = r.abs_err_e6


@pytest.mark.nightly  # heavyweight replay: default tier must fit the driver's verify budget (r15)
def test_dedup_chunk_keep_closures(spark):
    """dedup_chunk_keep: the writer relation must close exactly against
    the pass report — row count == n_chunks - dropped_chunks, token
    sum == kept_tokens, cluster-rep flags == n_clusters — and against
    the replica: the kept key set is the full grain minus the
    union-find drop set, the flagged keys are exactly the component
    labels, and the kept set is disjoint from
    dedup_chunk_doc_survival's per-doc drop accounting (every doc's
    kept chunks here + dropped chunks there == its full grain)."""
    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    chunks, _sets, pairs = _chunk_minhash_replica()
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {k: find(k) for k in parent}
    mins = {}
    for k, c in comp.items():
        mins[c] = min(mins.get(c, k), k)
    dropped = {k for k, c in comp.items() if k != mins[c]}
    labels = set(mins.values())

    rows = REGISTRY["dedup_chunk_keep"].fn(spark, SF_SMOKE).collect()
    got = {r.doc_id * 1_000_000 + r.chunk_idx: r for r in rows}
    assert set(got) == set(chunks) - dropped
    for k, r in got.items():
        assert r.n_toks == len(chunks[k])
        assert r.is_cluster_rep == (k in labels)
    rep = REGISTRY["pipeline_chunk_dedup"].fn(spark, SF_SMOKE).collect()[0]
    assert len(rows) == rep.n_chunks - rep.dropped_chunks
    assert sum(r.n_toks for r in rows) == rep.kept_tokens
    assert sum(1 for r in rows if r.is_cluster_rep) == rep.n_clusters
    surv = {
        r.doc_id: r
        for r in (
            REGISTRY["dedup_chunk_doc_survival"].fn(spark, SF_SMOKE).collect()
        )
    }
    from collections import Counter

    kept_per_doc = Counter(r.doc_id for r in rows)
    for d, s in surv.items():
        assert kept_per_doc[d] + s.dropped_chunks == s.n_chunks
