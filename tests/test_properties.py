"""Property-based tests (hypothesis): Spark expressions vs plain-Python
reference semantics over generated inputs. Each property builds ONE
DataFrame from a generated list, so Spark jobs stay O(examples), not
O(rows)."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigdata_group4_app_spark.functions.expressions import (
    RISK_HIGH_THRESHOLD,
    RISK_LOW_THRESHOLD,
    hard_label,
    pct_format,
    risk_bucket,
)
from bigdata_group4_app_spark.operators.text import ROLL_B, ROLL_M

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

probs = st.lists(
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False).map(
        lambda p: round(p, 4)
    ),
    min_size=1,
    max_size=50,
)


@given(ps=probs)
@settings(**_SETTINGS)
def test_risk_bucket_matches_python_reference(spark, ps):
    df = spark.createDataFrame([(p,) for p in ps], ["p"]).select(
        "p", risk_bucket(F.col("p")).alias("risk")
    )
    for r in df.collect():
        want = (
            "Low Risk"
            if r["p"] < RISK_LOW_THRESHOLD
            else "Medium Risk"
            if r["p"] < RISK_HIGH_THRESHOLD
            else "High Risk"
        )
        assert r["risk"] == want


@given(ps=probs)
@settings(**_SETTINGS)
def test_pct_format_and_hard_label_match_python(spark, ps):
    df = spark.createDataFrame([(p,) for p in ps], ["p"]).select(
        "p",
        pct_format(F.col("p")).alias("pct"),
        hard_label(F.col("p")).alias("label"),
    )
    for r in df.collect():
        assert r["pct"] == f"{r['p'] * 100:.2f}%"
        assert r["label"] == (1 if r["p"] >= 0.5 else 0)


tokens = st.lists(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=127
        ),
        min_size=1,
        max_size=12,
    ),
    min_size=1,
    max_size=30,
)


@given(toks=tokens)
@settings(**_SETTINGS)
def test_rolling_hash_fold_matches_python(spark, toks):
    """The aggregate() fold over md5-derived token ints must equal the
    straightforward sequential Python computation."""
    text = " ".join(toks)
    df = spark.createDataFrame([(text,)], ["text"]).select(
        F.expr(
            "aggregate("
            "  transform(split(trim(text), '\\\\s+'),"
            "            x -> CAST(conv(substr(md5(x), 1, 8), 16, 10) AS BIGINT)),"
            f"  CAST(0 AS BIGINT), (acc, h) -> (acc * {ROLL_B} + h) % {ROLL_M})"
        ).alias("h")
    )
    acc = 0
    for t in text.strip().split():
        h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
        acc = (acc * ROLL_B + h) % ROLL_M
    assert df.first()["h"] == acc


kv_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=-100, max_value=100),
    ),
    min_size=1,
    max_size=40,
)


@given(left=kv_rows, right=st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=6, unique=True))
@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_salted_join_equals_plain_join(spark, left, right):
    from bigdata_group4_app_spark.functions.skew import salted_join

    ldf = spark.createDataFrame(left, ["k", "v"])
    rdf = spark.createDataFrame([(k, f"d{k}") for k in right], ["k", "d"])
    plain = sorted(map(tuple, ldf.join(rdf, "k").collect()))
    salted = sorted(map(tuple, salted_join(ldf, rdf, on="k").collect()))
    assert plain == salted


def test_funnel_counts_are_monotone(spark):
    """Each funnel stage can only lose users: n_users >= n_signup >=
    n_signup_click >= n_full_funnel, and none negative."""
    from bigdata_group4_app_spark.operators.advanced import event_funnel

    from .conftest import SF_CORRECT

    r = event_funnel(spark, SF_CORRECT).first()
    assert (
        r["n_users"]
        >= r["n_signup"]
        >= r["n_signup_click"]
        >= r["n_full_funnel"]
        >= 0
    )


def test_chunks_cover_every_token(spark):
    """Chunking invariant: per doc, total chunk tokens >= doc tokens (the
    stride overlap double-counts, never drops), and chunk_idx is dense
    from 0."""
    from bigdata_group4_app_spark.operators.text import doc_chunks, text_stats

    from .conftest import SF_CORRECT

    chunks = (
        doc_chunks(spark, SF_CORRECT)
        .groupBy("doc_id")
        .agg(
            F.sum("n_tokens").alias("chunk_toks"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.max("chunk_idx").alias("max_idx"),
        )
    )
    stats = text_stats(spark, SF_CORRECT).select("doc_id", "n_tokens")
    joined = chunks.join(stats, "doc_id").collect()
    assert joined
    for r in joined:
        assert r["chunk_toks"] >= r["n_tokens"]
        assert r["max_idx"] == r["n_chunks"] - 1


def test_checksum_detects_row_loss(spark):
    """Dropping any row must change the table checksum (the integrity
    property the operator exists for)."""
    from bigdata_group4_app_spark.operators.advanced import table_checksums

    from .conftest import SF_CORRECT

    full = {
        r["table_name"]: r["checksum"]
        for r in table_checksums(spark, SF_CORRECT).collect()
    }
    # recompute the documents checksum with one doc removed, via the same
    # md5-int sum the operator uses
    from bigdata_group4_app_spark.functions.hashing import md5_int_sql
    from bigdata_group4_app_spark.sources.registry import load_table

    docs = load_table(spark, SF_CORRECT, "documents").filter(
        F.col("doc_id") != 0
    )
    h = F.expr(
        md5_int_sql(
            "concat_ws('|', CAST(doc_id AS STRING), lang, source)"
        )
    )
    partial = docs.agg(F.sum(h)).first()[0]
    assert partial != full["documents"]


@given(
    toks=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0,
            max_size=24,
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_md5_int_helpers_agree_across_engines(spark, toks):
    """The md5-derived 32-bit and 60-bit int helpers are the repo's one
    hashing convention — Spark and DuckDB must produce identical values
    for arbitrary printable strings (join keys / signatures depend on
    it)."""
    import duckdb

    from bigdata_group4_app_spark.functions.hashing import (
        duck_md5_int,
        duck_md5_int60,
        md5_int60_sql,
        md5_int_sql,
    )

    df = spark.createDataFrame([(t,) for t in toks], ["s"]).select(
        "s",
        F.expr(md5_int_sql("s")).alias("h32"),
        F.expr(md5_int60_sql("s")).alias("h60"),
    )
    got = {(r["s"]): (r["h32"], r["h60"]) for r in df.collect()}
    con = duckdb.connect()
    for s in set(toks):
        h32, h60 = con.execute(
            f"SELECT {duck_md5_int('?')}, {duck_md5_int60('?')}".replace(
                "md5(?)", "md5($tok)"
            ),
            {"tok": s},
        ).fetchone()
        assert got[s] == (h32, h60), s
    con.close()


event_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=6),  # user_id (few users → collisions)
        st.integers(min_value=0, max_value=99),  # ts offset (seconds)
        st.sampled_from(["click", "view", "purchase", "signup", "error"]),
        st.floats(min_value=-100, max_value=100, allow_nan=False).map(
            lambda v: round(v, 4)
        ),
    ),
    min_size=0,
    max_size=40,
)


@given(rows=event_rows)
@settings(**_SETTINGS)
def test_cdc_merge_matches_python_replay(spark, rows):
    """cdc_merge_events vs an independent dict-based replay of the same
    latest-wins + tombstone semantics: identical actions and states on
    arbitrary event streams (including empty sides, all-error users,
    ts ties broken by event_id)."""
    import datetime as dt

    from bigdata_group4_app_spark.operators.advanced import cdc_merge_events

    epoch = dt.datetime(2024, 1, 1)
    data = [
        (i, epoch + dt.timedelta(seconds=ts), u, ty, v)
        for i, (u, ts, ty, v) in enumerate(rows)
    ]
    cutoff = epoch + dt.timedelta(seconds=50)
    ev = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )
    got = {
        r["user_id"]: (
            r["cdc_action"],
            r["last_type"],
            r["last_value"],
            r["last_ts"],
        )
        for r in cdc_merge_events(ev, cutoff).collect()
    }

    # replay: last (ts, event_id) per user per side, then classify
    def last_per_user(side):
        out = {}
        for eid, ts, u, ty, v in side:
            key = (ts, eid)
            if u not in out or key > out[u][0]:
                out[u] = (key, ty, v, ts)
        return out

    snap = {
        u: t
        for u, t in last_per_user(
            [r for r in data if r[1] < cutoff]
        ).items()
        if t[1] != "error"
    }
    batch = last_per_user([r for r in data if r[1] >= cutoff])
    want = {}
    for u in set(snap) | set(batch):
        b = batch.get(u)
        if b is None:
            _, ty, v, ts = snap[u]
            want[u] = ("unchanged", ty, round(v, 4), ts)
        elif b[1] == "error":
            if u in snap:
                want[u] = ("deleted", None, None, None)
        else:
            action = "updated" if u in snap else "inserted"
            want[u] = (action, b[1], round(b[2], 4), b[3])
    assert got == want


order_batches = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=8),  # custkey
        st.integers(min_value=0, max_value=20),  # day offset
        st.sampled_from(["1-URGENT", "2-HIGH", "3-MEDIUM"]),
    ),
    min_size=1,
    max_size=40,
)


@given(rows=order_batches)
@settings(**_SETTINGS)
def test_scd2_versions_match_python_replay(spark, rows):
    """priority_versions_from vs a dict replay of daily-max collapse +
    consecutive-change detection + version numbering."""
    import datetime as dt

    from bigdata_group4_app_spark.operators.advanced import (
        priority_versions_from,
    )

    epoch = dt.datetime(2000, 1, 1)
    data = [
        (i, u, "O", 1.0, epoch + dt.timedelta(days=d), p)
        for i, (u, d, p) in enumerate(rows)
    ]
    orders = spark.createDataFrame(
        data,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    got = {
        (r["o_custkey"], r["version"]): (r["effective_from"], r["priority"])
        for r in priority_versions_from(orders).collect()
    }

    daily: dict[tuple, str] = {}
    for _, u, _, _, ts, p in data:
        k = (u, ts.date())
        daily[k] = max(daily.get(k, p), p)
    want = {}
    for u in {k[0] for k in daily}:
        days = sorted(d for (uu, d) in daily if uu == u)
        prev, version = None, 0
        for d in days:
            if daily[(u, d)] != prev:
                version += 1
                prev = daily[(u, d)]
                want[(u, version)] = (d, prev)
    assert got == want


baskets_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=6),  # okey
        st.integers(min_value=1, max_value=10),  # pkey
    ),
    min_size=0,
    max_size=60,
)


@given(rows=baskets_strategy)
@settings(**_SETTINGS)
def test_basket_pairs_match_itertools_reference(spark, rows):
    """basket_pairs_from (map-side pair explosion) vs
    itertools.combinations over per-order distinct part sets."""
    from collections import Counter
    from itertools import combinations

    from bigdata_group4_app_spark.operators.relational import (
        BASKET_MAX_PARTS,
        basket_pairs_from,
    )

    op = spark.createDataFrame(
        rows or [(None, None)], "okey long, pkey long"
    ).filter(F.col("okey").isNotNull())
    got = {
        (r["part1"], r["part2"]): r["n_orders"]
        for r in basket_pairs_from(op).collect()
    }
    per_order: dict[int, set] = {}
    for o, p in rows:
        per_order.setdefault(o, set()).add(p)
    want = Counter()
    for parts in per_order.values():
        if len(parts) <= BASKET_MAX_PARTS:
            for a, b in combinations(sorted(parts), 2):
                want[(a, b)] += 1
    assert got == dict(want)
