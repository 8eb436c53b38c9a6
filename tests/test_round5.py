"""Round-5 regression tests: the three round-4 ADVICE fixes.

1. ordered-fold oracle cosines (mmr/contrastive/knn templates) — covered
   by the oracle-parity tests in test_llm_pipeline; here we pin the
   helper renders the exact Spark fold shape.
2. absolute-date train/eval splits (ips_policy_value, cuped_adjusted_ab)
   — a cross-month dataset must NOT interleave the periods.
3. degree_distribution_stats degenerate-OLS guard — a single-row
   histogram yields NULL slope on both engines, not NaN-vs-NULL.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from bigdata_group4_app_spark.operators.advanced import (
    OPE_SPLIT_TS,
    ips_policy_value,
)
from bigdata_group4_app_spark.operators.graph import (
    degree_distribution_stats,
)


def test_duck_dot_matches_spark_fold_literally():
    from bigdata_group4_app_spark.functions.vector_sql import (
        duck_dot_sql,
        duck_l2_sql,
    )

    # the fold must seed 0.0 and accumulate left-to-right — the shape that
    # makes it bit-identical to Spark's aggregate(zip_with(...), 0.0, +)
    s = duck_dot_sql("a", "b")
    assert "list_prepend(CAST(0.0 AS DOUBLE)" in s
    assert "(acc, v) -> acc + v" in s
    assert "list_transform(a, (x, i)" in s  # left operand drives order
    assert "sum(" not in s  # never an unordered aggregate
    assert "sum(" not in duck_l2_sql("a")


def test_duck_dot_numeric_parity(spark):
    """The rendered DuckDB fold equals Spark's _cosine_expr on an
    adversarial vector (magnitudes spanning 12 orders, where summation
    order changes the last bits)."""
    import duckdb
    from pyspark.sql import functions as F

    from bigdata_group4_app_spark.functions.vector_sql import duck_dot_sql
    from bigdata_group4_app_spark.operators.dedup import _cosine_expr

    a = [1e9, 1.0, -1e9, 1e-3, 7.5, -2.25, 1e6, -1e-3]
    b = [1e-3, 1e9, 1.0, -1e9, -2.25, 7.5, 1e-3, 1e6]
    sdf = spark.createDataFrame(
        [(a, b)], schema="a array<double>, b array<double>"
    ).select(_cosine_expr("a", "b").alias("c"))
    s_val = sdf.collect()[0]["c"]
    con = duckdb.connect()
    nrm_a = duck_dot_sql("a", "a")
    nrm_b = duck_dot_sql("b", "b")
    d_val = con.execute(
        f"SELECT {duck_dot_sql('a', 'b')} / (sqrt({nrm_a}) * sqrt({nrm_b}))"
        f" FROM (SELECT {a!r}::DOUBLE[] AS a, {b!r}::DOUBLE[] AS b)"
    ).fetchone()[0]
    # bit-identical, not approx: that is the whole point of the fold
    assert s_val == d_val


def _write_events(tmp_path, rows):
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["ts"] = pd.to_datetime(df["ts"])
    df["props"] = "{}"
    df.to_parquet(tmp_path / "events.parquet", index=False)
    return str(tmp_path)


def test_ips_split_is_absolute_not_day_of_month(spark, tmp_path):
    """An event on 2024-02-05 (day-of-month 5 < 16) is AFTER the split
    timestamp: it must land in the eval window, not retrain the policy.
    Under the old dayofmonth() split the two February 'view' events would
    flip the trained policy from 'click' to 'view'."""
    assert OPE_SPLIT_TS == "2024-01-16 00:00:00"
    sf = _write_events(
        tmp_path,
        [
            (1, "2024-01-05 10:00:00", 1, "click", 1.0),
            (2, "2024-01-20 10:00:00", 1, "view", 2.0),
            (3, "2024-01-21 10:00:00", 1, "view", 2.0),
            (4, "2024-02-05 10:00:00", 1, "view", 2.0),
            (5, "2024-02-05 11:00:00", 1, "view", 2.0),
        ],
    )
    rows = ips_policy_value(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["rec_action"] == "click"  # trained ONLY on the pre-split event
    assert r["n_logged"] == 4  # all four post-split events evaluate it
    assert r["n_matched"] == 0


def test_semantic_dedup_recall_vs_exact_pairs(spark):
    """SemDeDup's bucketed pairs must be a strict SUBSET of the exact
    all-pairs audit (identical 4dp threshold rule → precision 1.0), and
    the 2-probe cell expansion must hold recall high: measured 0.92 at
    sf0.001 / 0.97 at sf0.01 vs the ~0.5 a single-cell assignment gives."""
    from bigdata_group4_app_spark.operators.dedup import embedding_dup_pairs
    from bigdata_group4_app_spark.operators.similarity import (
        semantic_dedup_pairs,
    )

    sf = "/root/testdata/sf0.001"
    exact = {
        (r["vec_id_1"], r["vec_id_2"])
        for r in embedding_dup_pairs(spark, sf).collect()
    }
    sem = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in semantic_dedup_pairs(spark, sf).collect()
    }
    # Subset holds because both operators apply the same 4dp-round +
    # threshold rule; their RAW cosines come from different float
    # formulations (normalized-matmul vs dot/outer-norms), so this could
    # in principle diverge on a pair sitting exactly at a .00005 raw
    # boundary — testdata is fixed and deterministic, so the assertion
    # cannot flake, but if the generator ever changes and this line
    # alone fails, check for a boundary pair before suspecting a bug.
    assert sem <= exact
    assert len(exact) > 0
    assert len(sem & exact) / len(exact) >= 0.85


def test_bpe_encode_matches_python_replay(spark):
    """Replay the sequential BPE training loop in plain Python from the
    raw documents and demand EXACT agreement with the engine — learned
    rules, counts, token totals, and the half-up-rounded tokens/doc
    (the kmeans-replay recipe: same arithmetic, Decimal half-up
    rounding)."""
    import re
    from collections import Counter

    import pandas as pd

    from bigdata_group4_app_spark.functions.rounding import round_half_up
    from bigdata_group4_app_spark.operators.text import (
        BPE_ENC_MERGES,
        bpe_encode_stats,
    )

    sf = "/root/testdata/sf0.001"
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    n_docs = len(docs)
    counts = Counter()
    for text in docs["text"]:
        for tok in re.split(r"[ \t\n\x0b\f\r]+", text.strip()):
            w = tok.lower()
            if re.fullmatch(r"[a-z]+", w) and len(w) >= 2:
                counts[w] += 1
    vocab = {tuple(w): c for w, c in counts.items()}
    expected = []
    for r in range(1, BPE_ENC_MERGES + 1):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[f"{syms[i]} {syms[i + 1]}"] += c
        if not pairs:
            break
        pair, cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        a, b = pair.split(" ")
        new_vocab = Counter()
        for syms, c in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            new_vocab[tuple(out)] += c
        vocab = dict(new_vocab)
        tok_total = sum(c * len(syms) for syms, c in vocab.items())
        expected.append(
            (r, pair, cnt, tok_total, round_half_up(tok_total / n_docs, 4))
        )
    got = [tuple(row) for row in bpe_encode_stats(spark, sf).collect()]
    assert got == expected


def test_rrf_fusion_beats_single_rankings_on_planted_query(spark, tmp_path):
    """Plant a corpus where doc 1 tops the sparse list only, doc 3 tops
    the dense list only, and doc 2 is runner-up on BOTH — RRF must fuse
    doc 2 to the top (2/(k+2) > 1/(k+1)), which neither single ranking
    does. That superiority-on-agreement is the whole point of RRF."""
    import numpy as np

    from bigdata_group4_app_spark.operators.corpus import rrf_hybrid_search

    # 12 lexically-irrelevant fillers occupy dense ranks 3..14, pushing
    # the sparse winner (doc 1, orthogonal embedding) out of the dense
    # top-10 so its fusion score is sparse-only
    n_fill = 12
    texts = [
        "query placeholder",
        "spark spark spark table table scan merge",
        "spark table filler words here",
        "nothing relevant lexically at all",
    ] + ["irrelevant padding document number %d" % i for i in range(n_fill)]
    docs = pd.DataFrame(
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["t"] * len(texts),
        }
    )
    docs["n_chars"] = docs["text"].str.len()
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    dim = 8

    def vec(t0, t1):
        v = np.zeros(dim, dtype=np.float32)
        v[0], v[1] = t0, t1
        return list(v)

    vecs = [
        vec(1.0, 0.0),  # 0: the query
        vec(0.0, 1.0),  # 1: orthogonal — dense rank LAST
        vec(1.0, 0.4),  # 2: dense rank 2
        vec(1.0, 0.05),  # 3: dense rank 1
    ] + [vec(1.0, 0.5 + 0.05 * i) for i in range(n_fill)]  # ranks 3..14
    emb = pd.DataFrame(
        {
            "vec_id": list(range(len(vecs))),
            "embedding": vecs,
            "label": [0] * len(vecs),
        }
    )
    emb.to_parquet(tmp_path / "embeddings.parquet", index=False)
    rows = rrf_hybrid_search(spark, str(tmp_path)).collect()
    by_rank = {r["fused_rank"]: r for r in rows}
    assert by_rank[1]["doc_id"] == 2
    assert by_rank[1]["sparse_rank"] == 2 and by_rank[1]["dense_rank"] == 2
    # the single-list winners fuse strictly below the double runner-up
    assert {by_rank[2]["doc_id"], by_rank[3]["doc_id"]} == {1, 3}
    # doc 1 must have been pushed out of the dense top-10 entirely
    assert by_rank[2]["dense_rank"] is None or by_rank[3]["dense_rank"] is None


def test_image_phash_band_join_is_exact_at_pigeonhole_radius(spark):
    """Brute-force every image pair in Python and demand the banded
    operator returns EXACTLY the pairs within IMG_HAM_THRESH — the
    bands-1 pigeonhole radius where Hamming-LSH has provable recall 1."""
    import itertools

    from bigdata_group4_app_spark.operators.multimodal import (
        IMG_HAM_THRESH,
        IMG_HASH_BITS,
        image_phash_pairs,
    )

    sf = "/root/testdata/sf0.001"
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    docs = docs[(docs.doc_id % 3 == 0) & (docs.text.str.len() >= 64)]

    def ahash(text):
        n = len(text)
        pix = [
            sum(ord(c) for c in text[(j * n) // 64 : ((j + 1) * n) // 64])
            for j in range(IMG_HASH_BITS)
        ]
        sp = sum(pix)
        return [1 if x * IMG_HASH_BITS >= sp else 0 for x in pix]

    hashes = {r.doc_id: ahash(r.text) for r in docs.itertuples()}
    expected = sorted(
        (a, b, d)
        for a, b in itertools.combinations(sorted(hashes), 2)
        if (d := sum(x != y for x, y in zip(hashes[a], hashes[b])))
        <= IMG_HAM_THRESH
    )
    got = [tuple(r) for r in image_phash_pairs(spark, sf).collect()]
    assert got == expected
    assert len(expected) > 0  # the radius is non-trivially populated


def test_write_packed_shards_roundtrip_matches_manifest(spark, tmp_path):
    """The shard sink must write exactly the layout the pack_shards
    manifest promises: same shards, same per-shard doc/token counts and
    doc_id spans — asserted by reading the partitioned output back.
    The observe() write audit must agree without extra jobs."""
    from bigdata_group4_app_spark.operators.corpus import (
        pack_shards,
        write_packed_shards,
    )

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "shards")
    audit = write_packed_shards(spark, sf, out, fmt="parquet")
    manifest = {r["shard_id"]: r for r in pack_shards(spark, sf).collect()}
    assert audit["n_docs"] == sum(r["n_docs"] for r in manifest.values())
    assert audit["n_tokens"] == sum(r["n_tokens"] for r in manifest.values())
    assert audit["n_shards"] == len(manifest)
    back = (
        spark.read.parquet(out)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
        .collect()
    )
    assert len(back) == len(manifest)
    for r in back:
        m = manifest[r["shard_id"]]
        assert (r["n_docs"], r["n_tokens"]) == (m["n_docs"], m["n_tokens"])
        assert (r["first_doc_id"], r["last_doc_id"]) == (
            m["first_doc_id"],
            m["last_doc_id"],
        )
    # partitioned layout: one directory per shard
    shard_dirs = {
        p.name for p in (tmp_path / "shards").iterdir()
        if p.name.startswith("shard_id=")
    }
    assert len(shard_dirs) == len(manifest)


def test_write_packed_shards_orc_roundtrip(spark, tmp_path):
    from bigdata_group4_app_spark.operators.corpus import (
        write_packed_shards,
    )

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "shards_orc")
    audit = write_packed_shards(spark, sf, out, fmt="orc")
    back = spark.read.orc(out)
    assert back.count() == audit["n_docs"]
    assert set(back.columns) == {
        "doc_id", "text", "lang", "source", "n_toks", "shard_id",
    }


def _write_lineitem(tmp_path, rows):
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    # pad the columns other consumers of the table expect at read time
    df["l_quantity"] = 1.0
    df["l_extendedprice"] = 1.0
    df.to_parquet(tmp_path / "lineitem.parquet", index=False)
    return str(tmp_path)


def test_degree_distribution_degenerate_slope_is_null(spark, tmp_path):
    """Three orders over the same 2-part basket: one edge, both nodes
    degree 1, a single histogram row — the OLS denominator is 0 and the
    slope must be NULL (matching DuckDB's NULL division), never NaN."""
    sf = _write_lineitem(
        tmp_path,
        [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 20)],
    )
    rows = degree_distribution_stats(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["degree"] == 1 and r["n_nodes"] == 2
    assert r["node_share"] == 1.0
    assert r["loglog_slope"] is None


def test_textrank_matches_python_integer_replay(spark):
    """Replay the integer fixed-point TextRank in plain Python and
    demand EXACT score equality — the integer arithmetic claim means
    there is no tolerance to hide behind."""
    import re
    from collections import Counter, defaultdict

    from bigdata_group4_app_spark.operators.text import (
        TR_BASE,
        TR_DAMPING_PCT,
        TR_ROUNDS,
        TR_SCALE,
        TR_TOP,
        textrank_keywords,
    )

    sf = "/root/testdata/sf0.001"
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    edge_w = Counter()
    for text in docs["text"]:
        toks = re.split(r"[ \t\n\x0b\f\r]+", text.strip())
        for a, b in zip(toks, toks[1:]):
            a, b = a.lower(), b.lower()
            if (
                re.fullmatch(r"[a-z]+", a)
                and re.fullmatch(r"[a-z]+", b)
                and len(a) >= 2
                and len(b) >= 2
                and a != b
            ):
                edge_w[(min(a, b), max(a, b))] += 1
    adj = defaultdict(dict)
    for (u, v), w in edge_w.items():
        adj[u][v] = w
        adj[v][u] = w
    wdeg = {n: sum(nb.values()) for n, nb in adj.items()}
    score = {n: TR_SCALE for n in adj}
    for _ in range(TR_ROUNDS):
        mass = defaultdict(int)
        for j, nb in adj.items():
            for i, w in nb.items():
                mass[i] += (score[j] * w) // wdeg[j]
        score = {
            n: TR_BASE + (TR_DAMPING_PCT * mass[n]) // 100 for n in adj
        }
    expected = sorted(
        ((s, w) for w, s in score.items()), key=lambda t: (-t[0], t[1])
    )[:TR_TOP]
    got = [tuple(r) for r in textrank_keywords(spark, sf).collect()]
    assert got == [
        (i + 1, w, s) for i, (s, w) in enumerate(expected)
    ]


def test_cluster_balanced_sample_invariants(spark):
    from bigdata_group4_app_spark.operators.similarity import (
        CBS_K,
        cluster_balanced_sample,
    )

    rows = cluster_balanced_sample(spark, "/root/testdata/sf0.001").collect()
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell, rs in by_cell.items():
        assert len(rs) <= CBS_K
        assert [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])] == (
            list(range(1, len(rs) + 1))
        )
        pris = [r["priority"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert pris == sorted(pris)  # bottom-k by priority, in order


def test_bpe_fertility_consistent_with_encode_totals(spark):
    """When no word folds into the >=16 cap bucket, the fertility
    histogram must reproduce the final corpus token total of the encode
    curve: Σ occurrences · toks_per_word == corpus_tokens at round k."""
    from bigdata_group4_app_spark.operators.text import (
        BPE_FERT_MAX,
        bpe_encode_stats,
        bpe_fertility_hist,
    )

    sf = "/root/testdata/sf0.001"
    hist = bpe_fertility_hist(spark, sf).collect()
    enc = bpe_encode_stats(spark, sf).collect()
    assert max(r["toks_per_word"] for r in hist) < BPE_FERT_MAX
    total = sum(r["occurrences"] * r["toks_per_word"] for r in hist)
    assert total == enc[-1]["corpus_tokens"]


def test_pq_codebook_audit_invariants(spark):
    from bigdata_group4_app_spark.operators.similarity import (
        PQ_M,
        pq_codebook_audit,
    )

    rows = pq_codebook_audit(spark, "/root/testdata/sf0.001").collect()
    n_total = pd.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).shape[0]
    per_sub = {}
    for r in rows:
        assert r["avg_mse"] >= 0.0
        per_sub[r["subspace"]] = per_sub.get(r["subspace"], 0) + r["n_vecs"]
    # every vector gets exactly one code in every subspace
    assert per_sub == {m: n_total for m in range(PQ_M)}


def test_isotonic_calibration_matches_sequential_pav(spark):
    """The minimax identity must equal classic sequential
    pool-adjacent-violators run in Python on the same integer bin sums,
    and the fitted curve must be monotone non-decreasing."""
    from bigdata_group4_app_spark.functions.rounding import round_half_up
    from bigdata_group4_app_spark.ml.scoring import (
        churn_customers,
        churn_probability,
        isotonic_calibration,
    )

    sf = "/root/testdata/sf0.001"
    got = isotonic_calibration(spark, sf).collect()
    cal = [r["calibrated_rate"] for r in sorted(got, key=lambda r: r["decile"])]
    assert cal == sorted(cal)  # monotone
    # rebuild the exact (pos, n) bins the operator used
    scored = (
        churn_customers(spark, sf)
        .select("CustomerID", "Churn", churn_probability().alias("p"))
        .toPandas()
        .sort_values(["p", "CustomerID"])
        .reset_index(drop=True)
    )
    n_rows = len(scored)
    # ntile semantics: first (n_rows % 10) tiles get the extra row
    base, extra = divmod(n_rows, 10)
    pools = []
    idx = 0
    for d in range(10):
        size = base + (1 if d < extra else 0)
        chunk = scored.iloc[idx : idx + size]
        pools.append([int(chunk["Churn"].sum()), size])
        idx += size
    # sequential PAV on (pos, n) fractions
    stack = []
    for pos, n in pools:
        stack.append([pos, n, 1])  # pos, n, n_bins merged
        while (
            len(stack) > 1
            and stack[-2][0] * stack[-1][1] >= stack[-1][0] * stack[-2][1]
        ):
            p2, n2, c2 = stack.pop()
            stack[-1][0] += p2
            stack[-1][1] += n2
            stack[-1][2] += c2
    expected = []
    for pos, n, c in stack:
        expected.extend([round_half_up(pos / n, 4)] * c)
    assert cal == expected


def test_sprt_matches_python_integer_replay(spark):
    """Replay the integer LLR walk in Python from the raw events and
    demand exact equality — and sanity-pin the Wald decision rule."""
    from bigdata_group4_app_spark.operators.stats import (
        _SPRT_INC0,
        _SPRT_INC1,
        _SPRT_LO,
        _SPRT_UP,
        sprt_ab_monitor,
    )

    sf = "/root/testdata/sf0.001"
    ev = pd.read_parquet(f"{sf}/events.parquet")
    ev = ev[ev.user_id % 2 == 1].copy()
    ev["day"] = ev["ts"].dt.date
    daily = (
        ev.groupby("day")
        .agg(
            n_obs=("event_id", "size"),
            n_conv=("event_type", lambda s: int((s == "purchase").sum())),
        )
        .sort_index()
    )
    llr, expected = 0, []
    for day, r in daily.iterrows():
        llr += int(r.n_obs - r.n_conv) * _SPRT_INC0 + int(r.n_conv) * _SPRT_INC1
        dec = (
            "accept_h1"
            if llr >= _SPRT_UP
            else "accept_h0" if llr <= _SPRT_LO else "continue"
        )
        expected.append((day, int(r.n_obs), int(r.n_conv), llr, dec))
    got = [tuple(r) for r in sprt_ab_monitor(spark, sf).collect()]
    assert got == expected


def test_conformal_sets_cover_at_target_rate(spark):
    """Split-conformal's whole point: empirical coverage on the eval
    split lands at or above ~1-α (small finite-sample slack), and the
    threshold is a real calibration score (0 < qhat < 1)."""
    from bigdata_group4_app_spark.ml.scoring import (
        conformal_churn_sets,
    )

    rows = conformal_churn_sets(spark, "/root/testdata/sf0.01").collect()
    n_eval = sum(r["n_eval"] for r in rows)
    n_cov = sum(r["n_covered"] for r in rows)
    assert n_eval > 0
    assert n_cov / n_eval >= 0.85  # target 0.9, finite-sample slack
    q = rows[0]["qhat"]
    assert 0.0 < q < 1.0
    # an 'empty' set can only exist when qhat < min class score — and
    # empty sets must never count as covered
    for r in rows:
        if r["set_type"] == "empty":
            assert r["n_covered"] == 0
        if r["set_type"] == "both":
            assert r["n_covered"] == r["n_eval"]


def test_negative_sampling_table_invariants(spark):
    """weight = round((c^3)^(1/4) * 1e6) exactly (the sqrt∘sqrt identity
    that avoids libm pow), cum_weight is the running sum in rank order,
    and every dart lands in exactly one bucket."""
    import math

    from bigdata_group4_app_spark.functions.rounding import round_half_up
    from bigdata_group4_app_spark.operators.text import (
        NEG_DARTS,
        negative_sampling_table,
    )

    rows = sorted(
        negative_sampling_table(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["rank"],
    )
    cum = 0
    for r in rows:
        expect_w = int(
            round_half_up(math.sqrt(math.sqrt(float(r["c"]) ** 3)) * 1e6, 0)
        )
        assert r["weight"] == expect_w
        cum += r["weight"]
        assert r["cum_weight"] == cum
    assert sum(r["n_darts"] for r in rows) <= NEG_DARTS
    assert sum(r["n_darts"] for r in rows) > 0
