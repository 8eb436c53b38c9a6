"""Corpus-preparation operators over ``documents`` — the second tier of the
LLM-data-pipeline surface (BASELINE.json north_star; the reference app has no
text processing at all, SURVEY.md §2.8): redaction/scrubbing, TF-IDF term
weighting, deterministic stratified sampling, inverted-index construction.

All pure Spark SQL expressions (regexp / higher-order functions / window
aggregates) — whole-stage-codegen end to end, no Python workers. Shuffle
profile at 100 TB:

- ``pii_redact``      map-only (regex per row), zero shuffle;
- ``tfidf_top_terms`` one explode + two hash aggs keyed by (doc_id, term) /
                      term — the term-keyed agg is tiny (vocabulary-sized);
- ``stratified_sample_counts`` map-side filter + lang-keyed agg (5 groups);
- ``inverted_index_stats``    explode + (term, doc) agg + term agg; posting
                      lists are per-term, so skewed stop-words are the one
                      hot spot — cap or drop ultra-high-df terms at scale.

Tokenization contract matches ``operators/text.py``: trim, split on
whitespace runs. Hashing follows the repo convention (md5-derived ints only,
reproducible in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import duck_md5_int, md5_int_sql
from ..sources.registry import load_table
from .text import duck_quality_ctes

# lexicon-based scrubbing (the real-data version plugs a PII/toxicity
# blocklist into the same shape); regexes cover the structured-PII channel
BLOCKLIST = ("customer", "key")
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_BLOCK_RE = r"\b(" + "|".join(BLOCKLIST) + r")\b"

# per-language sampling thresholds in basis points of the 10000-bucket hash
# space (integer, so both engines compare exactly — double rates × 10000
# truncate vs round differently across engines): the mixture-rebalancing
# step of corpus assembly
SAMPLE_BP = {"en": 5000, "de": 3000, "fr": 3000, "es": 3000, "zh": 2000}
TFIDF_TOP_N = 3


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub documents: blocklist terms and structured PII (emails, IPv4)
    → ``[REDACTED]``; emit per-doc hit counts and the scrubbed-text
    fingerprint. Map-only regex pass — at 100 TB this pipelines with the
    parquet scan and never shuffles. Redaction happens blocklist-first so
    the counts reflect the original text."""
    docs = load_table(spark, sf_dir, "documents")
    # patterns go in as literal Columns, not through expr() — Spark SQL
    # string literals would swallow the \b escapes
    return docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(_BLOCK_RE), 0)
        ).alias("n_blocked"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(EMAIL_RE), 0)
        ).alias("n_emails"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(IPV4_RE), 0)
        ).alias("n_ipv4"),
        F.md5(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(F.col("text"), _BLOCK_RE, "[REDACTED]"),
                    EMAIL_RE,
                    "[REDACTED]",
                ),
                IPV4_RE,
                "[REDACTED]",
            )
        ).alias("clean_md5"),
    ).orderBy("doc_id")


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``TFIDF_TOP_N`` terms per document by tf·idf, idf = ln(N/df).

    Plan shape: explode → (doc, term) hash agg for tf → term-keyed agg for
    df (vocabulary-sized, broadcast back) → per-doc top-k window. The df
    relation is tiny at any corpus size, so the join is a broadcast; the
    only big shuffle is the (doc_id, term) agg, which partial-aggregates
    map-side."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    df_rel = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(F.broadcast(n_docs))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.col("term"))
    return (
        tf.join(F.broadcast(df_rel), "term")
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4
            ).alias("tfidf"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_N)
        .orderBy("doc_id", "rank")
    )


def stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language stratified sampling: a doc is kept when
    its md5-derived hash lands under the language's rate threshold —
    ``sampleBy`` semantics, but stable under growth, repartitioning, and
    engine (the same rows sample on any cluster, and in DuckDB). Emits the
    per-stratum audit relation (totals, sampled, observed rate)."""
    docs = load_table(spark, sf_dir, "documents")
    thresh = F.lit(None).cast("long")
    for lang, bp in SAMPLE_BP.items():
        thresh = F.when(F.col("lang") == lang, F.lit(bp)).otherwise(thresh)
    bucket = F.expr(md5_int_sql("CAST(doc_id AS STRING)") + " % 10000")
    return (
        docs.select(
            "lang",
            (bucket < thresh).cast("int").alias("sampled"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("sampled").alias("n_sampled"),
            F.round(F.avg("sampled"), 4).alias("observed_rate"),
        )
        .orderBy("lang")
    )


SAMPLE_K_PER_GROUP = 5


def fixed_k_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum sampling: the 5 docs per (lang) stratum with
    the smallest md5-derived priority — the deterministic, distributed
    replacement for reservoir sampling. Bernoulli sampling
    (``stratified_sample_counts``) can't promise a sample SIZE; this
    promises exactly min(k, |stratum|) rows, identically on any engine,
    any partitioning, any growth step (a doc's priority never changes, so
    adding docs only ever displaces by priority — the bottom-k property
    reservoir algorithms approximate with RNG state).

    Plan shape: one rank window per stratum over the hashed priority; at
    scale the same result comes cheaper from a per-partition top-k +
    merge (Spark's TakeOrdered generalized per key) — the window form is
    the declarative statement of it.
    """
    docs = load_table(spark, sf_dir, "documents")
    pri = F.expr(md5_int_sql("CAST(doc_id AS STRING)")).alias("priority")
    w = Window.partitionBy("lang").orderBy("priority", "doc_id")
    return (
        docs.select("lang", "doc_id", "source", pri)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SAMPLE_K_PER_GROUP)
        .select("lang", "rank", "doc_id", "source", "priority")
        .orderBy("lang", "rank")
    )


def domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture rebalancing: per source domain, token counts, observed
    token share, and the resampling weight that would equalize the mix
    (weight = target_share / observed_share, uniform target). This is the
    domain-mixing step of corpus assembly (e.g. up-weighting a small
    high-quality domain against web crawl). One doc-level map pass + a
    source-keyed agg; the share/weight windows run over the |domains|-row
    result, so the unpartitioned window is a non-issue at any scale.

    Weight arithmetic is written as the identical expression tree in both
    engines ((1/S) / (toks/total)) so the IEEE result is bit-equal before
    the 4dp round."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = (
        docs.select(
            "source",
            F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_toks"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
    )
    w = Window.partitionBy(F.lit(1))
    share = F.col("n_tokens") / F.sum("n_tokens").over(w)
    target = F.lit(1.0) / F.count(F.lit(1)).over(w)
    return per_source.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(share, 4).alias("token_share"),
        F.round(target / share, 4).alias("mix_weight"),
    ).orderBy("source")


# sampling rates per quality bucket, basis points of the 10000-bucket hash
# space (integer thresholds — engine-exact, CLAUDE.md)
QUALITY_SAMPLE_BP = {"high": 9000, "medium": 5000, "low": 1000}


def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus sampling: keep probability depends on the
    doc's quality bucket (high 90% / medium 50% / low 10%) — the standard
    up-weight-good-data assembly step, composed from the shared quality
    score and the deterministic md5-threshold sampler (stable across
    runs, engines, and repartitioning). Emits the per-bucket audit."""
    from .text import quality_score_col

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split(F.trim(F.col("text")), r"\s+")
    )
    q = quality_score_col()
    bucket = (
        F.when(q >= 0.8, "high").when(q >= 0.5, "medium").otherwise("low")
    )
    thresh = F.lit(None).cast("long")
    for b, bp in QUALITY_SAMPLE_BP.items():
        thresh = F.when(bucket == b, F.lit(bp)).otherwise(thresh)
    hash_bucket = F.expr(md5_int_sql("CAST(doc_id AS STRING)") + " % 10000")
    return (
        docs.select(
            bucket.alias("quality_bucket"),
            (hash_bucket < thresh).cast("int").alias("sampled"),
        )
        .groupBy("quality_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("sampled").alias("n_sampled"),
            F.round(F.avg("sampled"), 4).alias("observed_rate"),
        )
        .orderBy("quality_bucket")
    )


SHARD_TOKENS = 4096  # token budget per training shard
SHARD_BUCKET_DOCS = 128  # doc_id range width per prefix-sum bucket


def _shard_doc_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_toks, shard_id) under the prefix-sum packing rule —
    the ONE assignment both the ``pack_shards`` manifest and the
    ``write_packed_shards`` sink derive from (shared-helper rule: the
    manifest must describe exactly what the sink writes).

    TWO-PASS DISTRIBUTED prefix sum (the ``peak_concurrent_sessions``
    lever): docs bucket by doc_id range (``doc_id div
    SHARD_BUCKET_DOCS`` — deterministic, order-preserving, so global
    doc_id order ≡ bucket order + within-bucket order), then

      pass 1: per-bucket token subtotals → exclusive cumulative offsets
              over the |buckets|-row relation (tiny — the only ordered
              window with no partition key runs HERE, never over docs);
      pass 2: each bucket offsets its LOCAL prefix sum by the carry.

    The corpus-sized relation never passes through a single-partition
    global sort — the previous form's ``sum() OVER (ORDER BY doc_id)``
    pushed every doc through one reducer, the bottleneck of the whole
    sink at 100 TB. ONE repartition(bkt) serves both the pass-1 agg and
    the pass-2 window (superset-clustering rule); the offsets relation
    broadcasts. Outputs are bit-identical to the one-window form — the
    cumulative-before-this-doc total is invariant to where bucket
    boundaries fall — which the oracle (still the global window, the
    contract) and ``tests/test_round6.py`` (vs the inline one-window
    form at 2 SFs) both pin. At 100 TB, scale SHARD_BUCKET_DOCS ∝
    corpus/const so the bucket relation stays bounded (or recurse the
    same two-pass once more — offsets of offsets)."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_toks"),
    )
    return _prefix_shard_ids(per_doc)


def _prefix_shard_ids(per_doc: DataFrame) -> DataFrame:
    """The two-pass prefix-sum packing over an arbitrary (doc_id,
    n_toks) relation — shared by the whitespace-budget
    ``_shard_doc_assignments`` and the BPE-budget ``pack_shards_bpe``
    (one packing rule, two token-count definitions)."""
    per_doc = per_doc.withColumn(
        "bkt", F.expr(f"doc_id div {SHARD_BUCKET_DOCS}")
    ).repartition("bkt")
    w_off = (
        Window.orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = (
        per_doc.groupBy("bkt")
        .agg(F.sum("n_toks").alias("bt"))
        .select(
            "bkt",
            F.coalesce(F.sum("bt").over(w_off), F.lit(0)).alias("off"),
        )
    )
    w_loc = (
        Window.partitionBy("bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        per_doc.join(F.broadcast(offs), "bkt")
        .select(
            "doc_id",
            "n_toks",
            (F.col("off") + F.sum("n_toks").over(w_loc) - F.col("n_toks"))
            .alias("cum_before"),
        )
        .select(
            "doc_id",
            "n_toks",
            F.expr(
                f"CAST(cum_before div {SHARD_TOKENS} AS BIGINT)"
            ).alias("shard_id"),
        )
    )


def write_packed_shards(
    spark: SparkSession, sf_dir: str, path: str, fmt: str = "parquet"
) -> dict:
    """Materialize the ``pack_shards`` layout: every document joins its
    prefix-sum shard assignment and the corpus is written PARTITIONED BY
    shard_id (one directory per training shard — the layout a dataloader
    streams sequentially). ``fmt`` is ``parquet`` or ``orc`` (the
    ``write_orc`` twin). Returns the ``observe()``-collected write audit
    {n_docs, n_tokens} measured ON THE WRITE PASS itself — zero extra
    jobs — so a caller can assert the sink wrote exactly what the
    manifest promised (``tests/test_round5.py`` does, per shard, via
    read-back).

    Scale shape: the join is doc_id-keyed (the assignment relation is
    (doc_id, shard_id) — co-partitioned with the corpus scan);
    partitionBy(shard_id) writes each shard's files under its own
    directory, which is what makes shard-sequential reads pure
    contiguous IO at 100 TB. The assignment itself is the two-pass
    distributed prefix sum (see ``_shard_doc_assignments``) — the
    manifest build no longer bottlenecks the sink on a single
    reducer."""
    from pyspark.sql import Observation

    docs = load_table(spark, sf_dir, "documents")
    assigned = _shard_doc_assignments(spark, sf_dir).select(
        "doc_id", "n_toks", "shard_id"
    )
    out = docs.join(assigned, "doc_id").select(
        "doc_id", "text", "lang", "source", "n_toks", "shard_id"
    )
    obs = Observation("shard_write_audit")
    # observe() rejects DISTINCT aggregates; shard ids are a contiguous
    # 0-based prefix-sum sequence, so max+1 IS the shard count
    observed = out.observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
        (F.max("shard_id") + 1).alias("n_shards"),
    )
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"fmt must be 'parquet' or 'orc', got {fmt!r}")
    writer = observed.write.mode("overwrite").partitionBy("shard_id")
    if fmt == "orc":
        writer.orc(path)
    else:
        writer.parquet(path)
    return obs.get


def pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing: docs are laid out in doc_id order and
    cut into SHARD_TOKENS-sized training shards by prefix-sum — shard =
    (cumulative tokens before this doc) div budget. Emits per-shard doc
    count, token count, fill ratio, and the doc_id span (the manifest a
    dataloader consumes). All-integer arithmetic → exact in both engines.

    The running total is the TWO-PASS distributed prefix sum of
    ``_shard_doc_assignments`` (bucket subtotals → carry offsets →
    local prefix) — no corpus-sized relation through a single reducer;
    the oracle keeps the equivalent one-window form as the contract."""
    return _shard_manifest(_shard_doc_assignments(spark, sf_dir))


def pack_shards_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard packing under the LEARNED tokenizer's budget:
    ``pack_shards`` counts whitespace tokens, but a training pipeline
    packs by what the model actually consumes — BPE tokens. This
    variant prices every document through the final ``_bpe_train``
    merge state (the fertility relation ``bpe_fertility_hist``
    histograms): per word, tokens = |symbols after the learned merges|;
    words outside the trainable vocabulary (non-[a-z], single chars)
    count 1. High-fertility docs therefore fill shards FASTER than
    their whitespace count suggests — the budget drift
    ``tests/test_round6.py`` pins.

    Scale shape: the word→fertility table is vocabulary-sized
    (Heaps-law sublinear — broadcast), so doc pricing is one map-side
    broadcast join + a doc_id hash agg; packing reuses the two-pass
    distributed prefix sum (``_prefix_shard_ids``) — no corpus-sized
    relation through a single reducer. Cross-engine: fertilities and
    counts are exact integers; the oracle replays the identical merges
    (shared ``_duck_bpe_pieces`` chain) and prices with the same
    COALESCE(fert, 1) rule."""
    from .text import _bpe_train, _with_tokens

    _, vocab, _ = _bpe_train(spark, sf_dir)
    fert = vocab.select(
        F.concat_ws("", "syms").alias("w"),
        F.size("syms").alias("fert"),
    )
    toks = _with_tokens(spark, sf_dir).select(
        "doc_id", F.explode("toks").alias("tok")
    )
    per_doc = (
        toks.select("doc_id", F.lower(F.col("tok")).alias("w"))
        .join(F.broadcast(fert), "w", "left")
        .groupBy("doc_id")
        .agg(F.sum(F.coalesce("fert", F.lit(1))).alias("n_toks"))
    )
    return _shard_manifest(_prefix_shard_ids(per_doc))


def _shard_manifest(assigned: DataFrame) -> DataFrame:
    """The shared manifest shaping over a (doc_id, n_toks, shard_id)
    assignment — ONE aggregation list for ``pack_shards`` and
    ``pack_shards_bpe`` so the manifest contract (columns, 4dp fill
    ratio, span keys) can't drift between the two budgets."""
    return (
        assigned.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.round(F.sum("n_toks") / F.lit(SHARD_TOKENS), 4).alias(
                "fill_ratio"
            ),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
        .orderBy("shard_id")
    )


def _duck_pack_bpe_sql() -> str:
    from .text import BPE_ENC_MERGES, _duck_bpe_pieces
    from .text import _DUCK_TOKS as _TOKS_EXPR

    last = BPE_ENC_MERGES
    return (
        "WITH RECURSIVE "
        + ",\n".join(_duck_bpe_pieces())
        + f""",
fert AS (
  SELECT replace(trim(s), ' ', '') AS w,
    len(string_split(trim(s), ' ')) AS fert
  FROM v{last}
),
doc_toks AS (
  SELECT doc_id, lower(u.tok) AS w
  FROM (SELECT doc_id, {_TOKS_EXPR} AS t FROM documents)
  CROSS JOIN UNNEST(t) u(tok)
),
per_doc AS (
  SELECT d.doc_id, CAST(sum(COALESCE(f.fert, 1)) AS BIGINT) AS n_toks
  FROM doc_toks d LEFT JOIN fert f ON f.w = d.w
  GROUP BY d.doc_id
),
assigned AS (
  SELECT doc_id, n_toks,
    CAST((CAST(sum(n_toks) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED
          PRECEDING AND CURRENT ROW) AS BIGINT) - n_toks)
         // {SHARD_TOKENS} AS BIGINT) AS shard_id
  FROM per_doc
)
SELECT shard_id,
  count(*) AS n_docs,
  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
  round(CAST(sum(n_toks) AS BIGINT) / {SHARD_TOKENS}, 4) AS fill_ratio,
  min(doc_id) AS first_doc_id,
  max(doc_id) AS last_doc_id
FROM assigned
GROUP BY shard_id
ORDER BY shard_id
"""
    )


def inverted_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index: term → sorted posting list of doc_ids, emitted as
    (term, df, total_tf, postings fingerprint). The posting list itself is
    the payload at scale; hashing it keeps the oracle row narrow while
    still pinning exact membership AND order. Skew note: every term's
    postings concentrate on one reducer — real web-scale corpora drop or
    shard stop-word terms (df cap) before this agg."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
    )
    per_doc = toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    return (
        per_doc.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("total_tf"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.expr(
                        "transform(sort_array(collect_list(doc_id)),"
                        " x -> CAST(x AS STRING))"
                    ),
                )
            ).alias("postings_md5"),
        )
        .orderBy("term")
    )


_DUCK_TOKS = """
toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '[ \\t\\n\\x0b\\f\\r]+')) AS term
  FROM documents
)"""

_RATE_CASE = "CASE lang " + " ".join(
    f"WHEN '{lang}' THEN {bp}" for lang, bp in SAMPLE_BP.items()
) + " END"

ORACLE: dict[str, str] = {
    "fixed_k_group_sample": f"""
WITH pri AS (
  SELECT lang, doc_id, source,
    {duck_md5_int("CAST(doc_id AS VARCHAR)")} AS priority
  FROM documents
),
ranked AS (
  SELECT lang, doc_id, source, priority,
    CAST(row_number() OVER (PARTITION BY lang ORDER BY priority, doc_id)
      AS INT) AS rank
  FROM pri
)
SELECT lang, rank, doc_id, source, priority
FROM ranked WHERE rank <= {SAMPLE_K_PER_GROUP}
ORDER BY lang, rank
""",
    "pii_redact": f"""
SELECT doc_id,
  len(regexp_extract_all(text, '{_BLOCK_RE}')) AS n_blocked,
  len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
  len(regexp_extract_all(text, '{IPV4_RE}')) AS n_ipv4,
  md5(regexp_replace(regexp_replace(regexp_replace(
        text, '{_BLOCK_RE}', '[REDACTED]', 'g'),
        '{EMAIL_RE}', '[REDACTED]', 'g'),
        '{IPV4_RE}', '[REDACTED]', 'g')) AS clean_md5
FROM documents
ORDER BY doc_id
""",
    "tfidf_top_terms": f"""
WITH {_DUCK_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
    round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 4) AS tfidf,
    row_number() OVER (PARTITION BY tf.doc_id
                       ORDER BY round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 4) DESC,
                                tf.term) AS rank
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, tfidf, rank
FROM scored WHERE rank <= {TFIDF_TOP_N}
ORDER BY doc_id, rank
""",
    "pack_shards": f"""
WITH per AS (
  SELECT doc_id, len(string_split_regex(trim(text), '[ \\t\\n\\x0b\\f\\r]+')) AS n_toks
  FROM documents
),
assigned AS (
  SELECT doc_id, n_toks,
    CAST((CAST(sum(n_toks) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED
          PRECEDING AND CURRENT ROW) AS BIGINT) - n_toks)
         // {SHARD_TOKENS} AS BIGINT) AS shard_id
  FROM per
)
SELECT shard_id,
  count(*) AS n_docs,
  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
  round(CAST(sum(n_toks) AS BIGINT) / {SHARD_TOKENS}, 4) AS fill_ratio,
  min(doc_id) AS first_doc_id,
  max(doc_id) AS last_doc_id
FROM assigned
GROUP BY shard_id
ORDER BY shard_id
""",
    "domain_mix_weights": """
WITH per AS (
  SELECT source, count(*) AS n_docs,
    CAST(sum(len(string_split_regex(trim(text), '[ \\t\\n\\x0b\\f\\r]+'))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
)
SELECT source, n_docs, n_tokens,
  round(n_tokens / sum(n_tokens) OVER (), 4) AS token_share,
  round((CAST(1.0 AS DOUBLE) / count(*) OVER ()) / (n_tokens / sum(n_tokens) OVER ()), 4) AS mix_weight
FROM per
ORDER BY source
""",
    "quality_weighted_sample": f"""
WITH {duck_quality_ctes()},
b AS (
  SELECT doc_id,
    CASE WHEN quality >= 0.8 THEN 'high'
         WHEN quality >= 0.5 THEN 'medium'
         ELSE 'low' END AS quality_bucket
  FROM q
),
samp AS (
  SELECT quality_bucket,
    CAST({duck_md5_int("CAST(doc_id AS VARCHAR)")} % 10000 <
      CASE quality_bucket WHEN 'high' THEN {QUALITY_SAMPLE_BP["high"]}
                          WHEN 'medium' THEN {QUALITY_SAMPLE_BP["medium"]}
                          ELSE {QUALITY_SAMPLE_BP["low"]} END AS INT) AS sampled
  FROM b
)
SELECT quality_bucket,
  count(*) AS n_total,
  CAST(sum(sampled) AS BIGINT) AS n_sampled,
  round(avg(sampled), 4) AS observed_rate
FROM samp
GROUP BY quality_bucket
ORDER BY quality_bucket
""",
    "stratified_sample_counts": f"""
SELECT lang,
  count(*) AS n_total,
  CAST(sum(sampled) AS BIGINT) AS n_sampled,
  round(avg(sampled), 4) AS observed_rate
FROM (
  SELECT lang,
    CAST({duck_md5_int('CAST(doc_id AS VARCHAR)')}
         % 10000 < {_RATE_CASE} AS INT) AS sampled
  FROM documents
) GROUP BY lang
ORDER BY lang
""",
    "inverted_index_stats": f"""
WITH {_DUCK_TOKS},
per_doc AS (SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY term, doc_id)
SELECT term,
  count(*) AS df,
  CAST(sum(tf) AS BIGINT) AS total_tf,
  md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS postings_md5
FROM per_doc
GROUP BY term
ORDER BY term
""",
}

QUERIES = {
    "pii_redact": pii_redact,
    "fixed_k_group_sample": fixed_k_group_sample,
    "tfidf_top_terms": tfidf_top_terms,
    "stratified_sample_counts": stratified_sample_counts,
    "domain_mix_weights": domain_mix_weights,
    "pack_shards": pack_shards,
    "quality_weighted_sample": quality_weighted_sample,
    "inverted_index_stats": inverted_index_stats,
}


# ---------------------------------------------------------------------------
# BM25 ranked retrieval over the corpus
# ---------------------------------------------------------------------------

BM25_QUERY = ("spark", "table", "scan", "merge")  # fixed query terms
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 10


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Robertson-Walker, the Lucene default) for a
    fixed query — the retrieval scorer a RAG corpus actually serves,
    next to ``tfidf_top_terms``' per-doc term profile. idf uses the
    +1-smoothed Lucene form (always positive); tf saturates under k1 and
    normalizes by doc length under b.

    Scale shape: the per-(doc, query-term) tf agg filters to the QUERY
    vocabulary BEFORE the shuffle (the predicate reaches the explode —
    candidate postings only); doc lengths are one more partial agg; df
    and avgdl are broadcast-tiny. Final ranking is a top-k heap
    (TakeOrderedAndProject), never a global sort. Integer tf/df/dl on
    both engines; avgdl rounds 6dp so the normalization divides
    identical doubles; scores round 4dp (ln is ≤1-ulp on both engines —
    the repo's F.log convention).
    """
    return (
        _bm25_scores(spark, sf_dir)
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(BM25_TOP)
    )


def _bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared BM25 scoring relation (doc_id, n_terms_hit, bm25) for
    the fixed ``BM25_QUERY`` — consumed by ``bm25_search`` (top-k) and
    ``rrf_hybrid_search`` (rank fusion); one helper so the two can never
    drift apart (the shared-helper rule)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
    )
    qterms = list(BM25_QUERY)
    tf = (
        toks.filter(F.col("term").isin(qterms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("dl"), 6).alias("avgdl"),
    )
    df_rel = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + F.lit(BM25_K1) * (
        1.0 - F.lit(BM25_B) + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")
    )
    term_score = idf * F.col("tf") * (F.lit(BM25_K1) + 1.0) / denom
    return (
        tf.join(F.broadcast(df_rel), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_hit"),
            F.round(F.sum(term_score), 4).alias("bm25"),
        )
    )


# shared BM25 CTE chain ending in a `bm25_scores` relation — the oracle
# twin of `_bm25_scores`, composed by bm25_search AND rrf_hybrid_search
_DUCK_BM25_CTES = f"""{_DUCK_TOKS},
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks
  WHERE term IN ({", ".join(f"'{t}'" for t in BM25_QUERY)})
  GROUP BY doc_id, term
),
dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, round(avg(dl), 6) AS avgdl
  FROM dl
),
df_rel AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
),
bm25_scores AS (
  SELECT t.doc_id,
    CAST(count(*) AS BIGINT) AS n_terms_hit,
    round(sum(
      ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
      * t.tf * ({BM25_K1} + 1.0)
      / (t.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * l.dl / s.avgdl))
    ), 4) AS bm25
  FROM tf t
  JOIN df_rel d ON d.term = t.term
  JOIN dl l ON l.doc_id = t.doc_id
  CROSS JOIN stats s
  GROUP BY t.doc_id
)"""

ORACLE["bm25_search"] = f"""
WITH {_DUCK_BM25_CTES}
SELECT doc_id, n_terms_hit, bm25
FROM bm25_scores
ORDER BY bm25 DESC, doc_id
LIMIT {BM25_TOP}
"""
QUERIES["bm25_search"] = bm25_search


# ---------------------------------------------------------------------------
# differentially-private count release (Laplace mechanism, seeded)
# ---------------------------------------------------------------------------

DP_EPSILON = 0.5  # per-release budget; sensitivity 1 for counting queries


def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-DP release of the per-type event counts via the Laplace
    mechanism — the privacy-preserving aggregate a corpus pipeline
    publishes when raw counts would leak membership (counting query,
    sensitivity 1, noise b = 1/ε). The audit columns show exact next to
    released, so the privacy/utility trade is visible in the result.

    The noise is SEEDED: a per-key md5-uniform drives the inverse
    Laplace CDF (−b·sign(u−½)·ln(1−2|u−½|)), so the release is
    reproducible AND cross-engine checkable (true DP would draw fresh
    randomness per release; the seeded form is the testable fixture —
    swap the md5-uniform for `rand()` in production and drop the
    oracle). One hash agg plus map-side noise arithmetic: the release
    costs exactly the count query. ln/sign compute textually identically
    from the identical uniform on both engines; 4dp rounds.
    """
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("exact_n")
    )
    u = (
        F.expr(md5_int_sql("concat('dp_', event_type)")).cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    b = 1.0 / DP_EPSILON
    sign = F.when(u >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    noise = -F.lit(b) * sign * F.log(1.0 - 2.0 * F.abs(u - F.lit(0.5)))
    return (
        counts.select(
            "event_type",
            "exact_n",
            F.lit(DP_EPSILON).alias("epsilon"),
            # noise can drive a small count to ~0/negative: -0.0 guard
            (F.round(F.col("exact_n") + noise, 4) + F.lit(0.0)).alias(
                "released_n"
            ),
            (F.round(F.abs(noise), 4) + F.lit(0.0)).alias("abs_noise"),
        )
        .orderBy("event_type")
    )


ORACLE["dp_noisy_counts"] = f"""
WITH counts AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS exact_n
  FROM events GROUP BY event_type
),
noised AS (
  SELECT event_type, exact_n,
    (CAST({duck_md5_int("'dp_' || event_type")} AS DOUBLE) + 0.5)
      / 4294967296.0 AS u
  FROM counts
)
SELECT event_type, exact_n,
  CAST({DP_EPSILON} AS DOUBLE) AS epsilon,
  round(exact_n + (-(1.0 / {DP_EPSILON})
    * (CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END)
    * ln(1.0 - 2.0 * abs(u - 0.5))), 4) + 0.0 AS released_n,
  round(abs(-(1.0 / {DP_EPSILON})
    * (CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END)
    * ln(1.0 - 2.0 * abs(u - 0.5))), 4) + 0.0 AS abs_noise
FROM noised
ORDER BY event_type
"""
QUERIES["dp_noisy_counts"] = dp_noisy_counts


# ---------------------------------------------------------------------------
# Efraimidis-Spirakis weighted reservoir sample (exact-k, deterministic)
# ---------------------------------------------------------------------------

WRS_K = 20  # sample size


def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k sampling with probability ∝ weight WITHOUT replacement —
    the Efraimidis-Spirakis (2006) A-ES scheme: each item draws a
    uniform u and ranks by ln(u)/w (monotone-equivalent to u^(1/w));
    the top-k by that key IS the weighted sample. Here: 20 documents
    weighted by length (``quality_weighted_sample`` is the
    Bernoulli-rate cousin — rate-based, not exact-k; this one returns
    EXACTLY k for a fixed training budget).

    A-ES is THE distributed weighted-sampling algorithm because the key
    is computed map-side per item and top-k is a heap merge
    (TakeOrderedAndProject) — no global sort, no sequential reservoir.
    The uniform is a seeded md5 (cross-engine rule; production swaps in
    ``rand()`` and drops the oracle). Keys round 10dp before ranking
    (ln is ≤1-ulp across engines), ties break on doc_id.
    """
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.expr(md5_int_sql("concat('wrs_', CAST(doc_id AS STRING))")).cast(
            "double"
        )
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    key = F.round(F.log(u) / F.col("n_chars").cast("double"), 10)
    return (
        docs.select(
            "doc_id",
            "lang",
            F.col("n_chars").alias("weight"),
            key.alias("wrs_key"),
        )
        .orderBy(F.desc("wrs_key"), "doc_id")
        .limit(WRS_K)
    )


ORACLE["weighted_reservoir_sample"] = f"""
SELECT doc_id, lang, n_chars AS weight,
  round(ln((CAST({duck_md5_int("'wrs_' || CAST(doc_id AS VARCHAR)")}
            AS DOUBLE) + 0.5) / 4294967296.0)
        / CAST(n_chars AS DOUBLE), 10) AS wrs_key
FROM documents
ORDER BY wrs_key DESC, doc_id
LIMIT {WRS_K}
"""
QUERIES["weighted_reservoir_sample"] = weighted_reservoir_sample


# ---------------------------------------------------------------------------
# hybrid retrieval: reciprocal-rank fusion of BM25 + dense cosine rankings
# ---------------------------------------------------------------------------

RRF_K = 60  # the standard Cormack et al. 2009 dampening constant
RRF_QUERY_VEC = 0  # dense query = this vector's embedding
RRF_DENSE_TOP = 10  # dense candidates fused (sparse side uses BM25_TOP)
RRF_SCALE = 1_000_000  # integer-exact contributions: SCALE // (K + rank)


def rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval the way production RAG stacks run it: fuse the
    sparse BM25 ranking (``_bm25_scores``, fixed term query) with the
    dense cosine ranking (query = vec 0's embedding, the
    ``knn_brute_force`` shape) via reciprocal-rank fusion —
    score(d) = Σ_lists 1/(k + rank_d). RRF needs no score calibration
    between the two retrievers, which is exactly why it is the default
    fusion everywhere.

    Scale shape: each ranking is already top-k'd by its own operator
    (TakeOrderedAndProject heaps — no global sort), so the fusion itself
    runs on ≤ (BM25_TOP + RRF_DENSE_TOP) rows: union the two rank lists,
    one tiny hash agg, one window for the fused rank. Cross-engine: the
    1/(k+rank) contributions are INTEGER division ``SCALE // (k+rank)``
    summed exactly — no float sum ordering to diverge — and ranks come
    from 4dp-rounded scores with id tie-breaks.
    """
    from .dedup import _cosine_expr

    sparse = (
        _bm25_scores(spark, sf_dir)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("bm25"), "doc_id")
            ),
        )
        .filter(F.col("rank") <= BM25_TOP)
        .select("doc_id", "rank", F.lit("sparse").alias("src"))
    )
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == RRF_QUERY_VEC).select(
        F.col("embedding").alias("qe")
    )
    dense = (
        emb.filter(F.col("vec_id") != RRF_QUERY_VEC)
        .select(F.col("vec_id").alias("doc_id"), "embedding")
        .join(F.broadcast(q))
        .select(
            "doc_id",
            F.round(_cosine_expr("qe", "embedding"), 4).alias("cosine"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("cosine"), "doc_id")
            ),
        )
        .filter(F.col("rank") <= RRF_DENSE_TOP)
        .select("doc_id", "rank", F.lit("dense").alias("src"))
    )
    contribs = sparse.unionByName(dense).select(
        "doc_id",
        F.expr(f"CAST({RRF_SCALE} DIV ({RRF_K} + rank) AS BIGINT)").alias(
            "c"
        ),
        F.when(F.col("src") == "sparse", F.col("rank")).alias("sr"),
        F.when(F.col("src") == "dense", F.col("rank")).alias("dr"),
    )
    wf = Window.orderBy(F.desc("rrf_score_scaled"), "doc_id")
    return (
        contribs.groupBy("doc_id")
        .agg(
            F.sum("c").alias("rrf_score_scaled"),
            F.max("sr").alias("sparse_rank"),
            F.max("dr").alias("dense_rank"),
        )
        .withColumn("fused_rank", F.row_number().over(wf))
        .select(
            "fused_rank",
            "doc_id",
            "rrf_score_scaled",
            "sparse_rank",
            "dense_rank",
        )
        .orderBy("fused_rank")
    )


def _duck_rrf_sql() -> str:
    from ..functions.vector_sql import duck_cosine_sql, duck_l2_sql

    return f"""
WITH {_DUCK_BM25_CTES},
sparse AS (
  SELECT doc_id,
    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
  FROM bm25_scores
  QUALIFY rank <= {BM25_TOP}
),
norms AS (
  SELECT vec_id, {duck_l2_sql('embedding')} AS nrm FROM embeddings
),
dense AS (
  SELECT doc_id, rank FROM (
    SELECT c.vec_id AS doc_id,
      row_number() OVER (ORDER BY
        round({duck_cosine_sql('q.embedding', 'c.embedding', 'nq.nrm', 'nc.nrm')}, 4)
          DESC, c.vec_id) AS rank
    FROM embeddings q
    JOIN embeddings c
      ON q.vec_id = {RRF_QUERY_VEC} AND c.vec_id <> {RRF_QUERY_VEC}
    JOIN norms nq ON nq.vec_id = q.vec_id
    JOIN norms nc ON nc.vec_id = c.vec_id
  ) WHERE rank <= {RRF_DENSE_TOP}
),
contribs AS (
  SELECT doc_id, CAST({RRF_SCALE} // ({RRF_K} + rank) AS BIGINT) AS c,
         rank AS sr, CAST(NULL AS BIGINT) AS dr
  FROM sparse
  UNION ALL
  SELECT doc_id, CAST({RRF_SCALE} // ({RRF_K} + rank) AS BIGINT) AS c,
         CAST(NULL AS BIGINT) AS sr, rank AS dr
  FROM dense
)
SELECT
  CAST(row_number() OVER (ORDER BY rrf_score_scaled DESC, doc_id) AS BIGINT)
    AS fused_rank,
  doc_id, rrf_score_scaled, sparse_rank, dense_rank
FROM (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf_score_scaled,
         max(sr) AS sparse_rank, max(dr) AS dense_rank
  FROM contribs GROUP BY doc_id
)
ORDER BY fused_rank
"""


ORACLE["rrf_hybrid_search"] = _duck_rrf_sql()
QUERIES["rrf_hybrid_search"] = rrf_hybrid_search

ORACLE["pack_shards_bpe"] = _duck_pack_bpe_sql()
QUERIES["pack_shards_bpe"] = pack_shards_bpe


# ---------------------------------------------------------------------------
# DSIR: data selection by hashed-n-gram importance resampling
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 256  # hashed unigram feature space
DSIR_TARGET_QUALITY = 0.7  # docs at/above this quality ARE the target dist
DSIR_TOP = 25  # selected docs emitted


def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"): score every raw document by how much its
    hashed-n-gram distribution looks like a TARGET distribution, then
    keep the top-scoring docs — the scalable stand-in for training a
    classifier over the whole corpus. Target here = the shared quality
    gate (``quality_score_col`` ≥ {thr}); features = lowercased unigrams
    hashed into ``DSIR_BUCKETS`` md5 buckets (engine-neutral); per-doc
    log importance = Σ_tokens ln(p_target[b]/p_raw[b]) with Laplace
    smoothing. Emits the ``DSIR_TOP`` selected docs with their weights.

    Scale shape: fit-then-score = TWO corpus scans, each map-side (the
    quality flag rides the explode — no self-join): the fit scan feeds
    the CONSTANT-size (B-row) bucket aggregate, which broadcasts onto
    the score scan's token stream (Catalyst plans the shared `feats`
    subtree once per consumer; re-scanning parquet is the right trade
    vs materializing the exploded token relation, the standard
    two-pass fit/score shape). Per-doc scoring is one doc_id hash agg;
    selection is orderBy+limit → TakeOrderedAndProject (per-partition
    top-k + merge, no global sort). At 100 TB the fit relation is still
    256 rows.

    Cross-engine: bucket counts are exact integers; the ONLY libm call
    is one ln per bucket, computed from identical integer inputs with
    the identical cast/multiply/divide chain, then scaled to 1e6
    integers — per-doc sums are order-free integer arithmetic (the
    SPRT/TextRank recipe), so the final 4dp weight divides one exact
    integer. ``+ 0.0`` guards the -0.0 hash hazard."""
    from .text import quality_score_col

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split(F.trim(F.col("text")), r"\s+")
    )
    # quality MUST be materialized in its own projection BEFORE the
    # explode: with the expression in the same select as the generator,
    # Catalyst placed it in the post-Generate Project, re-running the
    # array_distinct + lambda filters once per TOKEN instead of once
    # per doc (measured 6.2 s -> ~1 s at sf0.1). md5_int64 of the
    # boolean-carrying Generate output stays per-token, as intended.
    gated = docs.select(
        "doc_id",
        (quality_score_col() >= DSIR_TARGET_QUALITY).alias("is_target"),
        "toks",
    )
    feats = gated.select(
        "doc_id", "is_target", F.explode("toks").alias("tok")
    ).select(
        "doc_id",
        "is_target",
        (F.expr(md5_int_sql("lower(tok)")) % DSIR_BUCKETS).alias("bucket"),
    )
    counts = feats.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.col("is_target").cast("long")).alias("ct"),
    )
    tot = counts.agg(
        F.sum("cr").alias("r_tot"), F.sum("ct").alias("t_tot")
    )
    lr_expr = (
        f"CAST(round(ln((CAST(ct + 1 AS DOUBLE) * CAST(r_tot + {DSIR_BUCKETS} AS DOUBLE))"
        f" / (CAST(cr + 1 AS DOUBLE) * CAST(t_tot + {DSIR_BUCKETS} AS DOUBLE)))"
        " * 1000000, 0) AS BIGINT)"
    )
    lr = counts.join(F.broadcast(tot)).select(
        "bucket", F.expr(lr_expr).alias("lr_int")
    )
    per_doc = (
        feats.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("lr_int").alias("s"),
        )
        .select(
            "doc_id",
            "n_feats",
            (
                F.round(
                    F.expr("CAST(s AS DOUBLE) / CAST(1000000 AS DOUBLE)"), 4
                )
                + F.lit(0.0)
            ).alias("log_weight"),
        )
    )
    top = per_doc.orderBy(F.desc("log_weight"), "doc_id").limit(DSIR_TOP)
    w = Window.orderBy(F.desc("log_weight"), "doc_id")
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "n_feats", "log_weight"
    ).orderBy("rank")


def _duck_dsir_sql() -> str:
    from .text import _DUCK_TOKS as _TOKS_EXPR

    pri = duck_md5_int("lower(u.tok)")
    return f"""
WITH {duck_quality_ctes(t="qt", s="qs", q="qq")},
feats AS (
  SELECT d.doc_id, (qq.quality >= {DSIR_TARGET_QUALITY}) AS is_target,
    {pri} % {DSIR_BUCKETS} AS bucket
  FROM (SELECT doc_id, {_TOKS_EXPR} AS t FROM documents) d
  CROSS JOIN UNNEST(t) u(tok)
  JOIN qq ON qq.doc_id = d.doc_id
),
counts AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS cr,
    CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS ct
  FROM feats GROUP BY bucket
),
tot AS (
  SELECT CAST(sum(cr) AS BIGINT) AS r_tot, CAST(sum(ct) AS BIGINT) AS t_tot
  FROM counts
),
lr AS (
  SELECT bucket,
    CAST(round(ln((CAST(ct + 1 AS DOUBLE) * CAST(r_tot + {DSIR_BUCKETS} AS DOUBLE))
      / (CAST(cr + 1 AS DOUBLE) * CAST(t_tot + {DSIR_BUCKETS} AS DOUBLE)))
      * 1000000, 0) AS BIGINT) AS lr_int
  FROM counts CROSS JOIN tot
),
per_doc AS (
  SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
    CAST(sum(l.lr_int) AS BIGINT) AS s
  FROM feats f JOIN lr l USING (bucket)
  GROUP BY f.doc_id
),
ranked AS (
  SELECT doc_id, n_feats,
    round(CAST(s AS DOUBLE) / CAST(1000000 AS DOUBLE), 4) + 0.0 AS log_weight
  FROM per_doc
)
SELECT * FROM (
  SELECT CAST(row_number() OVER (ORDER BY log_weight DESC, doc_id) AS INT)
      AS rank,
    doc_id, n_feats, log_weight
  FROM ranked
) WHERE rank <= {DSIR_TOP}
ORDER BY rank
"""


ORACLE["dsir_importance_select"] = _duck_dsir_sql()
QUERIES["dsir_importance_select"] = dsir_importance_select


# ---------------------------------------------------------------------------
# Temperature-scaled language mixing (p_l ∝ n_l^alpha)
# ---------------------------------------------------------------------------

MIX_TEMPERATURE_ALPHA = 0.7  # the mT5/XLM-R exponent


def temperature_mix_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling allocation across languages
    (p_l ∝ n_l^α, α = {MIX_TEMPERATURE_ALPHA}) — the multilingual
    mixing rule (mT5 / XLM-R) that up-weights low-resource languages
    without flattening the mix entirely: the complement of
    ``domain_mix_weights``' uniform-target rule. Emits per language the
    token count, raw share, temperature share, and the effective
    EPOCHS over each language's data at a budget of one total-corpus
    pass (epochs_l = p_l·T/n_l — the number every data engineer checks
    for over-repetition before training).

    Scale shape: ONE doc-level map pass + a language-keyed agg; all
    post-agg arithmetic runs on the |languages|-row relation. The
    cross-language Σ n^α is an ORDERED plain-double fold over the
    lang-sorted list (cmh discipline — float sums never hit a
    hash-agg). n^α evaluates as exp(α·ln n) with the ln pre-rounded
    8dp (kaplan_meier's exp/ln identity class)."""
    docs = load_table(spark, sf_dir, "documents")
    per_lang = (
        docs.select(
            "lang",
            F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_toks"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            F.expr(
                f"exp(round({MIX_TEMPERATURE_ALPHA!r}"
                " * ln(CAST(n_tokens AS DOUBLE)), 8))"
            ).alias("w"),
        )
    )
    packed = per_lang.agg(
        F.sort_array(
            F.collect_list(F.struct("lang", "n_docs", "n_tokens", "w"))
        ).alias("ks")
    )
    fold = (
        "aggregate(transform(ks, x -> x.{f}), CAST(0.0 AS DOUBLE),"
        " (p, q) -> p + q)"
    )
    tot = packed.select(
        "ks",
        F.expr(fold.format(f="w")).alias("sw"),
        F.expr(
            "aggregate(transform(ks, x -> x.n_tokens),"
            " CAST(0 AS BIGINT), (p, q) -> p + q)"
        ).alias("st"),
    )
    row = tot.select(F.explode("ks").alias("x"), "sw", "st").select(
        F.col("x.lang").alias("lang"),
        F.col("x.n_docs").alias("n_docs"),
        F.col("x.n_tokens").alias("n_tokens"),
        "x.w",
        "sw",
        "st",
    )
    return row.select(
        "lang",
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_tokens") / F.col("st").cast("double"), 4
        ).alias("raw_share"),
        F.round(F.col("w") / F.col("sw"), 4).alias("temp_share"),
        F.round(
            (F.col("w") / F.col("sw"))
            * F.col("st").cast("double")
            / F.col("n_tokens").cast("double"),
            4,
        ).alias("epochs_at_budget"),
    ).orderBy("lang")


def _duck_temperature_mix_sql() -> str:
    from .text import _DUCK_TOKS

    fold = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        " list_transform(ks, x -> x.{f})), (p, q) -> p + q)"
    )
    ifold = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT),"
        " list_transform(ks, x -> x.n_tokens)), (p, q) -> p + q)"
    )
    return f"""
WITH per_lang AS (
  SELECT lang,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(len({_DUCK_TOKS})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
),
wl AS (
  SELECT lang, n_docs, n_tokens,
    exp(round({MIX_TEMPERATURE_ALPHA!r}
      * ln(CAST(n_tokens AS DOUBLE)), 8)) AS w
  FROM per_lang
),
packed AS (
  SELECT list(struct_pack(lang := lang, n_docs := n_docs,
    n_tokens := n_tokens, w := w) ORDER BY lang) AS ks
  FROM wl
),
tot AS (
  SELECT ks, {fold.format(f='w')} AS sw, {ifold} AS st FROM packed
),
expanded AS (
  SELECT u.x.lang AS lang, u.x.n_docs AS n_docs,
    u.x.n_tokens AS n_tokens, u.x.w AS w, sw, st
  FROM tot, UNNEST(ks) u(x)
)
SELECT lang, n_docs, n_tokens,
  round(n_tokens / CAST(st AS DOUBLE), 4) AS raw_share,
  round(w / sw, 4) AS temp_share,
  round((w / sw) * CAST(st AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4)
    AS epochs_at_budget
FROM expanded
ORDER BY lang
"""


ORACLE["temperature_mix_allocation"] = _duck_temperature_mix_sql()
QUERIES["temperature_mix_allocation"] = temperature_mix_allocation


# ---------------------------------------------------------------------------
# deterministic epoch shuffle — reproducible training data order
# ---------------------------------------------------------------------------

EPOCH_COUNT = 3  # epochs to lay out (each gets an independent permutation)
EPOCH_SHARD_DOCS = 64  # docs per dataloader shard
EPOCH_KEY_BUCKETS = 32  # md5-range buckets for the two-pass rank
_EPOCH_KEY_SPAN = (1 << 60) // EPOCH_KEY_BUCKETS  # 60-bit key / buckets
_POS_PACK = 1 << 31  # packed = pos * 2^31 + doc_id (both < 2^31)


def epoch_shuffle_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training-data order: every epoch e gives
    each document the shuffle key ``md5("ep{e}_" || doc_id)`` (60-bit,
    the house convention), the document's epoch position is its rank
    under (key, doc_id), and positions cut into EPOCH_SHARD_DOCS-sized
    dataloader shards. The manifest — per (epoch, shard): doc count and
    the head/tail doc ids — is what makes a 100 TB training run
    REPRODUCIBLE: re-running the layout job yields byte-identical
    order (no seeded engine sampler anywhere), and an interrupted epoch
    resumes from a shard boundary instead of re-shuffling.

    The pack assumes doc_id < 2^31: pos overflow throws under ANSI
    Spark on its own, but an oversized doc_id would silently leak its
    high bits into pos and corrupt head/tail on BOTH engines (packed %
    2^31 drops them without overflowing) — so the pack carries an
    ``assert_true(doc_id < 2^31)`` guard that fails the query loudly
    instead (ADVICE r9; guard pinned in test_round10.py). A wider doc-id
    space needs a wider pack constant, not a silent wrap.

    Rank without a global sort: md5 keys are uniform on [0, 2^60), so
    bucketing by ``key div (2^60/EPOCH_KEY_BUCKETS)`` is BALANCED
    range bucketing for free — the two-pass sharded prefix-sum
    (``_prefix_shard_ids``'s lever, VERDICT r8 item 3) then ranks with
    one fact shuffle: per-(epoch, bucket) counts → broadcast exclusive
    offsets (|epochs × buckets| rows — tiny at any corpus size) →
    local row_number + carry. ONE ``repartition(epoch, kb)`` serves
    both passes. Head/tail docs are packed-BIGINT argmin/argmax
    (``pos * 2^31 + doc_id`` — partial-aggregating, no struct arg-max,
    no window), exact while pos and doc_id stay under 2^31.

    The oracle ranks with the plain global window — the contract the
    distributed rank must reproduce bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    from ..functions.hashing import md5_int60_sql

    key = md5_int60_sql(
        "concat('ep', CAST(epoch AS STRING), '_', CAST(doc_id AS STRING))"
    )
    keyed = (
        docs.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.lit(EPOCH_COUNT - 1))
            ).alias("epoch"),
        )
        .withColumn("k", F.expr(key))
        .withColumn("kb", F.expr(f"k div {_EPOCH_KEY_SPAN}"))
        .repartition("epoch", "kb")
    )
    w_off = Window.partitionBy("epoch").orderBy("kb").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = (
        keyed.groupBy("epoch", "kb")
        .agg(F.count(F.lit(1)).alias("bn"))
        .select(
            "epoch",
            "kb",
            F.coalesce(F.sum("bn").over(w_off), F.lit(0)).alias("off"),
        )
    )
    w_loc = Window.partitionBy("epoch", "kb").orderBy("k", "doc_id")
    ranked = (
        keyed.join(F.broadcast(offs), ["epoch", "kb"])
        .withColumn(
            "pos", F.col("off") + F.row_number().over(w_loc) - F.lit(1)
        )
        .withColumn("shard_id", F.expr(f"pos div {EPOCH_SHARD_DOCS}"))
        # assert_true yields NULL when the predicate holds, so the
        # coalesce adds 0 on valid data and the query FAILS (instead of
        # silently corrupting head/tail) on a doc_id wider than the pack
        .withColumn(
            "packed",
            F.col("pos") * _POS_PACK
            + F.col("doc_id")
            + F.coalesce(
                F.assert_true(
                    F.col("doc_id") < F.lit(_POS_PACK),
                    F.lit(
                        "epoch_shuffle_manifest: doc_id >= 2^31 breaks "
                        "the pos*2^31+doc_id pack — widen _POS_PACK"
                    ),
                ).cast("long"),
                F.lit(0),
            ),
        )
    )
    return (
        ranked.groupBy("epoch", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("pos").alias("first_pos"),
            F.max("pos").alias("last_pos"),
            (F.min("packed") % _POS_PACK).alias("head_doc_id"),
            (F.max("packed") % _POS_PACK).alias("tail_doc_id"),
        )
        .orderBy("epoch", "shard_id")
    )


def _duck_epoch_shuffle_sql() -> str:
    from ..functions.hashing import duck_md5_int60

    key = duck_md5_int60(
        "concat('ep', CAST(epoch AS VARCHAR), '_', CAST(doc_id AS VARCHAR))"
    )
    return f"""
WITH ekeys AS (
  SELECT d.doc_id, e.epoch, {key} AS k
  FROM documents d
  CROSS JOIN (SELECT unnest(generate_series(0, {EPOCH_COUNT - 1})) AS epoch) e
),
eranked AS (
  SELECT doc_id, epoch,
    row_number() OVER (PARTITION BY epoch ORDER BY k, doc_id) - 1 AS pos
  FROM ekeys
),
esharded AS (
  SELECT epoch, doc_id, pos, pos // {EPOCH_SHARD_DOCS} AS shard_id,
    pos * {_POS_PACK} + doc_id AS packed
  FROM eranked
)
SELECT CAST(epoch AS INT) AS epoch, CAST(shard_id AS BIGINT) AS shard_id,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(min(pos) AS BIGINT) AS first_pos,
  CAST(max(pos) AS BIGINT) AS last_pos,
  CAST(min(packed) % {_POS_PACK} AS BIGINT) AS head_doc_id,
  CAST(max(packed) % {_POS_PACK} AS BIGINT) AS tail_doc_id
FROM esharded
GROUP BY epoch, shard_id
ORDER BY epoch, shard_id
"""


ORACLE["epoch_shuffle_manifest"] = _duck_epoch_shuffle_sql()
QUERIES["epoch_shuffle_manifest"] = epoch_shuffle_manifest
