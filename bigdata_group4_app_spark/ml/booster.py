"""Tree-parity scorer for the reference's fitted XGBoost churn model.

The reference scores uploads through ``joblib.load("best_model.pkl")``
(reference app_test.py:14-20,235-236,296): a sklearn Pipeline of
median-impute → standardize → most-frequent-impute → one-hot, feeding a
400-tree ``binary:logistic`` gbtree booster (SURVEY.md §2.9). xgboost is
not installable in this container, so this module re-creates the scorer
from the artifact alone:

- the model bytes are extracted with a RESTRICTED, NON-EXECUTING parse —
  zlib-decompress the joblib stream, locate the embedded UBJSON model
  document (xgboost ``save_raw("ubj")``; the format is public:
  https://github.com/dmlc/xgboost/blob/master/doc/tutorials/saving_model.rst
  and ubjson.org), and decode it with the ~60-line reader below. The
  pickle opcodes themselves are NEVER executed (untrusted input);
- the fitted preprocessing constants (imputer ``statistics_``, scaler
  ``mean_``/``scale_``) are recovered as exact float64 runs from the
  same decompressed stream, anchored by value — no offsets hardcoded;
- prediction follows the public gbtree semantics: walk each tree by
  ``x[split_indices[n]] < split_conditions[n]`` (float32 compare, the
  DMatrix dtype), leaf value = ``split_conditions`` at leaf nodes
  (eta-scaled at training time; ``tests/test_booster.py`` pins the
  convention empirically via ``base_weights`` agreement), margin =
  running float64 sum over trees in order, probability =
  ``sigmoid(margin + logit(base_score))`` with ``boost_from_average``
  base_score in probability space.

Spark execution shape: the 15 features assemble as codegen'd Column
expressions (float32-cast at the end, matching DMatrix), the 400-tree
margin runs in ONE Arrow-batched ``pandas_udf`` (numpy level-at-a-time
gather — ~depth×trees vectorized ops per batch, no per-row Python), and
the sigmoid+round stays in the engine so rounding semantics match the
DuckDB oracle. The oracle evaluates the SAME trees as generated nested
CASE SQL over a shared 15-column CTE — the booster is oracle-checked
end-to-end, not rows-only: float32 thresholds/leaves embed exactly into
double literals (shortest-round-trip repr), both engines compare in
double over exact float32 embeddings, and both sum leaf doubles
left-to-right in tree order, so the margins are bit-identical.

At 100 TB the model (≈200 KB packed arrays) ships inside the UDF
closure per task batch — for a fleet deployment you'd broadcast it
once per executor instead; the plan shape (map-only scan → expressions
→ one pandas_udf → project) is unchanged.
"""

from __future__ import annotations

import os
import struct
import zlib
from functools import lru_cache

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

REFERENCE_PKL = "/root/reference/best_model.pkl"

# Feature layout (ColumnTransformer order, SURVEY.md §2.9): 7 scaled
# numerics then 8 one-hots, categories alphabetical per fitted OHE.
NUMERIC_COLS = [
    "Age",
    "Tenure",
    "Usage Frequency",
    "Support Calls",
    "Payment Delay",
    "Total Spend",
    "Last Interaction",
]
CATEGORY_LEVELS = [
    ("Gender", "Male", ["Female", "Male"]),
    ("Subscription Type", "Premium", ["Basic", "Premium", "Standard"]),
    ("Contract Length", "Annual", ["Annual", "Monthly", "Quarterly"]),
]

# Value anchors (3dp, SURVEY §2.9 table) used to LOCATE the exact fitted
# float64 arrays in the decompressed stream; the parsed values replace
# them and a test pins parsed≈anchor to 3dp.
_MEDIAN_ANCHOR = [40.0, 32.0, 16.0, 3.0, 13.0, 646.97, 14.0]
_MEAN_ANCHOR = [39.697, 31.238, 15.807, 3.846, 13.309, 619.414, 14.643]
_SCALE_ANCHOR = [12.679, 17.319, 8.591, 3.134, 8.420, 245.169, 8.611]


# ---------------------------------------------------------------------------
# restricted UBJSON reader (spec: ubjson.org; subset xgboost emits)
# ---------------------------------------------------------------------------

_NUM_FMT = {
    b"i": (">b", 1),
    b"U": (">B", 1),
    b"I": (">h", 2),
    b"l": (">i", 4),
    b"L": (">q", 8),
    b"d": (">f", 4),
    b"D": (">d", 8),
}
_ARR_DTYPE = {
    b"i": ">i1",
    b"U": ">u1",
    b"I": ">i2",
    b"l": ">i4",
    b"L": ">i8",
    b"d": ">f4",
    b"D": ">f8",
}


def _num(t: bytes, buf: bytes, pos: int):
    fmt, sz = _NUM_FMT[t]
    return struct.unpack_from(fmt, buf, pos)[0], pos + sz


def _int(buf: bytes, pos: int):
    v, pos = _num(buf[pos : pos + 1], buf, pos + 1)
    return int(v), pos


def _ubj(buf: bytes, pos: int):
    """Parse one UBJSON value. Typed arrays come back as numpy arrays
    (native byte order); objects as dicts; numbers as Python scalars."""
    t = buf[pos : pos + 1]
    pos += 1
    if t == b"{":
        obj: dict = {}
        count = None
        if buf[pos : pos + 1] == b"#":
            count, pos = _int(buf, pos + 1)
        n = 0
        while True:
            if count is None and buf[pos : pos + 1] == b"}":
                return obj, pos + 1
            if count is not None and n >= count:
                return obj, pos
            klen, pos = _int(buf, pos)
            key = buf[pos : pos + klen].decode()
            pos += klen
            obj[key], pos = _ubj(buf, pos)
            n += 1
    if t == b"[":
        etype = None
        count = None
        if buf[pos : pos + 1] == b"$":
            etype = buf[pos + 1 : pos + 2]
            pos += 2
        if buf[pos : pos + 1] == b"#":
            count, pos = _int(buf, pos + 1)
        if etype is not None:
            dt = np.dtype(_ARR_DTYPE[etype])
            arr = np.frombuffer(buf, dt, count, pos).astype(dt.newbyteorder("="))
            return arr, pos + dt.itemsize * count
        out: list = []
        n = 0
        while True:
            if count is None and buf[pos : pos + 1] == b"]":
                return out, pos + 1
            if count is not None and n >= count:
                return out, pos
            v, pos = _ubj(buf, pos)
            out.append(v)
            n += 1
    if t == b"S":
        slen, pos = _int(buf, pos)
        return buf[pos : pos + slen].decode(), pos + slen
    if t in _NUM_FMT:
        return _num(t, buf, pos)
    if t == b"T":
        return True, pos
    if t == b"F":
        return False, pos
    if t == b"Z":
        return None, pos
    raise ValueError(f"unsupported UBJSON marker {t!r} at {pos - 1}")


def _find_f64_run(dec: bytes, anchor: list[float], tol: float = 5e-3):
    """Exact float64 run located by approximate values: scan all 8 byte
    alignments with a vectorized view; return the first full match."""
    k = len(anchor)
    for off in range(8):
        usable = (len(dec) - off) // 8 * 8
        view = np.frombuffer(dec, "<f8", usable // 8, off)
        with np.errstate(invalid="ignore"):
            starts = np.nonzero(np.abs(view - anchor[0]) < tol)[0]
        for s in starts:
            if s + k <= len(view) and np.all(
                np.abs(view[s : s + k] - np.asarray(anchor)) < tol
            ):
                return tuple(float(v) for v in view[s : s + k])
    raise ValueError(f"fitted-stats anchor {anchor[:2]}... not found")


@lru_cache(maxsize=2)
def load_reference_model(pkl_path: str = REFERENCE_PKL) -> dict:
    """Extract trees + fitted preprocessing from the reference artifact.

    Returns {'trees': [per-tree dict of numpy arrays], 'base_score',
    'medians', 'means', 'scales', 'n_trees', 'num_feature'}.
    """
    dec = zlib.decompress(open(pkl_path, "rb").read())
    # the stream embeds TWO UBJSON learner docs (xgboost config, then
    # model); trees live in the second
    pat = b"{L" + (7).to_bytes(8, "big") + b"learner"
    first = dec.find(pat)
    second = dec.find(pat, first + 1)
    if second < 0:
        raise ValueError("no embedded UBJSON model document found")
    doc, _ = _ubj(dec, second)
    learner = doc["learner"]
    mp = learner["learner_model_param"]
    base_score = float(mp["base_score"].strip("[]"))
    num_feature = int(mp["num_feature"])
    trees_raw = learner["gradient_booster"]["model"]["trees"]
    trees = [
        {
            "left": t["left_children"].astype(np.int32),
            "right": t["right_children"].astype(np.int32),
            "feat": t["split_indices"].astype(np.int32),
            "cond": t["split_conditions"].astype(np.float32),
            "default_left": t["default_left"].astype(bool),
            "base_weights": t["base_weights"].astype(np.float32),
        }
        for t in trees_raw
    ]
    obj_name = learner["objective"]["name"]
    if obj_name != "binary:logistic":
        raise ValueError(f"unexpected objective {obj_name}")
    return {
        "trees": trees,
        "base_score": base_score,
        "bias": float(np.log(base_score / (1.0 - base_score))),
        "num_feature": num_feature,
        "n_trees": len(trees),
        "medians": _find_f64_run(dec, _MEDIAN_ANCHOR),
        "means": _find_f64_run(dec, _MEAN_ANCHOR),
        "scales": _find_f64_run(dec, _SCALE_ANCHOR),
    }


def booster_available(pkl_path: str = REFERENCE_PKL) -> bool:
    return os.path.exists(pkl_path)


# ---------------------------------------------------------------------------
# margin evaluation (numpy, level-at-a-time gather)
# ---------------------------------------------------------------------------


# Trees per partial sum: DuckDB's binder caps expression depth at 128, so
# the SQL margin is a flat sum of per-chunk partial sums. The numpy side
# accumulates in the SAME ((c0+c1)+c2)… grouping (each chunk left-assoc
# internally) so the float64 margins stay bit-identical across engines.
SUM_CHUNK = 50


def margin_eval(X: np.ndarray, trees: list[dict]) -> np.ndarray:
    """Σ leaf values over all trees for each row of X (float32 features).
    float64 accumulation, chunked exactly like the SQL oracle's partial
    sums — bit-identical margins, not merely close."""
    X = np.ascontiguousarray(X, dtype=np.float32)
    n = X.shape[0]
    rows = np.arange(n)
    margin = np.zeros(n, dtype=np.float64)
    for start in range(0, len(trees), SUM_CHUNK):
        acc = np.zeros(n, dtype=np.float64)
        for t in trees[start : start + SUM_CHUNK]:
            left, right, feat, cond, dleft = (
                t["left"],
                t["right"],
                t["feat"],
                t["cond"],
                t["default_left"],
            )
            nodes = np.zeros(n, dtype=np.int32)
            while True:
                li = left[nodes]
                active = li >= 0
                if not active.any():
                    break
                x = X[rows, feat[nodes]]
                go_left = np.where(np.isnan(x), dleft[nodes], x < cond[nodes])
                nxt = np.where(go_left, li, right[nodes])
                nodes = np.where(active, nxt, nodes)
            acc += cond[nodes].astype(np.float64)
        margin += acc
    return margin


def predict_proba(X: np.ndarray, model: dict) -> np.ndarray:
    """Reference predict_proba[:, 1]: sigmoid(margin + logit(base_score))."""
    z = margin_eval(X, model["trees"]) + model["bias"]
    return 1.0 / (1.0 + np.exp(-z))


# ---------------------------------------------------------------------------
# shared feature definitions (Spark Column + DuckDB SQL from one spec)
# ---------------------------------------------------------------------------


def _feature_columns(model: dict) -> list[Column]:
    feats = []
    for c, med, mean, scale in zip(
        NUMERIC_COLS, model["medians"], model["means"], model["scales"]
    ):
        scaled = (
            F.coalesce(F.col(c).cast("double"), F.lit(med)) - F.lit(mean)
        ) / F.lit(scale)
        feats.append(scaled.cast("float"))
    for c, mode, levels in CATEGORY_LEVELS:
        imputed = F.coalesce(F.col(c), F.lit(mode))
        for lv in levels:
            feats.append(
                F.when(imputed == lv, F.lit(1.0)).otherwise(F.lit(0.0)).cast("float")
            )
    return feats


def _feature_sql(model: dict, q: str = '"') -> list[str]:
    out = []
    for c, med, mean, scale in zip(
        NUMERIC_COLS, model["medians"], model["means"], model["scales"]
    ):
        out.append(
            f"CAST((coalesce(CAST({q}{c}{q} AS DOUBLE), {_dbl_lit(med)})"
            f" - {_dbl_lit(mean)}) / {_dbl_lit(scale)} AS FLOAT)"
        )
    for c, mode, levels in CATEGORY_LEVELS:
        for lv in levels:
            out.append(
                f"CAST(CASE WHEN coalesce({q}{c}{q}, '{mode}') = '{lv}' "
                f"THEN 1.0 ELSE 0.0 END AS FLOAT)"
            )
    return out


def _dbl_lit(v: float) -> str:
    """Exact double literal for DuckDB: a QUOTED-STRING cast. Bare decimal
    literals parse as DECIMAL (CLAUDE.md quirk) and the DECIMAL→DOUBLE
    conversion is NOT the correctly-rounded decimal→binary parse (observed:
    `0.15757711231708527` arrives one ulp off, flipping exact-tie split
    comparisons); `CAST('…' AS DOUBLE)` goes through the string parser,
    which round-trips repr() exactly."""
    return f"CAST('{float(v)!r}' AS DOUBLE)"


def _f32_lit(v: np.float32) -> str:
    """Shortest decimal that round-trips the float32's exact double value."""
    return _dbl_lit(float(v))


def _tree_case_sql(t: dict, node: int) -> str:
    if t["left"][node] < 0:
        return _f32_lit(t["cond"][node])
    return (
        f"(CASE WHEN f{t['feat'][node]} < {_f32_lit(t['cond'][node])} "
        f"THEN {_tree_case_sql(t, int(t['left'][node]))} "
        f"ELSE {_tree_case_sql(t, int(t['right'][node]))} END)"
    )


def margin_chunk_sqls(model: dict) -> list[str]:
    """Per-chunk partial-sum expressions (SUM_CHUNK trees each, nested
    CASEs over columns f0..f14) — kept under DuckDB's 128-deep binder
    limit; sum the chunks left-to-right for the full margin."""
    trees = model["trees"]
    return [
        "\n    + ".join(
            _tree_case_sql(t, 0) for t in trees[s : s + SUM_CHUNK]
        )
        for s in range(0, len(trees), SUM_CHUNK)
    ]


# ---------------------------------------------------------------------------
# Spark scoring surface
# ---------------------------------------------------------------------------


def score_with_booster(df: DataFrame, pkl_path: str = REFERENCE_PKL) -> DataFrame:
    """Score a churn-schema relation through the reference booster:
    CustomerID, churn_probability (4dp), predicted_churn (@0.5)."""
    from pyspark.sql.functions import pandas_udf

    model = load_reference_model(pkl_path)
    # plain ndarrays captured by value — the closure stays self-contained
    # (no package imports on workers, per project convention)
    packed = [
        (
            t["left"],
            t["right"],
            t["feat"],
            t["cond"],
            t["default_left"],
        )
        for t in model["trees"]
    ]

    sum_chunk = SUM_CHUNK

    @pandas_udf("double")
    def booster_margin(features):
        import numpy as np  # noqa: PLC0415 — executor-side import
        import pandas as pd  # noqa: PLC0415

        X = np.vstack(features.to_numpy()).astype(np.float32)
        n = X.shape[0]
        rows = np.arange(n)
        margin = np.zeros(n, dtype=np.float64)
        for start in range(0, len(packed), sum_chunk):
            acc = np.zeros(n, dtype=np.float64)
            for left, right, feat, cond, dleft in packed[
                start : start + sum_chunk
            ]:
                nodes = np.zeros(n, dtype=np.int32)
                while True:
                    li = left[nodes]
                    active = li >= 0
                    if not active.any():
                        break
                    x = X[rows, feat[nodes]]
                    go_left = np.where(
                        np.isnan(x), dleft[nodes], x < cond[nodes]
                    )
                    nodes = np.where(
                        active, np.where(go_left, li, right[nodes]), nodes
                    )
                acc += cond[nodes].astype(np.float64)
            margin += acc
        return pd.Series(margin)

    z = booster_margin(F.array(*_feature_columns(model))) + F.lit(model["bias"])
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 4)
    return df.select(
        F.col("CustomerID"),
        p.alias("churn_probability"),
        (p >= 0.5).cast("int").alias("predicted_churn"),
    ).orderBy("CustomerID")


def churn_score_booster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk scoring through the reference's actual 400-tree booster
    (tree-parity path for reference app_test.py:296)."""
    from ..plans.churn import churn_customers

    return score_with_booster(churn_customers(spark, sf_dir))


def _booster_oracle_sql() -> str:
    from ..plans.churn import churn_cte

    model = load_reference_model()
    feats = ",\n    ".join(
        f"{sql} AS f{i}" for i, sql in enumerate(_feature_sql(model))
    )
    chunks = margin_chunk_sqls(model)
    partials = ",\n    ".join(
        f"{sql} AS m{i}" for i, sql in enumerate(chunks)
    )
    total = " + ".join(f"m{i}" for i in range(len(chunks)))
    return f"""
{churn_cte('"')},
feats AS (
  SELECT "CustomerID",
    {feats}
  FROM churn_customers
),
partials AS (
  SELECT "CustomerID",
    {partials}
  FROM feats
),
margins AS (
  SELECT "CustomerID", {total} AS margin FROM partials
)
SELECT "CustomerID",
  round(1.0 / (1.0 + exp(-(margin + {_dbl_lit(model['bias'])}))), 4)
    AS churn_probability,
  CAST(round(1.0 / (1.0 + exp(-(margin + {_dbl_lit(model['bias'])}))),
             4) >= 0.5 AS INT) AS predicted_churn
FROM margins
ORDER BY "CustomerID"
"""


QUERIES: dict = {}
ORACLE: dict[str, str] = {}
if booster_available():
    QUERIES["churn_score_booster"] = churn_score_booster
    ORACLE["churn_score_booster"] = _booster_oracle_sql()
