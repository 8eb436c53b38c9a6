"""File-source tests: CSV/JSON round-trips with explicit schemas, the
Excel import gate, literal single-row source, and the reference's
bulk-upload flow (CSV → preprocess → score) end-to-end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_group4_app_spark.ml.scoring import score_with_pandas_udf
from bigdata_group4_app_spark.plans.churn import churn_customers
from bigdata_group4_app_spark.sources.files import (
    CHURN_UPLOAD_SCHEMA,
    literal_row,
    read_csv,
    read_excel,
    read_json,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def churn_csv(spark, tmp_path_factory):
    """A bulk-upload CSV shaped exactly like the reference's (no Churn
    label, CustomerID present), derived from the sf0.001 churn table."""
    path = tmp_path_factory.mktemp("uploads") / "bulk.csv"
    pdf = (
        churn_customers(spark, SF_SMOKE)
        .select(*[f.name for f in CHURN_UPLOAD_SCHEMA.fields])
        .toPandas()
    )
    pdf.to_csv(path, index=False)
    return str(path), pdf


def test_csv_roundtrip_explicit_schema(spark, churn_csv):
    path, pdf = churn_csv
    df = read_csv(spark, path, schema=CHURN_UPLOAD_SCHEMA)
    assert df.schema == CHURN_UPLOAD_SCHEMA
    assert df.count() == len(pdf)
    got = {r["CustomerID"]: r["Age"] for r in df.collect()}
    want = dict(zip(pdf["CustomerID"], pdf["Age"]))
    assert got == want


def test_csv_infer_matches_reference_behavior(spark, churn_csv):
    path, pdf = churn_csv
    df = read_csv(spark, path, infer=True)
    assert df.count() == len(pdf)
    # inference lands on integer/double/string like pandas would
    kinds = dict(df.dtypes)
    assert kinds["Age"] in ("int", "bigint")
    assert kinds["Total Spend"] == "double"
    assert kinds["Gender"] == "string"


def test_bulk_upload_scores_end_to_end(spark, churn_csv):
    """S2 → M1-M6: the reference's bulk path (app_test.py:258-302)."""
    path, pdf = churn_csv
    uploaded = read_csv(spark, path, schema=CHURN_UPLOAD_SCHEMA)
    scored = score_with_pandas_udf(uploaded)
    rows = scored.collect()
    assert len(rows) == len(pdf)
    assert all(0.0 <= r["churn_probability"] <= 1.0 for r in rows)
    # parity with scoring the parquet-derived relation directly
    direct = {
        r["CustomerID"]: r["churn_probability"]
        for r in score_with_pandas_udf(
            churn_customers(spark, SF_SMOKE)
        ).collect()
    }
    for r in rows:
        assert r["churn_probability"] == direct[r["CustomerID"]]


def test_json_roundtrip(spark, tmp_path, churn_csv):
    _, pdf = churn_csv
    path = tmp_path / "bulk.jsonl"
    pdf.head(20).to_json(path, orient="records", lines=True)
    df = read_json(spark, str(path), schema=CHURN_UPLOAD_SCHEMA)
    assert df.count() == 20
    assert df.schema == CHURN_UPLOAD_SCHEMA


def _col_letter(i: int) -> str:
    s = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        s = chr(ord("A") + r) + s
    return s


def _write_xlsx_minimal(path, header, rows, shared_header=True):
    """Stdlib-only .xlsx writer for the reader tests: writes the full
    OOXML part set (content types, rels, workbook, sheet, shared
    strings). Header cells go through sharedStrings when
    ``shared_header`` (exercising the t="s" path); body strings are
    inlineStr; floats are numeric cells; bools are t="b"; None cells
    are OMITTED (sparse rows with explicit A1 refs)."""
    import zipfile

    shared = list(header) if shared_header else []

    def cell(r, c, v):
        ref = f"{_col_letter(c)}{r}"
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        if shared_header and r == 1:
            return f'<c r="{ref}" t="s"><v>{shared.index(v)}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t>{v}</t></is></c>'

    sheet_rows = []
    for ri, row in enumerate([list(header)] + [list(r) for r in rows], 1):
        cells = "".join(cell(ri, ci, v) for ci, v in enumerate(row))
        sheet_rows.append(f'<row r="{ri}">{cells}</row>')
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (
        f'<?xml version="1.0"?><worksheet xmlns="{ns}">'
        f"<sheetData>{''.join(sheet_rows)}</sheetData></worksheet>"
    )
    sst = (
        f'<?xml version="1.0"?><sst xmlns="{ns}" count="{len(shared)}" '
        f'uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{s}</t></si>" for s in shared)
        + "</sst>"
    )
    ct = (
        '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats'
        '.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxml'
        'formats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        "vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"
        '"/></Types>'
    )
    rels = (
        '<?xml version="1.0"?><Relationships xmlns="http://schemas.open'
        'xmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    wb = (
        f'<?xml version="1.0"?><workbook xmlns="{ns}"><sheets>'
        '<sheet name="Sheet1" sheetId="1"/></sheets></workbook>'
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("_rels/.rels", rels)
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/sharedStrings.xml", sst)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def test_excel_upload_roundtrip_stdlib_reader(spark, tmp_path, churn_csv):
    """S3 Excel ingest WITHOUT openpyxl (round 10): the stdlib OOXML
    fallback must read a churn-shaped .xlsx upload into the typed
    schema, matching the CSV path's values."""
    _, pdf = churn_csv
    path = tmp_path / "bulk.xlsx"
    head = pdf.head(5)
    _write_xlsx_minimal(
        path,
        list(head.columns),
        [
            [
                float(v) if isinstance(v, (int, float)) else str(v)
                for v in row
            ]
            for row in head.itertuples(index=False)
        ],
    )
    df = read_excel(spark, str(path), schema=CHURN_UPLOAD_SCHEMA)
    assert df.count() == 5
    assert df.schema == CHURN_UPLOAD_SCHEMA
    got = df.orderBy("CustomerID").collect()
    want = head.sort_values("CustomerID")
    assert [r["CustomerID"] for r in got] == list(want["CustomerID"])
    assert [r["Total Spend"] for r in got] == [
        pytest.approx(v) for v in want["Total Spend"]
    ]
    assert [r["Gender"] for r in got] == list(want["Gender"])


def test_excel_cell_type_matrix(spark, tmp_path):
    """Shared-string header, inline strings, numerics, booleans, and a
    SPARSE row (None cell omitted, later cells keep A1 refs)."""
    path = tmp_path / "cells.xlsx"
    _write_xlsx_minimal(
        path,
        ["name", "score", "active"],
        [
            ["ada", 1.5, True],
            ["bob", None, False],  # sparse: score cell omitted entirely
            ["eve", 3.0, True],
        ],
    )
    df = read_excel(spark, str(path))
    rows = {r["name"]: (r["score"], r["active"]) for r in df.collect()}
    assert rows == {
        "ada": (1.5, True),
        "bob": (None, False),
        "eve": (3.0, True),
    }
    types = dict(df.dtypes)
    assert types == {
        "name": "string",
        "score": "double",
        "active": "boolean",
    }


def test_excel_rejects_corrupt_and_legacy(spark, tmp_path):
    import zipfile

    bad = tmp_path / "bad.xlsx"
    bad.write_bytes(b"PK\x03\x04 not a real xlsx")
    with pytest.raises((ValueError, zipfile.BadZipFile)):
        read_excel(spark, str(bad))
    legacy = tmp_path / "old.xls"
    legacy.write_bytes(b"\xd0\xcf\x11\xe0 legacy cfb")
    with pytest.raises(NotImplementedError):
        read_excel(spark, str(legacy))


def test_literal_row_source(spark):
    form_data = {
        "Age": 30,
        "Gender": "Female",
        "Tenure": 12,
        "Usage Frequency": 10,
        "Support Calls": 2,
        "Payment Delay": 5,
        "Subscription Type": "Basic",
        "Contract Length": "Monthly",
        "Total Spend": 500.0,
        "Last Interaction": 7,
    }
    df = literal_row(spark, form_data)
    assert df.count() == 1
    scored = score_with_pandas_udf(
        df.withColumn("CustomerID", F.lit(1).cast("long"))
    )
    p = scored.first()["churn_probability"]
    assert 0.0 <= p <= 1.0


def test_mongo_source_is_gated(spark):
    from bigdata_group4_app_spark.sources.files import read_mongo

    with pytest.raises(NotImplementedError):
        read_mongo(
            spark, "mongodb://localhost:27017", "dataset-bigdata", "group4"
        )


def test_idless_upload_scores_with_ordinal_ids(spark, tmp_path, churn_csv):
    """Reference behavior for uploads without CustomerID: ordinal 1..N
    fallback, then the normal scoring path (app_test.py:299)."""
    from bigdata_group4_app_spark.ml.scoring import score_upload
    from bigdata_group4_app_spark.sources.files import CHURN_UPLOAD_SCHEMA
    from pyspark.sql import types as T

    _, pdf = churn_csv
    path = tmp_path / "no_ids.csv"
    pdf.drop(columns=["CustomerID"]).head(25).to_csv(path, index=False)
    schema = T.StructType(
        [f for f in CHURN_UPLOAD_SCHEMA.fields if f.name != "CustomerID"]
    )
    uploaded = read_csv(spark, str(path), schema=schema)
    scored = score_upload(uploaded).collect()
    assert sorted(r["CustomerID"] for r in scored) == list(range(1, 26))
    assert all(r["risk"].endswith("Risk") for r in scored)


def test_orc_roundtrip(spark, tmp_path):
    """ORC is the other columnar format Spark ships a native reader for;
    a written-then-read events slice must survive schema and values."""
    from bigdata_group4_app_spark.sources.registry import load_table

    from .conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = str(tmp_path / "events_orc")
    ev.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == ev.schema
    assert back.count() == ev.count()
    a = {tuple(r) for r in ev.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_bulk_upload_missing_feature_fails_loudly(spark, tmp_path):
    """The reference wraps bulk scoring in a schema try/except
    (app_test.py:294-305) and surfaces the error; the engine's analog is
    Catalyst analysis failing LOUDLY (unresolved column) when an upload
    lacks a required feature — not silent nulls."""
    import pytest
    from pyspark.sql.utils import AnalysisException

    from bigdata_group4_app_spark.ml.scoring import score_upload

    bad = spark.createDataFrame(
        [(1, 30, "Male")], ["CustomerID", "Age", "Gender"]
    )
    with pytest.raises(AnalysisException):
        score_upload(bad).collect()


def test_parquet_schema_evolution_merges_and_backfills_null(spark, tmp_path):
    """Schema evolution on the lake path: a writer adds a column, old
    files stay valid. mergeSchema must union the schemas and read the
    pre-evolution rows with NULL in the new column — no rewrite, no
    failure — and a reader pinned to the OLD schema must keep working
    against the widened directory (columnar projection ignores the new
    column)."""
    from pyspark.sql import functions as F

    from bigdata_group4_app_spark.sources.registry import SCHEMAS, load_table

    path = str(tmp_path / "docs_evolving")
    v1 = load_table(spark, SF_SMOKE, "documents").limit(20)
    v1.write.mode("overwrite").parquet(path)
    v2 = (
        load_table(spark, SF_SMOKE, "documents")
        .limit(10)
        .withColumn("quality_score", F.lit(0.5))
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    v2.write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert "quality_score" in merged.columns
    assert merged.count() == 30
    old_rows = merged.filter(F.col("doc_id") < 1_000_000)
    assert old_rows.filter(F.col("quality_score").isNull()).count() == 20

    pinned = spark.read.schema(SCHEMAS["documents"]).parquet(path)
    assert pinned.count() == 30
    assert "quality_score" not in pinned.columns


def test_python_datasource_full_scan_matches_replay(spark):
    """Spark 4 Python DataSource API: the declared partition plan must be
    honored and the produced relation must equal the deterministic
    driver-side replay."""
    from bigdata_group4_app_spark.sources.pydatasource import (
        expected_rows,
        make_synthetic_source,
    )

    spark.dataSource.register(make_synthetic_source())
    df = (
        spark.read.format("synthetic_events")
        .option("numPartitions", "3")
        .option("rowsPerPartition", "50")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3
    assert sorted(tuple(r) for r in df.collect()) == sorted(
        expected_rows(3, 50)
    )


def test_python_datasource_filter_pushdown(spark):
    """With filter pushdown enabled (the engine session default), the
    event_type equality must be consumed by the source (absent from the
    post-scan Filter) and results must still match the replay. With the
    conf off, Spark refuses to run a pushFilters-implementing reader at
    all (documented gate) — asserted too."""
    from bigdata_group4_app_spark.sources.pydatasource import (
        expected_rows,
        make_synthetic_source,
    )

    spark.dataSource.register(make_synthetic_source())
    want = sorted(expected_rows(4, 100, "click"))

    def run():
        df = (
            spark.read.format("synthetic_events")
            .option("numPartitions", "4")
            .option("rowsPerPartition", "100")
            .load()
            .filter(F.col("event_type") == "click")
        )
        return df, sorted(tuple(r) for r in df.collect())

    prev = spark.conf.get("spark.sql.python.filterPushdown.enabled", None)
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        df, got = run()
        assert got == want
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "= click" not in plan  # equality consumed by the source
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")
        with pytest.raises(Exception, match="PUSHDOWN_DISABLED"):
            run()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.python.filterPushdown.enabled")
        else:
            spark.conf.set(
                "spark.sql.python.filterPushdown.enabled", prev
            )


def test_events_ts_nanos_generation_reads_identically(spark, tmp_path):
    """The footer-sniffing events reader must make BOTH historical
    testdata encodings — TIMESTAMP(NANOS)-as-int64 and timestamp[us] —
    load to identical rows (the encoding drifted between driver rounds;
    this pins the ns branch, which current testdata no longer exercises)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdata_group4_app_spark.sources.registry import load_table

    from .conftest import SF_SMOKE

    base = load_table(spark, SF_SMOKE, "events").orderBy("event_id").limit(500)
    want = [
        (r["event_id"], r["ts"], r["user_id"], r["event_type"], r["value"])
        for r in base.collect()
    ]
    # rewrite as int64 nanoseconds (the TIMESTAMP(NANOS) physical form —
    # pandas hands arrow timestamp[ns], so the int64 cast IS nanos)
    pdf = base.toPandas()
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    idx = tbl.schema.get_field_index("ts")
    ns = tbl.column("ts").cast(pa.int64())
    tbl = tbl.set_column(idx, pa.field("ts", pa.int64()), ns)
    d = tmp_path / "nanos_events"
    d.mkdir()
    pq.write_table(tbl, d / "events.parquet")
    got_df = load_table(spark, str(d), "events")
    assert str(got_df.schema["ts"].dataType) == "TimestampType()"
    got = [
        (r["event_id"], r["ts"], r["user_id"], r["event_type"], r["value"])
        for r in got_df.orderBy("event_id").collect()
    ]
    assert got == want


def test_read_csv_aligns_schema_by_name_not_position(spark, tmp_path):
    """A CustomerID-less upload (the reference's documented optional-ID
    case) must load each column into its NAMED field — Spark's native
    positional schema application would shift Age into CustomerID."""
    from bigdata_group4_app_spark.sources.files import (
        CHURN_UPLOAD_SCHEMA,
        read_csv,
    )

    p = tmp_path / "upload.csv"
    p.write_text(
        "Age,Gender,Tenure,Usage Frequency,Support Calls,Payment Delay,"
        "Subscription Type,Contract Length,Total Spend,Last Interaction\n"
        "42,Male,12,15,2,5,Standard,Annual,500.5,10\n"
    )
    df = read_csv(spark, str(p), schema=CHURN_UPLOAD_SCHEMA)
    assert "CustomerID" not in df.columns
    row = df.collect()[0]
    assert row["Age"] == 42 and row["Gender"] == "Male"
    assert row["Total Spend"] == 500.5 and row["Last Interaction"] == 10
    assert dict(df.dtypes)["Age"] == "int"


def test_read_csv_malformed_cell_yields_null_not_error(spark, tmp_path):
    """ANSI-mode regression (round-3 advisor): one malformed numeric cell
    must NULL out (PERMISSIVE-parse tolerance via try_cast), not throw
    CAST_INVALID_INPUT and fail the whole upload."""
    from bigdata_group4_app_spark.sources.files import (
        CHURN_UPLOAD_SCHEMA,
        read_csv,
    )

    p = tmp_path / "upload.csv"
    p.write_text(
        "CustomerID,Age,Total Spend\n"
        "1,42,500.5\n"
        "2,not-a-number,oops\n"
        "3,55,123.0\n"
    )
    rows = {
        r["CustomerID"]: r
        for r in read_csv(spark, str(p), schema=CHURN_UPLOAD_SCHEMA).collect()
    }
    assert rows[1]["Age"] == 42 and rows[1]["Total Spend"] == 500.5
    assert rows[2]["Age"] is None and rows[2]["Total Spend"] is None
    assert rows[3]["Age"] == 55


def test_orc_round_trip_preserves_values_and_prunes(spark, tmp_path):
    """ORC is a first-class lake format: write the events table, read it
    back identically, and confirm predicate pushdown reaches the ORC
    scan like it does for parquet."""
    from bigdata_group4_app_spark.sources.files import read_orc, write_orc
    from bigdata_group4_app_spark.sources.registry import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "events_orc")
    write_orc(ev, out)
    back = read_orc(spark, out)
    assert back.count() == ev.count()
    a = sorted(tuple(r) for r in ev.select("event_id", "value").collect())
    b = sorted(tuple(r) for r in back.select("event_id", "value").collect())
    assert a == b
    plan = (
        back.filter(back.user_id > 100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(user_id), GreaterThan(user_id,100)]" in plan


def test_avro_gate_is_actionable(spark):
    """Without spark-avro on the classpath the reader must fail with the
    actionable NotImplementedError, not a plan-time ClassNotFound."""
    from bigdata_group4_app_spark.sources.files import read_avro

    try:
        read_avro(spark, "/tmp/nonexistent.avro")
    except NotImplementedError as e:
        assert "spark-avro" in str(e)
    except Exception as e:  # pragma: no cover - environment has the jar
        raise AssertionError(f"wrong gate: {e!r}")
