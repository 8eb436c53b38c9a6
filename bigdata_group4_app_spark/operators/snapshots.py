"""Multi-table snapshot catalog — transactional visibility for a
many-table corpus store (VERDICT r10 item 8), plus the closed lineage
loop: snapshot diff over two REAL committed versions (item 4).

The catalog generalizes the streaming segment store's version/manifest
protocol (``streaming/sinks.py``) from one table to N:

- data lives in immutable SEGMENT files under
  ``{catalog}/segments/{table}/{name}`` — a segment is written once and
  never modified (copy-on-write: an update writes NEW segments and a
  new manifest that stops listing the old ones);
- a SNAPSHOT is one JSON manifest ``snap-{id}.json`` listing, for every
  table, exactly which segment paths are members — so a reader pinned
  to a manifest sees a CONSISTENT joint state across all tables no
  matter how many writers advance the catalog meanwhile (multi-table
  atomic visibility, the thing per-table _SUCCESS markers cannot give);
- the COMMIT is a put-if-absent of the manifest file (``os.link`` from
  a temp file — atomic on POSIX, fails if the id is taken): two racing
  writers can never both claim one snapshot id; the loser re-reads and
  retries the next id. This is exactly Delta/Iceberg's optimistic
  commit on ``_delta_log/N.json`` / ``vN.metadata.json``, minus the
  conflict-resolution layer (a loser here retries blindly; a lakehouse
  loser first checks its read-set still holds);
- compaction rewrites a table's segments into one and commits a new
  manifest; old segments are retired LOGICALLY (no manifest lists
  them) and physical deletion is vacuum/GC, never part of the commit —
  pinned readers of older snapshots keep working until vacuumed.

At 100 TB the manifest lists thousands of parquet files per table and
the reader's ``spark.read.parquet(*paths)`` is a partition-pruned
multi-file scan; the commit path is O(manifest), independent of data
size — the same shape as an Iceberg snapshot commit.

Reference provenance: the reference app has no multi-version story at
all (it re-reads its MongoDB collection on every Streamlit rerun,
``app_test.py:35-60``); this module is part of the beyond-reference
large-pipeline surface, same tier as the dedup/ANN families.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import duck_md5_int, md5_int_sql
from ..sources.registry import load_table
from .advanced import (
    SNAP_ADD_MOD,
    SNAP_ADD_RES,
    SNAP_CHG_MOD,
    SNAP_CHG_RES,
    SNAP_DEL_MOD,
    SNAP_DEL_RES,
    _snap_hashed,
    _snapshot_bucket_diff,
)

# ---------------------------------------------------------------------------
# catalog primitives
# ---------------------------------------------------------------------------


def _snap_path(catalog_dir: str, sid: int) -> str:
    return os.path.join(catalog_dir, f"snap-{sid:06d}.json")


def committed_snapshot_ids(catalog_dir: str) -> list[int]:
    """All committed snapshot ids, ascending. A snapshot exists iff its
    manifest file does — the manifest IS the commit (no marker files:
    the put-if-absent link makes the manifest appear atomically)."""
    if not os.path.isdir(catalog_dir):
        return []
    out = []
    for f in os.listdir(catalog_dir):
        if f.startswith("snap-") and f.endswith(".json"):
            body = f[5:-5]
            if body.isdigit():
                out.append(int(body))
    return sorted(out)


def read_manifest(catalog_dir: str, snapshot_id: int) -> dict:
    with open(_snap_path(catalog_dir, snapshot_id)) as f:
        return json.load(f)


def _try_put_manifest(
    catalog_dir: str,
    nxt: int,
    parent: int | None,
    tables: dict[str, list[str]],
    stats: dict | None,
    schemas: dict[str, str] | None = None,
    deletes: dict[str, list[dict]] | None = None,
    committed_at: int | None = None,
    branch: str | None = None,
) -> bool:
    """The single put-if-absent commit step both commit paths share:
    write the manifest to a writer-private temp file, ``os.link`` it to
    its final name (atomic; fails if the id is taken), clean up the
    temp. True = this writer owns snapshot ``nxt``.

    The temp name carries a uuid4, not just the pid (review r12): two
    SAME-process writers racing one id (ingest + compaction threads on
    one driver) must each link their own private bytes — a shared
    pid-keyed temp file lets the link winner publish the loser's
    manifest content as its own."""
    import uuid

    final = _snap_path(catalog_dir, nxt)
    tmp = os.path.join(
        catalog_dir, f".snap-{nxt}.{uuid.uuid4().hex}.tmp"
    )
    body = {
        "id": nxt,
        "parent": parent,
        "tables": tables,
        "stats": stats or {},
        "schemas": schemas or {},
        # MOR delete files (round 13): {table: [{"path", "col", "n"}]}
        # — reader-side anti-join entries; compaction retires them
        "deletes": deletes or {},
    }
    # commit timestamp (round 13): INJECTED by the caller, never an
    # ambient clock read — deterministic fixture builds stamp fixed
    # epochs, production writers pass time.time(); absent (None) keeps
    # the manifest timestamp-free and AS-OF-timestamp-invisible
    if committed_at is not None:
        body["committed_at"] = committed_at
    # branch-committed snapshots (round 13) carry their branch name so
    # the IMPLICIT main (a catalog with no explicit main ref yet)
    # resolves past them: staging on a branch must never move main
    if branch is not None:
        body["branch"] = branch
    with open(tmp, "w") as f:
        json.dump(body, f)
    try:
        os.link(tmp, final)
        os.unlink(tmp)
        return True
    except FileExistsError:
        os.unlink(tmp)
        return False


def commit_snapshot(
    catalog_dir: str,
    tables: dict[str, list[str]],
    parent: int | None = None,
    expected_id: int | None = None,
    stats: dict | None = None,
    schemas: dict[str, str] | None = None,
    deletes: dict[str, list[dict]] | None = None,
    committed_at: int | None = None,
) -> int:
    """Atomically commit a snapshot manifest; returns its id.

    Put-if-absent: the manifest is written to a writer-private temp
    file, then ``os.link``-ed to its final name — atomic, and it FAILS
    if the id is already taken, so two racing writers always get
    distinct snapshots (the loser retries the next id against the
    advanced catalog). ``expected_id`` is for idempotent fixture-style
    builders whose content is a pure function of their inputs: if that
    exact id is already committed (a concurrent builder won), the
    existing commit is accepted as this writer's own.

    ``parent`` lineage (review r12): on the blind (auto-id) path the
    recorded parent is recomputed from the catalog head on EVERY
    attempt, so a commit that loses the id race records the snapshot
    it actually follows — never a stale pointer that skips the
    interleaved winner. Only ``expected_id`` builds keep the caller's
    parent verbatim (their id is pinned, so their predecessor is too).

    ``stats`` carries optional per-segment ZONE MAPS —
    ``{table: {segment_path: {"<col>_min": x, "<col>_max": y}}}`` —
    the Iceberg manifest-stats idea: measured column bounds written at
    commit time, so a reader can prune segments against a predicate
    from the MANIFEST alone, before any file is opened (see
    :func:`prune_segments_by_range`). Segments without stats are
    always kept (conservative)."""
    os.makedirs(catalog_dir, exist_ok=True)
    while True:
        ids = committed_snapshot_ids(catalog_dir)
        if expected_id is not None:
            nxt, par = expected_id, parent
        else:
            nxt = ids[-1] + 1 if ids else 0
            par = ids[-1] if ids else None  # actual predecessor
        if expected_id is not None and os.path.exists(
            _snap_path(catalog_dir, nxt)
        ):
            return nxt  # deterministic-content builder: already committed
        if _try_put_manifest(
            catalog_dir, nxt, par, tables, stats, schemas, deletes,
            committed_at,
        ):
            return nxt
        if expected_id is not None:
            return nxt  # the other builder committed the same content
        continue  # lost the race: retry against the advanced catalog


class CommitConflict(Exception):
    """Another writer advanced the catalog past the snapshot this
    writer's table lists were computed from."""


def commit_snapshot_if(
    catalog_dir: str,
    tables: dict[str, list[str]],
    expected_head: int | None,
    stats: dict | None = None,
    schemas: dict[str, str] | None = None,
    deletes: dict[str, list[dict]] | None = None,
    committed_at: int | None = None,
) -> int:
    """Conflict-CHECKED commit: succeed only if the catalog head is
    still ``expected_head`` (None = empty catalog) — the read-set
    validation plain :func:`commit_snapshot` deliberately omits. A
    writer that computed its new table lists from snapshot N must not
    blindly win the id race against a writer that already advanced to
    N+1 (lost update: the blind commit's lists silently drop the other
    writer's segments). Raises :class:`CommitConflict` for the caller
    to re-read the head, rebase its lists, and retry — Delta/Iceberg's
    optimistic transaction loop.

    The residual window (two conditional committers both passing the
    check, then racing the link) is closed by the id claim itself: the
    loser's link FAILS (its id is taken — a STRICT put-if-absent here,
    not the idempotent fixture-builder acceptance of
    :func:`commit_snapshot`) and the retry re-validates against the
    advanced head — so it surfaces as CommitConflict, never as a lost
    update."""
    os.makedirs(catalog_dir, exist_ok=True)
    while True:
        ids = committed_snapshot_ids(catalog_dir)
        head = ids[-1] if ids else None
        if head != expected_head:
            raise CommitConflict(
                f"catalog head is {head}, expected {expected_head}: "
                "re-read, rebase the table lists, retry"
            )
        nxt = (head + 1) if head is not None else 0
        if _try_put_manifest(
            catalog_dir, nxt, head, tables, stats, schemas, deletes,
            committed_at,
        ):
            return nxt
        continue  # id taken: the re-read above raises CommitConflict


def commit_snapshot_rebase(
    catalog_dir: str,
    appends: dict[str, list[str]] | None = None,
    replaces: dict[str, list[str]] | None = None,
    base_head: int | None = None,
    stats: dict | None = None,
    schemas: dict[str, str] | None = None,
    delete_appends: dict[str, list[dict]] | None = None,
    committed_at: int | None = None,
) -> int:
    """Conflict-checked commit WITH automatic rebase for commuting
    writers (VERDICT r12 item 1) — the Iceberg ``commit.retry`` /
    Delta logical-conflict-detection loop the plain
    :func:`commit_snapshot_if` deliberately omits.

    The delta is declared structurally so the loop can decide
    commutativity instead of the caller hand-rebasing:

    - ``appends``: table -> NEW segment rels to add to whatever list
      the live head carries. Appends commute with ANY interleaved
      commit — a concurrent compaction/delete rewrote only segments
      that existed before ours, a concurrent append added disjoint
      rels — so the rebase re-applies them onto the winner's lists
      verbatim (rels already present are skipped: replay idempotence).
    - ``replaces``: table -> the FULL replacement list (compaction /
      stats-rewrite shape). A replace was computed FROM ``base_head``'s
      list for that table; it commutes with the winner only if the
      winner left that table's list untouched — otherwise re-applying
      would silently drop the winner's change (lost update), so the
      loop raises :class:`CommitConflict` and the caller must recompute
      (e.g. :func:`compact_table` re-merges from the new head).

    ``stats``/``schemas`` are this writer's OWN additions, overlaid on
    the live head's at every attempt (head values carry forward; for a
    replaced table the head's per-segment stats are dropped — they
    describe segments the replace retires — and only the caller's
    entries remain). Returns the committed snapshot id; if the delta
    turns out to be a no-op against the live head (pure replay), the
    head id is returned without an empty commit.

    ``delete_appends`` (round 13) adds MOR delete-file entries
    (``{table: [{"path", "col", "n"}]}``) — append-shaped, so they
    commute like segment appends (entries already present by path are
    skipped). A ``replaces`` entry for a table RETIRES that table's
    delete files along with its old stats: the replacement was read
    through them (:func:`read_snapshot_table` applies deletes), so the
    rewritten segment already excludes the deleted keys."""
    appends = appends or {}
    replaces = replaces or {}
    base = (
        read_manifest(catalog_dir, base_head)
        if base_head is not None
        else {"tables": {}}
    )
    while True:
        ids = committed_snapshot_ids(catalog_dir)
        head_id = ids[-1] if ids else None
        head = (
            read_manifest(catalog_dir, head_id)
            if head_id is not None
            else {"tables": {}, "stats": {}, "schemas": {}}
        )
        if head_id != base_head:
            for t in replaces:
                if head["tables"].get(t, []) != base["tables"].get(t, []):
                    raise CommitConflict(
                        f"table {t!r} was rewritten between snapshot "
                        f"{base_head} and head {head_id}: the replace "
                        "does not commute — recompute from the new head"
                    )
        tables = {t: list(v) for t, v in head["tables"].items()}
        for t, rels in appends.items():
            cur = tables.setdefault(t, [])
            cur.extend(r for r in rels if r not in set(cur))
        for t, rels in replaces.items():
            tables[t] = list(rels)
        mstats = {
            t: dict(s)
            for t, s in head.get("stats", {}).items()
            if t not in replaces
        }
        for t, s in (stats or {}).items():
            mstats.setdefault(t, {}).update(s)
        mschemas = {**head.get("schemas", {}), **(schemas or {})}
        mdeletes = {
            t: list(es)
            for t, es in head.get("deletes", {}).items()
            if t not in replaces
        }
        for t, entries in (delete_appends or {}).items():
            cur = mdeletes.setdefault(t, [])
            have = {e["path"] for e in cur}
            cur.extend(e for e in entries if e["path"] not in have)
        if (
            tables == head["tables"]
            and mstats == head.get("stats", {})
            and mschemas == head.get("schemas", {})
            and mdeletes == head.get("deletes", {})
        ):
            return head_id  # pure replay: nothing to commit
        try:
            return commit_snapshot_if(
                catalog_dir,
                tables,
                expected_head=head_id,
                stats=mstats,
                schemas=mschemas,
                deletes=mdeletes,
                committed_at=committed_at,
            )
        except CommitConflict:
            continue  # head moved: re-read, re-validate, re-apply


def write_segment(
    df: DataFrame, catalog_dir: str, table: str, name: str
) -> str:
    """Write one immutable segment; returns its manifest-relative path.
    mode('overwrite') keeps deterministic fixture builds idempotent —
    production writers use unique names, so overwrite never fires."""
    rel = os.path.join("segments", table, name)
    df.write.mode("overwrite").parquet(os.path.join(catalog_dir, rel))
    return rel


def read_snapshot_table(
    spark: SparkSession,
    catalog_dir: str,
    table: str,
    snapshot_id: int | None = None,
    schema: str | None = None,
) -> DataFrame:
    """A table AS OF a snapshot (latest committed when id is None):
    the union of exactly the segment files that snapshot's manifest
    lists. Pinning an id is time travel; two tables read under the
    SAME id are mutually consistent by construction.

    SCHEMA EVOLUTION (round 12): when the manifest carries a schema for
    the table (``schemas[table]``, a Spark DDL string committed by the
    writer that evolved it), the read is projected THROUGH that schema —
    ``spark.read.schema(ddl)`` fills columns absent from older parquet
    segments with typed NULLs (add-column with NULL backfill), with
    ZERO extra footer I/O (no mergeSchema scan over every file: the
    manifest schema is authoritative, the Iceberg read-projection
    shape). Supported evolution: add-column; type changes need a
    rewrite. A manifest listing an EMPTY segment list (legitimate after
    a COW delete of every row) returns an empty frame of the committed
    schema rather than an opaque zero-path error (review r12); without
    a committed schema that case raises a descriptive error.

    MERGE-ON-READ deletes (round 13): when the manifest lists delete
    files for the table, the scan is ANTI-JOINED against their keys —
    an equality-delete read, Iceberg-v2 shape. Delete files are tiny
    (O(deleted keys)), so Catalyst broadcasts them onto the scan and
    the read stays a single pass; rows with a NULL key column survive
    (an anti-join can only remove what it can prove equal). Compaction
    folds deletes into a rewritten segment and retires the files."""
    if snapshot_id is None:
        ids = committed_snapshot_ids(catalog_dir)
        if not ids:
            raise FileNotFoundError(f"no committed snapshots in {catalog_dir}")
        snapshot_id = ids[-1]
    m = read_manifest(catalog_dir, snapshot_id)
    if table not in m["tables"]:
        raise KeyError(
            f"table {table!r} not in snapshot {snapshot_id} of "
            f"{catalog_dir} (has: {sorted(m['tables'])})"
        )
    # precedence: the manifest's COMMITTED schema (authoritative — it is
    # what schema evolution wrote) over the caller's `schema` hint (an
    # r13 optimization: a reader that already knows the segment DDL
    # skips the inference footer read entirely — measured ~0.15 s per
    # 64-segment read at sf0.1) over plain inference.
    #
    # HINT CONTRACT (ADVICE r13): the hint is trusted, not validated —
    # it must be the DDL the writer of these segments used (the fixture
    # readers pass the registry's _*_SCHEMA_V1 constants, pinned by the
    # round-12/13 suites). A stale hint on a legacy/evolved snapshot
    # would silently project wrong columns, so hint-passing callers must
    # either own the write path or read snapshots whose manifests commit
    # a schema (which then wins). Debug runs can opt into a one-footer
    # cross-check: SPARK_GRAFT_VALIDATE_SCHEMA_HINTS=1.
    ddl = m.get("schemas", {}).get(table) or schema
    if (
        schema is not None
        and ddl is schema
        and m["tables"][table]
        and os.environ.get("SPARK_GRAFT_VALIDATE_SCHEMA_HINTS") == "1"
    ):
        probe = spark.read.parquet(
            os.path.join(catalog_dir, m["tables"][table][0])
        )
        hinted = {f.name for f in spark.createDataFrame([], schema).schema}
        missing = set(probe.columns) - hinted
        assert not missing, (
            f"schema hint for {table!r} drops columns {sorted(missing)} "
            f"present in segment {m['tables'][table][0]!r}"
        )
    paths = [os.path.join(catalog_dir, p) for p in m["tables"][table]]
    if not paths:
        if ddl is not None:
            return spark.createDataFrame([], ddl)
        raise ValueError(
            f"table {table!r} in snapshot {snapshot_id} of {catalog_dir} "
            "has zero segments and no committed schema: commit the "
            "schema (commit_snapshot(..., schemas=...)) to make empty "
            "reads well-typed"
        )
    reader = spark.read.schema(ddl) if ddl is not None else spark.read
    out = reader.parquet(*paths)
    entries = m.get("deletes", {}).get(table, [])
    # POSITION deletes (round 13, Iceberg-v2's second delete flavor):
    # entries with kind="position" hold (file_name, row_index) rows.
    # The scan's _metadata column provides both per data row — it must
    # be materialized DIRECTLY on the file scan (joins drop it), so do
    # it first, run every anti-join, then project the helpers away.
    pos_entries = [e for e in entries if e.get("kind") == "position"]
    if pos_entries:
        data_cols = out.columns
        out = out.select(
            "*",
            F.element_at(
                F.split(F.col("_metadata.file_path"), "/"), -1
            ).alias("__del_file"),
            F.col("_metadata.row_index").alias("__del_pos"),
        )
    for e in entries:
        if e.get("kind") == "position":
            pos = spark.read.parquet(
                os.path.join(catalog_dir, e["path"])
            ).select(
                F.col("file_name").alias("__pf"),
                F.col("row_index").alias("__pi"),
            )
            out = out.join(
                F.broadcast(pos),
                (F.col("__del_file") == F.col("__pf"))
                & (F.col("__del_pos") == F.col("__pi")),
                "left_anti",
            )
        else:
            keys = spark.read.parquet(
                os.path.join(catalog_dir, e["path"])
            ).select(F.col(e["col"]).alias("__del_key"))
            out = out.join(
                F.broadcast(keys),
                out[e["col"]] == keys["__del_key"],
                "left_anti",
            )
    if pos_entries:
        out = out.select(*data_cols)
    return out


def prune_segments_by_range(
    catalog_dir: str,
    snapshot_id: int,
    table: str,
    col: str,
    lo: int,
    hi: int,
) -> list[str]:
    """Manifest-level zone-map pruning: the segment paths of ``table``
    AS OF ``snapshot_id`` whose committed ``[col_min, col_max]`` bounds
    OVERLAP ``[lo, hi]`` — decided from the manifest alone, zero file
    I/O. A segment without stats for ``col`` is kept (conservative:
    zone maps may only skip what they can PROVE disjoint). The residual
    predicate must still be applied in-scan; pruning only shrinks the
    file list."""
    m = read_manifest(catalog_dir, snapshot_id)
    seg_stats = m.get("stats", {}).get(table, {})
    keep = []
    for p in m["tables"][table]:
        st = seg_stats.get(p)
        if st is None or f"{col}_min" not in st or f"{col}_max" not in st:
            keep.append(p)
        elif st[f"{col}_max"] >= lo and st[f"{col}_min"] <= hi:
            keep.append(p)
    return keep


def compact_table(
    spark: SparkSession,
    catalog_dir: str,
    table: str,
    name: str,
    max_remerge: int = 20,
) -> int:
    """Rewrite a table's current segment list into ONE segment and
    commit a new snapshot where that table points at the compacted
    segment while every other table's list carries over unchanged.
    Old segments are retired logically (the new manifest stops listing
    them); pinned readers of prior snapshots still see them until a
    separate vacuum deletes unreferenced files.

    Commits through :func:`commit_snapshot_rebase` (round 13): an
    interleaved commit that leaves THIS table's list untouched (another
    table's writer, a stats-only commit) is rebased over automatically;
    an interleaved commit that changed this table's list (a concurrent
    ingest appended a segment the merge didn't include) makes the
    replace non-commuting — the loop then RE-MERGES from the new head
    and retries, so routine ingest-plus-compaction concurrency never
    surfaces a manual-retry error and never loses a segment. After
    ``max_remerge`` lost races it raises (a maintenance job perpetually
    starved by ingest should back off, not spin). Zone-map stats for
    the OTHER tables carry over verbatim; the compacted table's old
    per-segment stats are dropped (they describe retired segments —
    recompute and pass through a future stats-aware rewrite if the
    merged segment needs bounds). MOR delete files for this table are
    FOLDED IN (round 13): the merge reads through
    :func:`read_snapshot_table`, which applies them, and the rebase's
    replace rule retires the table's delete entries from the new
    manifest — compaction is what keeps the reader's anti-join stack
    from growing without bound."""
    last: CommitConflict | None = None
    for _ in range(max_remerge):
        ids = committed_snapshot_ids(catalog_dir)
        head = read_manifest(catalog_dir, ids[-1])
        merged = read_snapshot_table(spark, catalog_dir, table, head["id"])
        rel = write_segment(merged, catalog_dir, table, name)
        try:
            return commit_snapshot_rebase(
                catalog_dir,
                replaces={table: [rel]},
                base_head=head["id"],
                # schemas carry over (inside the rebase) — the
                # compaction read projects through the head schema, so
                # the merged segment MATERIALIZES any evolved columns
                # (NULL-backfilled) and stays schema-true
            )
        except CommitConflict as e:
            last = e  # this table's list moved: re-merge from new head
    raise CommitConflict(
        f"compaction of {table!r} lost {max_remerge} consecutive "
        f"commit races: {last}"
    )


def _segment_bytes(catalog_dir: str, rel: str) -> int:
    """On-disk bytes of a segment (dir or file) — the size signal the
    bin-pack selector uses, read from the filesystem like Iceberg reads
    file sizes from its manifests: no Spark job, no footer parse."""
    full = os.path.join(catalog_dir, rel)
    if os.path.isfile(full):
        return os.path.getsize(full)
    total = 0
    for dirpath, _dirs, files in os.walk(full):
        for fn in files:
            total += os.path.getsize(os.path.join(dirpath, fn))
    return total


def compact_table_binpack(
    spark: SparkSession,
    catalog_dir: str,
    table: str,
    name: str,
    small_bytes: int,
    max_remerge: int = 20,
) -> int | None:
    """PARTIAL compaction — Iceberg's ``rewrite_data_files`` binpack
    strategy: merge only the segments smaller than ``small_bytes``
    into one, leaving well-sized segments untouched. At 100 TB the
    full-table rewrite of :func:`compact_table` is a last resort (it
    moves the whole table to retire one small file); streaming ingest
    instead accretes many small segments that THIS folds up at
    O(small-file bytes) cost. Returns the new snapshot id, or None
    when fewer than two small segments exist (nothing to pack — an
    empty rewrite would churn the manifest for no I/O win).

    MOR delete files are applied to the REWRITTEN rows but kept in the
    manifest: they may still reference rows in the untouched segments
    (the Iceberg rule — a delete file drops only when every data file
    it could cover was rewritten; here that is
    :func:`compact_table`'s job). Keys that pointed into rewritten
    segments become no-op anti-join entries until then. Commits
    through the same re-merge rebase loop as the full compaction."""
    last: CommitConflict | None = None
    for _ in range(max_remerge):
        ids = committed_snapshot_ids(catalog_dir)
        head = read_manifest(catalog_dir, ids[-1])
        segs = head["tables"][table]
        small = [
            r for r in segs if _segment_bytes(catalog_dir, r) < small_bytes
        ]
        if len(small) < 2:
            return None
        keep = [r for r in segs if r not in set(small)]
        ddl = head.get("schemas", {}).get(table)
        reader = spark.read.schema(ddl) if ddl is not None else spark.read
        merged = reader.parquet(
            *[os.path.join(catalog_dir, r) for r in small]
        )
        for e in head.get("deletes", {}).get(table, []):
            keys = spark.read.parquet(
                os.path.join(catalog_dir, e["path"])
            ).select(F.col(e["col"]).alias("__del_key"))
            merged = merged.join(
                F.broadcast(keys),
                merged[e["col"]] == keys["__del_key"],
                "left_anti",
            )
        rel = write_segment(merged, catalog_dir, table, name)
        head_stats = head.get("stats", {}).get(table, {})
        try:
            return commit_snapshot_rebase(
                catalog_dir,
                replaces={table: keep + [rel]},
                base_head=head["id"],
                # the rebase's replace retires the table's stats and
                # deletes wholesale; re-supply the UNTOUCHED segments'
                # stats (their zone maps / blooms are still true) and
                # every delete entry (untouched segments may still hold
                # rows the files delete)
                stats={
                    table: {
                        r: head_stats[r] for r in keep if r in head_stats
                    }
                },
                delete_appends={
                    table: list(head.get("deletes", {}).get(table, []))
                },
            )
        except CommitConflict as e:
            last = e  # the table's list moved: re-select from new head
    raise CommitConflict(
        f"binpack of {table!r} lost {max_remerge} consecutive "
        f"commit races: {last}"
    )


def cow_delete_range(
    spark: SparkSession,
    catalog_dir: str,
    table: str,
    col: str,
    lo: int,
    hi: int,
    seg_name: str,
    expected_head: int | None = None,
    committed_at: int | None = None,
) -> int:
    """Row-level COW DELETE of ``col BETWEEN lo AND hi`` — the
    takedown/GDPR path a 100 TB corpus needs: removing a key range
    without rewriting the corpus. Blast radius is zone-map bounded —
    :func:`prune_segments_by_range` picks the segments whose committed
    bounds OVERLAP the range (every other segment is kept BY REFERENCE,
    zero I/O); the survivors of the affected segments are rewritten
    into one new segment with freshly measured bounds, and the delete
    commits CONDITIONALLY on the head it read (a concurrent writer
    raises :class:`CommitConflict`, never a lost update). Rows with a
    NULL ``col`` always survive (a takedown predicate can only remove
    what it can prove in range). If the affected segments have no
    survivors the table simply lists fewer segments — readers handle
    an empty list through the committed schema. Pinned readers of
    pre-delete snapshots still see the removed rows until those
    snapshots expire — deletion-as-metadata first, physical GC via
    vacuum, like every other catalog mutation. Returns the new
    snapshot id (or the unchanged head when no segment can contain the
    range).

    ``expected_head`` (ADVICE r12): pin the head the delete must be
    computed FROM — if the live head already moved past it when this
    writer starts, raise :class:`CommitConflict` up front instead of
    silently deleting from (and committing onto) the interloper's
    snapshot. Deterministic fixture builders use this to close the
    TOCTOU window between their exists-gate and the delete's own head
    read; None keeps the live-head behavior for interactive use."""
    ids = committed_snapshot_ids(catalog_dir)
    head = read_manifest(catalog_dir, ids[-1])
    if expected_head is not None and head["id"] != expected_head:
        raise CommitConflict(
            f"catalog head is {head['id']}, expected {expected_head}: "
            "a concurrent writer advanced the catalog before the delete"
        )
    affected = prune_segments_by_range(
        catalog_dir, head["id"], table, col, lo, hi
    )
    if not affected:
        return head["id"]  # provably nothing to delete
    tables = dict(head["tables"])
    stats = {t: dict(s) for t, s in head.get("stats", {}).items()}
    tstats = stats.get(table, {})
    for p in affected:
        tstats.pop(p, None)  # bounds of retired segments
    keep = [p for p in tables[table] if p not in set(affected)]
    surv = (
        spark.read.parquet(
            *[os.path.join(catalog_dir, p) for p in affected]
        )
        .filter(
            F.col(col).isNull() | ~F.col(col).between(lo, hi)
        )
        .persist()
    )
    agg = surv.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(col).alias("mn"),
        F.max(col).alias("mx"),
    ).collect()[0]
    new_rels: list[str] = []
    if agg["n"] > 0:
        rel = write_segment(surv, catalog_dir, table, seg_name)
        new_rels = [rel]
        if agg["mn"] is not None:
            # bounds only when a non-NULL key survives — an all-NULL
            # segment gets NO zone map (conservative always-scan), never
            # a {None, None} entry that would poison later prunes
            # (review r12)
            tstats[rel] = {
                f"{col}_min": agg["mn"],
                f"{col}_max": agg["mx"],
            }
    surv.unpersist()
    stats[table] = tstats
    tables[table] = keep + new_rels
    return commit_snapshot_if(
        catalog_dir,
        tables,
        expected_head=head["id"],
        stats=stats,
        schemas=head.get("schemas", {}),
        # NOTE: the COW rewrite scans the affected segments RAW (not
        # through read_snapshot_table), so any live MOR delete files
        # still apply to the rewritten rows — carry them forward
        deletes=head.get("deletes", {}),
        committed_at=committed_at,
    )


def mor_delete_keys(
    spark: SparkSession,
    catalog_dir: str,
    table: str,
    col: str,
    keys: DataFrame,
    seg_name: str,
    expected_head: int | None = None,
    committed_at: int | None = None,
) -> int:
    """MERGE-ON-READ row-level delete (VERDICT r12 item 3) — the
    Iceberg-v2 equality-delete complement of :func:`cow_delete_range`:
    instead of rewriting every overlapping segment, commit an
    O(deleted-keys) DELETE FILE and let readers anti-join it out
    (:func:`read_snapshot_table`). Right for frequent small takedowns
    (per-request GDPR deletes), where COW's rewrite-1/Nth-of-the-table
    cost per delete dominates; wrong as a steady state — each live
    delete file adds an anti-join to every read, so compaction
    (:func:`compact_table`) periodically folds them into a rewritten
    segment and retires them (the rebase's replace rule).

    ``keys`` is a DataFrame whose ``col`` column holds the keys to
    delete (extra columns are dropped; NULL keys are dropped — a NULL
    can never equality-match a row). Duplicate keys are dedup'd so the
    committed ``n`` is the true key count. Semantics are
    equality-delete-GLOBAL: the file applies to the table state AS READ
    — including rows a concurrent append commits later under the same
    key (sequence-number scoping is the documented production
    refinement, not needed while ingest keys are unique-by-anti-join).
    The commit is append-shaped, so it REBASES over any interleaved
    commit; ``expected_head`` optionally pins the head for
    deterministic fixture builds (the :func:`cow_delete_range` rule).
    Returns the new snapshot id (head unchanged if ``keys`` is empty)."""
    ids = committed_snapshot_ids(catalog_dir)
    head_id = ids[-1] if ids else None
    if expected_head is not None and head_id != expected_head:
        raise CommitConflict(
            f"catalog head is {head_id}, expected {expected_head}: "
            "a concurrent writer advanced the catalog before the delete"
        )
    kdf = (
        keys.select(col).filter(F.col(col).isNotNull()).distinct()
    ).persist()
    n = kdf.count()
    if n == 0:
        kdf.unpersist()
        return head_id  # nothing to delete: no empty delete file
    rel = write_segment(kdf, catalog_dir, table, seg_name)
    kdf.unpersist()
    return commit_snapshot_rebase(
        catalog_dir,
        base_head=head_id,
        delete_appends={table: [{"path": rel, "col": col, "n": n}]},
        committed_at=committed_at,
    )


def mor_delete_positions(
    spark: SparkSession,
    catalog_dir: str,
    table: str,
    positions: DataFrame,
    seg_name: str,
    committed_at: int | None = None,
) -> int:
    """POSITION-scoped merge-on-read delete — Iceberg-v2's second
    delete flavor: ``positions`` holds (file_name, row_index) rows
    naming exact physical rows, and the reader anti-joins on the
    scan's ``_metadata`` (file name + row ordinal) instead of a key
    column. Use when the row has no usable equality key (duplicate
    keys, no key at all) or when the deleter already knows physical
    positions (a scan that flagged rows); unlike an equality delete it
    can never touch rows appended later — position scope IS sequence
    scope. O(deleted rows) commit, append-shaped (rebases over
    interleaved commits); compaction folds it like any delete file
    (rewritten rows drop their old positions, so the entries retire
    with the rewrite)."""
    pdf = (
        positions.select("file_name", "row_index")
        .filter(
            F.col("file_name").isNotNull()
            & F.col("row_index").isNotNull()
        )
        .distinct()
    ).persist()
    n = pdf.count()
    if n == 0:
        pdf.unpersist()
        ids = committed_snapshot_ids(catalog_dir)
        return ids[-1] if ids else None
    rel = write_segment(pdf, catalog_dir, table, seg_name)
    pdf.unpersist()
    ids = committed_snapshot_ids(catalog_dir)
    return commit_snapshot_rebase(
        catalog_dir,
        base_head=ids[-1] if ids else None,
        delete_appends={
            table: [{"path": rel, "kind": "position", "n": n}]
        },
        committed_at=committed_at,
    )


def rollback_snapshot(catalog_dir: str, to_id: int) -> int:
    """Roll the catalog HEAD back to an earlier snapshot by committing
    a NEW manifest with the old snapshot's table lists — never by
    deleting history (readers pinned to intermediate snapshots keep
    working; the bad snapshots stay inspectable until expired). This is
    Delta's RESTORE / Iceberg's rollback: O(manifest), no data moves —
    immutable segments make undo a metadata operation at any scale.
    The target's zone-map stats are restored with its table lists (a
    faithful restore, review r11). The restore commit's parent is the
    head it actually follows — recomputed inside the commit's retry
    loop (review r12), so a writer interleaving with the rollback can
    never make the lineage skip its snapshot."""
    m = read_manifest(catalog_dir, to_id)
    return commit_snapshot(
        catalog_dir,
        dict(m["tables"]),
        stats=m.get("stats", {}),
        schemas=m.get("schemas", {}),
        deletes=m.get("deletes", {}),
    )


# ---------------------------------------------------------------------------
# named refs: branches and tags (round 13 — Iceberg refs / WAP)
# ---------------------------------------------------------------------------
# A ref is a NAMED pointer into the shared snapshot pool:
# ``{catalog}/refs/{name}/{ver:06d}.json`` -> {"snapshot_id": N, "type":
# "branch"|"tag"}. The current value is the highest committed version;
# advancing a branch is a compare-and-swap built from the SAME
# put-if-absent link claim as manifest commits (the loser's link fails
# and it re-reads). Tags are immutable — version 0 is their only
# version forever. Snapshots stay in one global id sequence regardless
# of branch (exactly Iceberg's model: the snapshot log is a pool, refs
# point into it); a branch commit whose ref CAS loses leaves an
# unreferenced snapshot that expire_snapshots retires — never a torn
# ref. "main" without an explicit ref resolves to the linear head, so
# pre-ref catalogs keep their semantics unchanged.


class RefConflict(Exception):
    """The ref moved (or already exists) relative to what this writer
    read — re-read, re-validate, retry."""


def _ref_dir(catalog_dir: str, name: str) -> str:
    return os.path.join(catalog_dir, "refs", name)


def _ref_versions(catalog_dir: str, name: str) -> list[int]:
    rd = _ref_dir(catalog_dir, name)
    if not os.path.isdir(rd):
        return []
    out = []
    for f in os.listdir(rd):
        if f.endswith(".json") and f[:-5].isdigit():
            out.append(int(f[:-5]))
    return sorted(out)


def read_ref(catalog_dir: str, name: str) -> dict | None:
    """Current value of ref ``name`` ({"snapshot_id", "type"}), or the
    implicit main for "main" when no explicit ref exists, or None for
    an unknown ref / empty catalog. The implicit main is the highest
    snapshot NOT committed to a non-main branch (manifests stamp their
    branch, so staging never moves main even before the explicit ref
    is materialized); pre-ref catalogs keep their linear semantics
    unchanged because nothing stamps a branch there."""
    vers = _ref_versions(catalog_dir, name)
    if vers:
        with open(
            os.path.join(_ref_dir(catalog_dir, name), f"{vers[-1]:06d}.json")
        ) as f:
            return json.load(f)
    if name == "main":
        for sid in reversed(committed_snapshot_ids(catalog_dir)):
            br = read_manifest(catalog_dir, sid).get("branch")
            if br is None or br == "main":
                return {"snapshot_id": sid, "type": "branch"}
    return None


def resolve_ref(catalog_dir: str, name: str) -> int:
    r = read_ref(catalog_dir, name)
    if r is None:
        raise LookupError(f"no ref {name!r} in {catalog_dir}")
    return r["snapshot_id"]


def _put_ref_version(
    catalog_dir: str, name: str, ver: int, snapshot_id: int, rtype: str
) -> bool:
    """Put-if-absent a ref version file (uuid temp + os.link, the
    manifest claim protocol). True = this writer owns version ver."""
    import uuid

    rd = _ref_dir(catalog_dir, name)
    os.makedirs(rd, exist_ok=True)
    final = os.path.join(rd, f"{ver:06d}.json")
    tmp = os.path.join(rd, f".{ver}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        json.dump({"snapshot_id": snapshot_id, "type": rtype}, f)
    try:
        os.link(tmp, final)
        os.unlink(tmp)
        return True
    except FileExistsError:
        os.unlink(tmp)
        return False


def create_ref(
    catalog_dir: str, name: str, snapshot_id: int, rtype: str = "branch"
) -> None:
    """Create branch or tag ``name`` at an EXISTING snapshot. Raises
    RefConflict if the name is taken (idempotent acceptance only when
    the existing ref is identical — the deterministic-builder rule)."""
    assert rtype in ("branch", "tag")
    if not os.path.exists(_snap_path(catalog_dir, snapshot_id)):
        raise LookupError(f"snapshot {snapshot_id} is not committed")
    if _put_ref_version(catalog_dir, name, 0, snapshot_id, rtype):
        return
    cur = read_ref(catalog_dir, name)
    if cur == {"snapshot_id": snapshot_id, "type": rtype} and len(
        _ref_versions(catalog_dir, name)
    ) == 1:
        return  # concurrent builder created the identical ref
    raise RefConflict(f"ref {name!r} already exists: {cur}")


def _advance_ref(
    catalog_dir: str, name: str, expected_sid: int, new_sid: int
) -> None:
    """CAS the branch ref from expected_sid to new_sid. Tags refuse.
    The version-file claim makes the swap atomic: a loser's link fails,
    it re-reads, and either the winner moved the ref where this writer
    wanted it (idempotent accept) or RefConflict surfaces."""
    while True:
        vers = _ref_versions(catalog_dir, name)
        if not vers:
            raise LookupError(f"no ref {name!r} in {catalog_dir}")
        cur = read_ref(catalog_dir, name)
        if cur["type"] == "tag":
            raise RefConflict(f"ref {name!r} is a tag (immutable)")
        if cur["snapshot_id"] == new_sid:
            return  # already there (idempotent replay / lost-to-equal)
        if cur["snapshot_id"] != expected_sid:
            raise RefConflict(
                f"ref {name!r} is at {cur['snapshot_id']}, "
                f"expected {expected_sid}"
            )
        if _put_ref_version(
            catalog_dir, name, vers[-1] + 1, new_sid, "branch"
        ):
            return
        # lost the version claim: re-read and re-validate


def commit_to_branch(
    catalog_dir: str,
    branch: str,
    tables: dict[str, list[str]],
    stats: dict | None = None,
    schemas: dict[str, str] | None = None,
    deletes: dict[str, list[dict]] | None = None,
    committed_at: int | None = None,
    expected_sid: int | None = None,
) -> int:
    """Commit a snapshot whose PARENT is the branch's current snapshot
    and advance the branch ref to it — the staging half of
    write-audit-publish. The snapshot takes the next free id in the
    global pool (never disturbing other branches' lineage); the ref CAS
    then publishes it to this branch only. ``expected_sid`` pins the
    branch base for writers that computed their lists from a specific
    snapshot (RefConflict if the branch moved — re-read and rebase,
    the commit_snapshot_if contract at branch granularity)."""
    base = resolve_ref(catalog_dir, branch)
    if expected_sid is not None and base != expected_sid:
        raise RefConflict(
            f"branch {branch!r} is at {base}, expected {expected_sid}"
        )
    while True:
        ids = committed_snapshot_ids(catalog_dir)
        nxt = ids[-1] + 1 if ids else 0
        if _try_put_manifest(
            catalog_dir, nxt, base, tables, stats, schemas, deletes,
            committed_at, branch=branch,
        ):
            break
    _advance_ref(catalog_dir, branch, base, nxt)
    return nxt


def _is_ancestor(catalog_dir: str, anc: int, sid: int) -> bool:
    """True iff ``anc`` is on ``sid``'s parent chain (or equal) —
    manifest walks only, O(history)."""
    cur: int | None = sid
    seen: set[int] = set()
    while cur is not None and cur not in seen:
        if cur == anc:
            return True
        seen.add(cur)
        cur = read_manifest(catalog_dir, cur).get("parent")
    return False


def fast_forward(catalog_dir: str, target: str, source: str) -> int:
    """Publish: move branch ``target`` to branch ``source``'s snapshot,
    REQUIRING target's current snapshot to be an ancestor of source's
    (pure fast-forward — publish never rewrites or merges; a
    non-descendant source means the branches diverged and the staging
    writer must rebase first). This is the Iceberg
    ``fast_forward('main', 'audit')`` WAP publish step. An implicit
    "main" (no explicit ref yet) is materialized at its linear head
    first, so the CAS has a version chain to advance."""
    src = resolve_ref(catalog_dir, source)
    tgt_ref = read_ref(catalog_dir, target)
    if tgt_ref is None:
        raise LookupError(f"no ref {target!r} in {catalog_dir}")
    if tgt_ref["type"] == "tag":
        raise RefConflict(f"ref {target!r} is a tag (immutable)")
    tgt = tgt_ref["snapshot_id"]
    if not _is_ancestor(catalog_dir, tgt, src):
        raise RefConflict(
            f"{source!r}@{src} does not descend from {target!r}@{tgt}: "
            "not a fast-forward"
        )
    if not _ref_versions(catalog_dir, target):
        # implicit main: materialize the explicit ref at its current
        # value, accepting a concurrent materialization of the same
        try:
            create_ref(catalog_dir, target, tgt, "branch")
        except RefConflict:
            pass  # someone materialized it; CAS below validates
    _advance_ref(catalog_dir, target, tgt, src)
    return src


def ref_pinned_snapshots(catalog_dir: str) -> set[int]:
    """Snapshot ids any ref currently points at — never expirable. A
    ref dir with no committed version (a create_ref that died between
    mkdir and the link) pins nothing: like an orphaned manifest temp,
    it is invisible until its writer completes or retries."""
    refs_root = os.path.join(catalog_dir, "refs")
    if not os.path.isdir(refs_root):
        return set()
    out: set[int] = set()
    for name in os.listdir(refs_root):
        if os.path.isdir(os.path.join(refs_root, name)) and _ref_versions(
            catalog_dir, name
        ):
            out.add(resolve_ref(catalog_dir, name))
    return out


def snapshot_as_of(
    catalog_dir: str, ts: int, branch: str | None = None
) -> int:
    """Resolve an AS-OF-TIMESTAMP read (round 13): the LATEST committed
    snapshot whose ``committed_at`` is <= ``ts`` — Delta's
    ``timestampAsOf`` / Iceberg's ``snapshot_id_as_of_timestamp``
    resolution, done from the manifests alone. Manifests without a
    timestamp (written by a pre-timestamp writer, or a caller that
    passed None) are AS-OF-invisible: a time-travel read must never
    guess an untimed snapshot's position in history. Commit timestamps
    are assumed monotone per catalog — they come from single commit
    points stamping wall clocks, same trust model as the lakehouse
    formats. Raises ``LookupError`` when no timed snapshot is old
    enough (the catalog didn't exist yet at ``ts``).

    ``branch`` (round 13): scope the resolution to that ref's PARENT
    CHAIN — an unpublished snapshot staged on another branch must not
    be time-travel-visible on this one (Iceberg scopes AS-OF to the
    branch's lineage). Default None keeps the whole-pool legacy
    behavior for pre-ref catalogs."""
    if branch is not None:
        cand: list[int] = []
        cur: int | None = resolve_ref(catalog_dir, branch)
        seen: set[int] = set()
        while cur is not None and cur not in seen:
            cand.append(cur)
            seen.add(cur)
            cur = read_manifest(catalog_dir, cur).get("parent")
        ids = sorted(cand)
    else:
        ids = committed_snapshot_ids(catalog_dir)
    best: int | None = None
    for sid in ids:
        at = read_manifest(catalog_dir, sid).get("committed_at")
        if at is not None and at <= ts:
            best = sid
    if best is None:
        raise LookupError(
            f"no snapshot in {catalog_dir} committed at or before {ts}"
        )
    return best


def expire_snapshots(
    catalog_dir: str,
    keep_last: int = 1,
    older_than: int | None = None,
) -> list[int]:
    """Retire old snapshots by deleting their manifests (the Iceberg
    ``expireSnapshots`` half of GC). Pinned readers of an expired id
    fail fast on the missing manifest — expiry is the explicit
    retention decision, never a side effect of a commit. Returns the
    expired ids. Segment files are NOT touched here; run
    :func:`vacuum_catalog` afterwards to delete the ones no retained
    manifest references.

    ``older_than`` (round 13): AGE-based retention — expire only
    snapshots whose ``committed_at`` is strictly below the cutoff
    (untimed manifests never age out: no timestamp, no proof of age).
    Composes with ``keep_last`` as a floor: the newest ``keep_last``
    snapshots survive regardless of age, so the head is always
    readable — Iceberg's ``expire_snapshots(older_than, retain_last)``
    contract.

    Ref-pinned snapshots (round 13): an id any branch or tag currently
    points at never expires, whatever its age or position — dropping a
    ref target would tear the ref. Everything else unreferenced
    (including orphans from lost branch-publish races) ages out
    normally."""
    assert keep_last >= 1, "must retain at least the head snapshot"
    pinned = ref_pinned_snapshots(catalog_dir)
    ids = committed_snapshot_ids(catalog_dir)
    drop = [sid for sid in ids[:-keep_last] if sid not in pinned]
    if older_than is not None:
        drop = [
            sid
            for sid in drop
            if (
                at := read_manifest(catalog_dir, sid).get("committed_at")
            )
            is not None
            and at < older_than
        ]
    for sid in drop:
        os.unlink(_snap_path(catalog_dir, sid))
    return drop


def vacuum_catalog(catalog_dir: str) -> list[str]:
    """Delete segment directories referenced by NO committed manifest —
    pure physical GC, decoupled from every commit (the vacuum split:
    correctness never depends on deletion). Copy-on-write aware by
    construction: a segment shared by five snapshots survives until the
    LAST manifest naming it is expired. Caveat, same as any lakehouse
    VACUUM without a transaction log fence: must not run concurrently
    with a writer that has produced segments but not yet committed its
    manifest (those look unreferenced) — schedule vacuum in the single
    maintenance role, or add an age threshold. Returns the deleted
    manifest-relative paths."""
    import shutil

    referenced: set[str] = set()
    side_refs: set[str] = set()
    for sid in committed_snapshot_ids(catalog_dir):
        m = read_manifest(catalog_dir, sid)
        for paths in m["tables"].values():
            referenced.update(os.path.normpath(p) for p in paths)
        # MOR delete files are manifest members too: a retained
        # snapshot's reader needs them for its anti-join
        for entries in m.get("deletes", {}).values():
            referenced.update(
                os.path.normpath(e["path"]) for e in entries
            )
        # sidecar stat files (round 13): referenced by path from the
        # stats section; GC'd with the last manifest naming them
        for table_stats in m.get("stats", {}).values():
            for entry in table_stats.values():
                for k, v in (entry or {}).items():
                    if k.endswith("_bloom_ref"):
                        side_refs.add(os.path.normpath(v))

    def protected(rel: str) -> bool:
        # a manifest may reference rel itself OR a path UNDER it (the
        # partitioned-write layout lists leaf partition dirs) — either
        # protects the candidate from deletion
        return any(
            p == rel or p.startswith(rel + "/") for p in referenced
        )

    seg_root = os.path.join(catalog_dir, "segments")
    removed: list[str] = []
    if not os.path.isdir(seg_root):
        return removed
    for table in sorted(os.listdir(seg_root)):
        tdir = os.path.join(seg_root, table)
        for name in sorted(os.listdir(tdir)):
            rel = os.path.normpath(os.path.join("segments", table, name))
            if not protected(rel):
                shutil.rmtree(os.path.join(catalog_dir, rel))
                removed.append(rel)
    stats_root = os.path.join(catalog_dir, "stats-files")
    if os.path.isdir(stats_root):
        for dirpath, _dirs, files in os.walk(stats_root):
            for fn in files:
                full = os.path.join(dirpath, fn)
                rel = os.path.normpath(
                    os.path.relpath(full, catalog_dir)
                )
                if rel not in side_refs:
                    os.unlink(full)
                    removed.append(rel)
    return removed


# ---------------------------------------------------------------------------
# deterministic fixture catalog: two committed corpus versions at sf_dir
# ---------------------------------------------------------------------------

# Documents segment BY THE DIFF BUCKET (doc_id % 64 == SNAP_BUCKETS from
# operators.advanced): segment == bucket, so the snapshot-B writer can
# do TRUE copy-on-write — rewrite only the buckets containing drifted
# docs and reference snapshot A's partition dirs for every clean bucket
# — and the incremental diff can prune its SCAN to exactly the segment
# entries that differ between the two manifests.
_DOC_SEG_BUCKETS = 64
# embeddings: vec_id-RANGE segments of this width (zone-map-prunable)
_EMB_SEG_WIDTH = 128
SNAP_A_ID, SNAP_B_ID = 0, 1

# Snapshot C (round 12): SCHEMA EVOLUTION — adds a `tier` column to
# documents. Only the buckets snapshot B rewrote get re-written WITH
# the column (tier = doc_id % TIER_MOD); every clean bucket keeps
# referencing snapshot A's pre-evolution segments, so a snapshot-C read
# spans segments written under TWO schema versions and the manifest
# schema NULL-backfills the old ones — the Iceberg add-column shape.
SNAP_C_ID = 2
TIER_MOD = 5
DOC_SCHEMA_V2 = (
    "doc_id BIGINT, lang STRING, source STRING, text STRING, tier BIGINT"
)

# Snapshot D (round 12): COW row-level DELETE — the takedown path.
# Removes embeddings with vec_id in [TKDN_LO, TKDN_HI] from the
# range-clustered table: zone maps bound the blast radius to the one
# overlapping segment; every other segment is kept by reference.
SNAP_D_ID = 3
TKDN_LO, TKDN_HI = 8, 72

# Snapshot E (round 12): STATS-ONLY commit — per-segment BLOOM filters
# for documents.doc_id (the ANALYZE TABLE shape: same table lists as
# the head, richer stats). Zone maps cannot prune the mod-bucketed
# documents table (every segment spans the id domain); a bloom CAN
# prune point lookups on it. Bit positions are md5-derived
# (seed|key -> first-8-hex int % BLOOM_M), so Spark build, the Python
# prune helper, and the DuckDB oracle all compute IDENTICAL positions.
SNAP_E_ID = 4
BLOOM_M = 65536  # bits per segment bloom (8 KiB; ~5% fill at sf0.1)
BLOOM_K = 3  # hash functions (seeds 0..K-1)
# static probe keys for the registered lookup: five ids present in
# snapshot B (doc_id domain is 0..499 at the test SFs), two ids the
# B-drift DELETES (28, 51: doc%23==5), and one never-existing id —
# the negative paths exercise the bloom's skip decision. Constants,
# never data-derived, so query construction stays job-free and the
# oracle interpolates the same literals.
BLOOM_PROBE_KEYS = [7, 28, 51, 131, 263, 388, 457, 9999]

# Snapshot F (round 13): MERGE-ON-READ equality delete — the frequent-
# small-takedown path. Deletes B-alive docs with doc_id % 41 == 3 via an
# O(keys) delete FILE (no data segment rewritten); readers anti-join it
# out. Mod-rule keys keep the store content a pure function of the
# documents table, so the DuckDB oracle replays the delete.
SNAP_F_ID = 5
MOR_DEL_MOD, MOR_DEL_RES = 41, 3

# Snapshot G (round 13): SIDECAR bloom stat files — snapshot E's
# inline bitsets re-committed as per-segment stats-files/ references
# (the Iceberg puffin shape). Table lists and MOR deletes identical to
# F; the manifest sheds O(segments x BLOOM_M/8) bitset payload for
# O(segments) paths, and pruning opens sidecars lazily. Built from
# manifest E alone — zero Spark jobs.
SNAP_G_ID = 6

# Deterministic commit timestamps (round 13): FIXED epochs injected at
# build time (never an ambient clock — the build must be replayable),
# one hour apart so AS-OF probes can land between commits.
FIXTURE_TS_BASE = 1_700_000_000
FIXTURE_TS_STEP = 3600


def fixture_ts(sid: int) -> int:
    return FIXTURE_TS_BASE + sid * FIXTURE_TS_STEP


# the AS-OF probe instant of catalog_time_travel_read: halfway between
# the B and C commits, so the resolver must pick B (latest <= ts)
TT_AS_OF_TS = fixture_ts(SNAP_B_ID) + FIXTURE_TS_STEP // 2


def _bloom_pos_spark(col: str, seed: int) -> str:
    """Spark SQL expr: bloom bit position of ``col`` under ``seed``."""
    return (
        f"CAST(conv(substr(md5(concat('{seed}|', CAST({col} AS STRING))), "
        f"1, 8), 16, 10) AS BIGINT) % {BLOOM_M}"
    )


def _bloom_pos_py(key: int, seed: int) -> int:
    """Python twin of :func:`_bloom_pos_spark` (driver-side pruning)."""
    import hashlib

    h = hashlib.md5(f"{seed}|{key}".encode()).hexdigest()
    return int(h[:8], 16) % BLOOM_M


def duck_bloom_pos(col: str, seed: int) -> str:
    """DuckDB twin of :func:`_bloom_pos_spark`."""
    return (
        f"CAST(('0x' || substr(md5(concat('{seed}|', "
        f"CAST({col} AS VARCHAR))), 1, 8)) AS BIGINT) % {BLOOM_M}"
    )


def compute_segment_blooms(
    df: DataFrame, seg_col: str, key_col: str
) -> dict[int, str]:
    """Per-segment bloom bitsets (hex strings) from one scan: explode
    the K positions per row, distinct map-side, collect the per-segment
    position sets, pack driver-side. Runs only inside gated fixture /
    ANALYZE-style builds — the bitset payload is O(segments x
    BLOOM_M/8), never O(rows)."""
    pos_arr = ", ".join(
        _bloom_pos_spark(key_col, s) for s in range(BLOOM_K)
    )
    # collect_set dedups via map-side partial aggregation — an explicit
    # distinct() would pay a second shuffle for the same effect
    rows = (
        df.select(
            F.col(seg_col).alias("seg"),
            F.explode(F.expr(f"array({pos_arr})")).alias("p"),
        )
        .groupBy("seg")
        .agg(F.collect_set("p").alias("ps"))
        .collect()
    )
    out: dict[int, str] = {}
    for r in rows:
        bits = bytearray(BLOOM_M // 8)
        for p in r["ps"]:
            bits[p // 8] |= 1 << (p % 8)
        out[int(r["seg"])] = bytes(bits).hex()
    return out


def _bloom_maybe_contains(bits_hex: str, key: int) -> bool:
    bits = bytes.fromhex(bits_hex)
    for s in range(BLOOM_K):
        p = _bloom_pos_py(key, s)
        if not bits[p // 8] & (1 << (p % 8)):
            return False
    return True


def write_bloom_sidecar(
    catalog_dir: str, seg_rel: str, col: str, bits_hex: str
) -> str:
    """Write one segment's bloom as a SIDECAR stat file (round 13 —
    the Iceberg puffin shape) and return its manifest-relative path.
    The manifest then carries only the O(path) reference
    (``{col}_bloom_ref``), not the O(BLOOM_M/8) bitset: at 100 TB a
    manifest inlining thousands of 8 KiB bitsets is tens of MB read by
    EVERY planner, while sidecars are opened lazily per pruning
    decision. Content is deterministic, so concurrent identical
    builders may both write — ``os.replace`` keeps the file atomic
    either way."""
    import uuid

    rel = os.path.join("stats-files", f"{seg_rel}.{col}.bloom.json")
    path = os.path.join(catalog_dir, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"col": col, "m": BLOOM_M, "k": BLOOM_K, "bloom": bits_hex}, f
        )
    os.replace(tmp, path)
    return rel


def prune_segments_by_keys(
    catalog_dir: str,
    snapshot_id: int,
    table: str,
    col: str,
    keys: list[int],
) -> list[str]:
    """Manifest-level BLOOM pruning for point lookups: the segment
    paths of ``table`` AS OF ``snapshot_id`` whose committed bloom
    may contain AT LEAST ONE of ``keys`` — decided from the manifest
    alone, zero file I/O. Segments without a bloom for ``col`` are
    kept (conservative, the zone-map rule). False positives only cost
    an extra scanned segment; a bloom can never skip a segment that
    holds a key. The complement of zone maps: blooms prune EQUALITY
    probes on tables whose layout scatters the key across every
    segment (at 100 TB these live in sidecar stat files, Iceberg
    puffin-style, not inline — the inline form keeps the fixture
    manifest self-contained)."""
    m = read_manifest(catalog_dir, snapshot_id)
    seg_stats = m.get("stats", {}).get(table, {})
    keep = []
    for p in m["tables"][table]:
        entry = seg_stats.get(p) or {}
        bloom = entry.get(f"{col}_bloom")
        if bloom is None:
            # sidecar form (round 13): the manifest carries only a
            # path; open the stat file lazily — still zero DATA I/O
            ref = entry.get(f"{col}_bloom_ref")
            if ref is not None:
                with open(os.path.join(catalog_dir, ref)) as f:
                    bloom = json.load(f)["bloom"]
        if bloom is None or any(
            _bloom_maybe_contains(bloom, k) for k in keys
        ):
            keep.append(p)
    return keep


def _fixture_dir(sf_dir: str) -> str:
    # v4: v3 (bucket-aligned COW documents + range-clustered embeddings
    # with manifest zone maps) + commit timestamps on every manifest +
    # the MOR-delete snapshot F (round 13) — the layout version in the
    # path keeps a stale pre-layout catalog from being silently reused
    # by the idempotence check
    base = os.path.basename(os.path.normpath(sf_dir))
    return f"/tmp/spark_graft_snapcat_v4_{base}"


def _fixture_frames(spark: SparkSession, sf_dir: str):
    """The two corpus versions, derived from the documents table by the
    SAME deterministic drift rules ``corpus_snapshot_diff`` simulates
    (add 17/3, del 23/5, chg 11/2) — which is what lets the DuckDB
    oracle recompute the store's exact contents without reading it."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    snap_a = docs.filter(F.col("doc_id") % SNAP_ADD_MOD != SNAP_ADD_RES)
    snap_b = docs.filter(
        F.col("doc_id") % SNAP_DEL_MOD != SNAP_DEL_RES
    ).withColumn(
        "source",
        F.when(
            F.col("doc_id") % SNAP_CHG_MOD == SNAP_CHG_RES,
            F.concat(F.col("source"), F.lit("-v2")),
        ).otherwise(F.col("source")),
    )
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 2 == 0
    )
    return snap_a, snap_b, emb


def _dirty_buckets(spark: SparkSession, sf_dir: str) -> set[int]:
    """Buckets containing at least one drifted doc — exactly the
    buckets whose content differs between the two versions: added
    (in B only), removed (in A only), or changed (in both, mutated).
    One tiny aggregate; runs only inside the fixture build."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    in_a = F.col("doc_id") % SNAP_ADD_MOD != SNAP_ADD_RES
    in_b = F.col("doc_id") % SNAP_DEL_MOD != SNAP_DEL_RES
    chg = F.col("doc_id") % SNAP_CHG_MOD == SNAP_CHG_RES
    drift = (in_b & ~in_a) | (in_a & ~in_b) | (in_a & in_b & chg)
    rows = (
        docs.filter(drift)
        .select(
            F.pmod(F.col("doc_id"), F.lit(_DOC_SEG_BUCKETS)).alias("b")
        )
        .distinct()
        .collect()
    )
    return {r["b"] for r in rows}


def _partition_rels(catalog_dir: str, rel_dir: str) -> dict[int, str]:
    """bucket -> manifest-relative partition path for an on-disk
    ``partitionBy('seg')`` write (only buckets that had rows exist)."""
    out: dict[int, str] = {}
    base = os.path.join(catalog_dir, rel_dir)
    for name in os.listdir(base):
        if name.startswith("seg="):
            out[int(name[4:])] = f"{rel_dir}/{name}"
    return out


def ensure_fixture_catalog(spark: SparkSession, sf_dir: str) -> str:
    """Idempotently build the two-version fixture catalog for ``sf_dir``
    and return its path.

    Version A (snapshot 0): the pre-drift corpus written ONCE with
    ``partitionBy('seg')`` — 64 bucket-aligned partition dirs, each a
    manifest segment — plus the embeddings metadata table. Version B
    (snapshot 1): TRUE copy-on-write — the builder computes which
    buckets contain any drifted doc (one tiny aggregate), rewrites ONLY
    those partitions, and references snapshot A's partition dirs for
    every clean bucket; the untouched embeddings segment is likewise
    reused by reference. Write I/O is proportional to the blast
    radius, not the corpus — the Iceberg COW-update shape. (The
    mod-rule drift is deliberately locality-hostile: at sf0.01 ~80% of
    buckets are dirty, at toy sf0.001 most are clean — both regimes
    exercised by the tests.)

    This construction is the ONE eager site of the snapshot queries
    (fixture-store writes + the dirty-bucket aggregate, the
    ``binary_asset_profile`` precedent) and only runs while the catalog
    is absent; once both manifests exist, query construction is
    zero-job.

    Builder concurrency: the MANIFEST commits are race-safe
    (put-if-absent; a losing builder accepts the winner's identical
    deterministic commit), but two builders overwrite-writing the same
    segment directories simultaneously could interleave parquet parts —
    the fixture build assumes one builder process at a time (the pytest
    / driver reality). Production writers never share segment names, so
    the catalog protocol itself has no such window."""
    d = _fixture_dir(sf_dir)
    if os.path.exists(_snap_path(d, SNAP_A_ID)) and os.path.exists(
        _snap_path(d, SNAP_B_ID)
    ):
        # snapshots 0/1 present (possibly from an earlier session's
        # build): extend IN PLACE with the later snapshots if absent
        _ensure_schema_evolution_snapshot(spark, sf_dir, d)
        _ensure_takedown_snapshot(spark, d)
        _ensure_bloom_stats_snapshot(spark, sf_dir, d)
        _ensure_mor_delete_snapshot(spark, sf_dir, d)
        _ensure_bloom_sidecar_snapshot(d)
        return d
    snap_a, snap_b, emb = _fixture_frames(spark, sf_dir)
    seg = F.pmod(F.col("doc_id"), F.lit(_DOC_SEG_BUCKETS)).alias("seg")

    # embeddings: RANGE-clustered segments (vec_id div width) with
    # MEASURED per-segment (min, max) zone maps in the manifest — the
    # layout range predicates can prune; the mod-bucketed documents
    # table deliberately CANNOT be range-pruned (every segment spans
    # the id domain), which is exactly the clustered-vs-scattered
    # layout contrast layout.py's skipping audit measures
    emb_dir = "segments/embeddings/base"
    emb.select(
        "*", (F.col("vec_id") / _EMB_SEG_WIDTH).cast("long").alias("zseg")
    ).write.mode("overwrite").partitionBy("zseg").parquet(
        os.path.join(d, emb_dir)
    )
    emb_parts = {
        int(name[5:]): f"{emb_dir}/{name}"
        for name in os.listdir(os.path.join(d, emb_dir))
        if name.startswith("zseg=")
    }
    emb_rels = [emb_parts[z] for z in sorted(emb_parts)]
    emb_stats = {
        emb_parts[r["zseg"]]: {
            "vec_id_min": r["mn"],
            "vec_id_max": r["mx"],
        }
        for r in emb.select(
            (F.col("vec_id") / _EMB_SEG_WIDTH).cast("long").alias("zseg"),
            "vec_id",
        )
        .groupBy("zseg")
        .agg(F.min("vec_id").alias("mn"), F.max("vec_id").alias("mx"))
        .collect()
    }

    a_dir = "segments/documents/a"
    snap_a.select("*", seg).write.mode("overwrite").partitionBy(
        "seg"
    ).parquet(os.path.join(d, a_dir))
    a_parts = _partition_rels(d, a_dir)
    commit_snapshot(
        d,
        {
            "documents": [a_parts[b] for b in sorted(a_parts)],
            "embeddings": emb_rels,
        },
        parent=None,
        expected_id=SNAP_A_ID,
        stats={"embeddings": emb_stats},
        committed_at=fixture_ts(SNAP_A_ID),
    )

    dirty = _dirty_buckets(spark, sf_dir)
    b_dir = "segments/documents/b"
    snap_b.select("*", seg).filter(
        F.pmod(F.col("doc_id"), F.lit(_DOC_SEG_BUCKETS)).isin(
            [int(x) for x in dirty]
        )
    ).write.mode("overwrite").partitionBy("seg").parquet(
        os.path.join(d, b_dir)
    )
    b_parts = _partition_rels(d, b_dir)
    # copy-on-write manifest: rewritten partitions from the B write,
    # every clean bucket referenced from snapshot A's dirs, embeddings
    # (segments AND zone-map stats) reused by reference
    b_rels = {**{b: p for b, p in a_parts.items() if b not in dirty}, **b_parts}
    commit_snapshot(
        d,
        {
            "documents": [b_rels[b] for b in sorted(b_rels)],
            "embeddings": emb_rels,
        },
        parent=SNAP_A_ID,
        expected_id=SNAP_B_ID,
        stats={"embeddings": emb_stats},
        committed_at=fixture_ts(SNAP_B_ID),
    )
    _ensure_schema_evolution_snapshot(spark, sf_dir, d)
    _ensure_takedown_snapshot(spark, d)
    _ensure_bloom_stats_snapshot(spark, sf_dir, d)
    _ensure_mor_delete_snapshot(spark, sf_dir, d)
    _ensure_bloom_sidecar_snapshot(d)
    return d


def _ensure_schema_evolution_snapshot(
    spark: SparkSession, sf_dir: str, d: str
) -> None:
    """Idempotently commit snapshot C: the add-column evolution of the
    documents table. The rewrite set is exactly the buckets snapshot B
    rewrote — recovered from the MANIFEST set-difference (zero extra
    aggregates), which the incremental-diff query already hash-pins
    equal to the content-derived dirty set. Rewritten buckets carry
    ``tier = doc_id % TIER_MOD``; clean buckets keep referencing the
    pre-evolution segment files, so the snapshot-C read exercises the
    NULL-backfill path over mixed-schema segments. Same eager-build
    gate as the base fixture: runs only while snapshot C is absent."""
    if os.path.exists(_snap_path(d, SNAP_C_ID)):
        return
    ma = read_manifest(d, SNAP_A_ID)
    mb = read_manifest(d, SNAP_B_ID)
    a_paths = set(ma["tables"]["documents"])
    b_paths = mb["tables"]["documents"]
    dirty = sorted(
        int(p.rsplit("seg=", 1)[1]) for p in set(b_paths) - a_paths
    )
    c_dir = "segments/documents/c"
    c_parts: dict[int, str] = {}
    if dirty:
        _, snap_b, _ = _fixture_frames(spark, sf_dir)
        (
            snap_b.withColumn(
                "tier", F.col("doc_id") % F.lit(TIER_MOD)
            )
            .select(
                "doc_id",
                "lang",
                "source",
                "text",
                "tier",
                F.pmod(F.col("doc_id"), F.lit(_DOC_SEG_BUCKETS)).alias(
                    "seg"
                ),
            )
            .filter(F.col("seg").isin([int(x) for x in dirty]))
            .write.mode("overwrite")
            .partitionBy("seg")
            .parquet(os.path.join(d, c_dir))
        )
        c_parts = _partition_rels(d, c_dir)
    b_by_bucket = {int(p.rsplit("seg=", 1)[1]): p for p in b_paths}
    c_rels = {**b_by_bucket, **c_parts}
    commit_snapshot(
        d,
        {
            "documents": [c_rels[b] for b in sorted(c_rels)],
            "embeddings": list(mb["tables"]["embeddings"]),
        },
        parent=SNAP_B_ID,
        expected_id=SNAP_C_ID,
        stats=mb.get("stats", {}),
        schemas={"documents": DOC_SCHEMA_V2},
        committed_at=fixture_ts(SNAP_C_ID),
    )


def _ensure_takedown_snapshot(spark: SparkSession, d: str) -> None:
    """Idempotently commit snapshot D: the COW range delete of
    embeddings vec_id in [TKDN_LO, TKDN_HI] via the GENERIC
    :func:`cow_delete_range` (the query exercises the real maintenance
    op, not a fixture-only twin). Deterministic content; a losing
    concurrent builder accepts the winner's identical commit. Same
    eager-build gate as the rest of the fixture.

    TOCTOU closed (ADVICE r12): the delete is PINNED to head C via
    ``expected_head`` — a concurrent builder committing D between this
    writer's exists-gate and the delete's own head read now surfaces as
    :class:`CommitConflict` (accepted when the winner's D exists)
    instead of a spurious snapshot at the next free id that the bloom
    builder would mistake for E."""
    if os.path.exists(_snap_path(d, SNAP_D_ID)):
        return
    try:
        sid = cow_delete_range(
            spark,
            d,
            "embeddings",
            "vec_id",
            TKDN_LO,
            TKDN_HI,
            f"takedown-{TKDN_LO}-{TKDN_HI}",
            expected_head=SNAP_C_ID,
            committed_at=fixture_ts(SNAP_D_ID),
        )
        assert sid == SNAP_D_ID, f"takedown landed at {sid}, not {SNAP_D_ID}"
    except CommitConflict:
        if not os.path.exists(_snap_path(d, SNAP_D_ID)):
            raise  # conflict without the expected commit: real writer race


def _ensure_bloom_stats_snapshot(
    spark: SparkSession, sf_dir: str, d: str
) -> None:
    """Idempotently commit snapshot E: the STATS-ONLY commit (ANALYZE
    TABLE shape) — identical table lists to snapshot D, plus a
    per-segment doc_id BLOOM for every documents segment. Blooms are
    computed from the drift derivation (one scan + one distinct-
    positions aggregate), which equals segment content by the COW
    construction the incremental diff hash-pins; the same gated
    eager-build rule as the rest of the fixture."""
    if os.path.exists(_snap_path(d, SNAP_E_ID)):
        return
    head = read_manifest(d, SNAP_D_ID)
    by_bucket = {
        int(p.rsplit("seg=", 1)[1]): p
        for p in head["tables"]["documents"]
    }
    _, snap_b, _ = _fixture_frames(spark, sf_dir)
    blooms = compute_segment_blooms(
        snap_b.select(
            "doc_id",
            F.pmod(F.col("doc_id"), F.lit(_DOC_SEG_BUCKETS)).alias("seg"),
        ),
        "seg",
        "doc_id",
    )
    stats = {t: dict(s) for t, s in head.get("stats", {}).items()}
    dstats = stats.setdefault("documents", {})
    for b, hexbits in blooms.items():
        p = by_bucket[b]
        dstats[p] = {**dstats.get(p, {}), "doc_id_bloom": hexbits}
    commit_snapshot(
        d,
        {t: list(v) for t, v in head["tables"].items()},
        parent=SNAP_D_ID,
        expected_id=SNAP_E_ID,
        stats=stats,
        schemas=head.get("schemas", {}),
        committed_at=fixture_ts(SNAP_E_ID),
    )


def _ensure_mor_delete_snapshot(
    spark: SparkSession, sf_dir: str, d: str
) -> None:
    """Idempotently commit snapshot F: the MERGE-ON-READ equality
    delete of B-alive documents with ``doc_id % 41 == 3`` via the
    generic :func:`mor_delete_keys` — an O(keys) delete-file commit
    that leaves every data segment untouched (the registered query
    pins that from the manifests). Deterministic content (mod-rule
    keys over the drift derivation); a losing concurrent builder
    accepts the winner's identical commit, same gate as D."""
    if os.path.exists(_snap_path(d, SNAP_F_ID)):
        return
    _, snap_b, _ = _fixture_frames(spark, sf_dir)
    keys = snap_b.select("doc_id").filter(
        F.col("doc_id") % MOR_DEL_MOD == MOR_DEL_RES
    )
    try:
        sid = mor_delete_keys(
            spark,
            d,
            "documents",
            "doc_id",
            keys,
            f"mor-del-{MOR_DEL_MOD}-{MOR_DEL_RES}",
            expected_head=SNAP_E_ID,
            committed_at=fixture_ts(SNAP_F_ID),
        )
        assert sid == SNAP_F_ID, f"MOR delete landed at {sid}, not {SNAP_F_ID}"
    except CommitConflict:
        if not os.path.exists(_snap_path(d, SNAP_F_ID)):
            raise  # conflict without the expected commit: real writer race


def _ensure_bloom_sidecar_snapshot(d: str) -> None:
    """Idempotently commit snapshot G: snapshot E's inline blooms
    re-committed as SIDECAR stat files (round 13). Pure manifest +
    stat-file I/O — no Spark jobs at all: the bitsets already exist in
    manifest E, this commit only relocates them out of the manifest
    body. Table lists, schemas, and the MOR delete files all carry
    forward from F unchanged (a stats-only commit, the ANALYZE shape
    snapshot E also used)."""
    if os.path.exists(_snap_path(d, SNAP_G_ID)):
        return
    inline = read_manifest(d, SNAP_E_ID).get("stats", {}).get(
        "documents", {}
    )
    head = read_manifest(d, SNAP_F_ID)
    stats = {t: dict(s) for t, s in head.get("stats", {}).items()}
    dstats = {
        p: dict(e or {}) for p, e in stats.get("documents", {}).items()
    }
    for p, entry in inline.items():
        bits = (entry or {}).get("doc_id_bloom")
        if bits is None:
            continue
        ref = write_bloom_sidecar(d, p, "doc_id", bits)
        e = dstats.setdefault(p, {})
        e.pop("doc_id_bloom", None)
        e["doc_id_bloom_ref"] = ref
    stats["documents"] = dstats
    commit_snapshot(
        d,
        {t: list(v) for t, v in head["tables"].items()},
        parent=SNAP_F_ID,
        expected_id=SNAP_G_ID,
        stats=stats,
        schemas=head.get("schemas", {}),
        deletes=head.get("deletes", {}),
        committed_at=fixture_ts(SNAP_G_ID),
    )


# ---------------------------------------------------------------------------
# WAP fixture catalog (round 13): write-audit-publish on branch refs
# ---------------------------------------------------------------------------
# Separate store from the 6-snapshot fixture (its readers pin ids into
# THAT history; WAP mutates the main ref, so it gets its own catalog).
# Content is a pure function of the documents table: main snapshot 0 is
# the B-drift derivation, the staged batch re-ingests exactly the rows
# the drift deleted (doc_id % 23 == 5) with a '+wap' source tag —
# deterministic, so the DuckDB oracle replays base, staged, AND the
# published union.
WAP_MAIN_ID, WAP_STAGED_ID = 0, 1
WAP_BRANCH = "audit"
WAP_SRC_TAG = "+wap"


def _wap_dir(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return f"/tmp/spark_graft_wapcat_v1_{base}"


def ensure_wap_catalog(spark: SparkSession, sf_dir: str) -> str:
    """Idempotently run one full write-audit-publish cycle and return
    the catalog path. Flow: commit main snapshot 0 -> create the
    ``audit`` branch -> stage the ingest batch as a branch commit
    (main's readers cannot see it) -> AUDIT the staged snapshot (the
    gate: no staged doc_id may already exist in the branch base — the
    dup-ingest check a training pipeline runs before data goes live)
    -> ``fast_forward('main', 'audit')`` publishes atomically. Like
    every fixture build, eager work (writes + the audit aggregate)
    happens only while the catalog is absent; afterwards query
    construction is zero-job. Row counts are recorded as per-segment
    manifest stats at commit time so the registered query quotes them
    without a scan."""
    d = _wap_dir(sf_dir)
    if _ref_versions(d, "main") and _ref_versions(d, WAP_BRANCH):
        _ensure_release_tag(d)  # pre-tag catalogs gain it in place
        return d
    _, snap_b, _ = _fixture_frames(spark, sf_dir)
    base_dir = "segments/documents/base"
    if not os.path.exists(_snap_path(d, WAP_MAIN_ID)):
        snap_b.write.mode("overwrite").parquet(os.path.join(d, base_dir))
        n_base = spark.read.parquet(os.path.join(d, base_dir)).count()
        commit_snapshot(
            d,
            {"documents": [base_dir]},
            parent=None,
            expected_id=WAP_MAIN_ID,
            stats={"documents": {base_dir: {"rows": n_base}}},
            committed_at=fixture_ts(WAP_MAIN_ID),
        )
    try:
        create_ref(d, WAP_BRANCH, WAP_MAIN_ID, "branch")
    except RefConflict:
        pass  # branch exists (possibly already advanced): staging gates below
    if not os.path.exists(_snap_path(d, WAP_STAGED_ID)):
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "text"
        )
        staged = docs.filter(
            F.col("doc_id") % SNAP_DEL_MOD == SNAP_DEL_RES
        ).withColumn("source", F.concat(F.col("source"), F.lit(WAP_SRC_TAG)))
        wap_dir = "segments/documents/wap-batch"
        staged.write.mode("overwrite").parquet(os.path.join(d, wap_dir))
        n_staged = spark.read.parquet(os.path.join(d, wap_dir)).count()
        base_m = read_manifest(d, WAP_MAIN_ID)
        try:
            sid = commit_to_branch(
                d,
                WAP_BRANCH,
                {"documents": base_m["tables"]["documents"] + [wap_dir]},
                stats={
                    "documents": {
                        **base_m.get("stats", {}).get("documents", {}),
                        wap_dir: {"rows": n_staged},
                    }
                },
                committed_at=fixture_ts(WAP_STAGED_ID),
                expected_sid=WAP_MAIN_ID,
            )
            assert sid == WAP_STAGED_ID, f"staged at {sid}"
        except RefConflict:
            if not os.path.exists(_snap_path(d, WAP_STAGED_ID)):
                raise  # a real (non-builder) writer took the branch
    # AUDIT: the staged batch must introduce no doc_id already live on
    # the branch base — one anti-join count; publish only a clean batch
    staged_sid = resolve_ref(d, WAP_BRANCH)
    if resolve_ref(d, "main") != staged_sid:
        base_t = read_snapshot_table(spark, d, "documents", WAP_MAIN_ID)
        new_rows = spark.read.parquet(
            os.path.join(d, "segments/documents/wap-batch")
        )
        dup_new = new_rows.join(base_t, "doc_id", "left_semi").count()
        assert dup_new == 0, (
            f"WAP audit failed: {dup_new} staged doc_ids already live"
        )
        fast_forward(d, "main", WAP_BRANCH)
    _ensure_release_tag(d)
    return d


def _ensure_release_tag(d: str) -> None:
    """Immutable release TAG at the published snapshot (the constant
    id, not the live ref — a later main advance must not move what
    'published-v1' means): pins it against expiry and gives auditors a
    stable name."""
    try:
        create_ref(d, "published-v1", WAP_STAGED_ID, "tag")
    except RefConflict:
        pass  # tag exists (identical commit: idempotent accept path)


# ---------------------------------------------------------------------------
# position-delete fixture catalog (round 13)
# ---------------------------------------------------------------------------
# A dedicated two-snapshot store for the POSITION-delete read: the
# archive table is ONE file, sorted by doc_id, so a row's physical
# ordinal equals its rank — which is what lets the DuckDB oracle replay
# a position-scoped delete (row_number() - 1) that is otherwise a
# purely physical concept. Membership and delete rules are mod-rules
# over the documents table, the usual derivation contract.
POSDEL_TAB_MOD, POSDEL_TAB_RES = 3, 0  # archive = every 3rd doc
POSDEL_POS_MOD, POSDEL_POS_RES = 7, 3  # delete 0-based positions %7==3


def _posdel_dir(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return f"/tmp/spark_graft_posdelcat_v1_{base}"


def ensure_posdel_catalog(spark: SparkSession, sf_dir: str) -> str:
    """Idempotently build: snapshot 0 = the sorted single-file archive
    segment; snapshot 1 = an O(deleted-rows) POSITION delete file
    committed through the generic :func:`mor_delete_positions`. The
    single-partition sorted write (repartition(1) +
    sortWithinPartitions) is a correctness requirement here, not a
    speed anti-pattern: one file with deterministic row order is what
    makes ordinals == ranks. Gated eager build, the fixture rule."""
    d = _posdel_dir(sf_dir)
    if os.path.exists(_snap_path(d, 1)):
        return d
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    ).filter(F.col("doc_id") % POSDEL_TAB_MOD == POSDEL_TAB_RES)
    arch_dir = "segments/archive/base"
    if not os.path.exists(_snap_path(d, 0)):
        docs.repartition(1).sortWithinPartitions("doc_id").write.mode(
            "overwrite"
        ).parquet(os.path.join(d, arch_dir))
        commit_snapshot(
            d,
            {"archive": [arch_dir]},
            parent=None,
            expected_id=0,
            committed_at=fixture_ts(0),
        )
    n = docs.count()
    part = sorted(
        f
        for f in os.listdir(os.path.join(d, arch_dir))
        if f.endswith(".parquet")
    )
    assert len(part) == 1, f"archive must be one file, got {part}"
    pos = spark.createDataFrame(
        [
            (part[0], i)
            for i in range(n)
            if i % POSDEL_POS_MOD == POSDEL_POS_RES
        ],
        "file_name string, row_index long",
    )
    sid = mor_delete_positions(
        spark, d, "archive", pos, "posdel", committed_at=fixture_ts(1)
    )
    # a concurrent identical builder's commit replays to the same head
    assert sid == 1, f"position delete landed at {sid}"
    return d


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------


def corpus_snapshot_diff_versions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The closed lineage loop (VERDICT r10 item 4): the per-bucket
    added/removed/changed classification of :func:`corpus_snapshot_diff`
    computed between two REAL committed catalog versions — snapshot A
    and snapshot B are read back through the manifest reader
    (:func:`read_snapshot_table`), not simulated in-plan. The two-level
    dirty-bucket plan is the shared ``_snapshot_bucket_diff`` core:
    64-row checksum summaries per side, row-level full-outer diff only
    on disagreeing buckets. Because the store's contents are a
    deterministic function of the documents table, the oracle replays
    the derivation directly — and pytest separately pins that the store
    reads equal the derivation frames, so the oracle checks the real
    read path, not a tautology."""
    d = ensure_fixture_catalog(spark, sf_dir)
    ha = _snap_hashed(
        read_snapshot_table(
            spark, d, "documents", SNAP_A_ID, schema=_DOC_SCHEMA_V1
        )
    )
    hb = _snap_hashed(
        read_snapshot_table(
            spark, d, "documents", SNAP_B_ID, schema=_DOC_SCHEMA_V1
        )
    )
    return _snapshot_bucket_diff(ha, hb)


def catalog_incremental_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental consumer: per-bucket added/removed/changed
    between two committed versions, scanning ONLY the segments whose
    manifest entries DIFFER — I/O proportional to the blast radius,
    not the corpus. Because the fixture store is bucket-aligned COW
    (segment == diff bucket; clean buckets are the SAME path in both
    manifests), a segment listed identically in A and B is provably
    identical without reading a byte, so the manifest set-difference IS
    the dirty-bucket list the full diff derives from checksums. Output
    = exactly the full diff's ``is_match = 0`` rows (the oracle says
    precisely that), so the manifest pruning is hash-checked against
    the content-derived ground truth every driver round.

    At 100 TB this is the nightly "what moved since the snapshot the
    last model trained on" read: manifest set-difference (driver-side,
    O(segments)) → a pruned multi-file scan of just the rewritten
    partitions. The worst case (locality-hostile drift touching every
    segment) degrades to the full diff, never below it."""
    d = ensure_fixture_catalog(spark, sf_dir)
    a_paths = set(read_manifest(d, SNAP_A_ID)["tables"]["documents"])
    b_paths = set(read_manifest(d, SNAP_B_ID)["tables"]["documents"])
    common = a_paths & b_paths

    def scan(paths: set[str]) -> DataFrame:
        todo = sorted(paths - common)
        if not todo:
            # every segment shared: zero dirty buckets, empty diff
            return _snap_hashed(
                read_snapshot_table(
                    spark, d, "documents", SNAP_A_ID, schema=_DOC_SCHEMA_V1
                )
            ).limit(0)
        return _snap_hashed(
            spark.read.schema(_DOC_SCHEMA_V1).parquet(
                *[os.path.join(d, p) for p in todo]
            )
        )

    return _snapshot_bucket_diff(scan(a_paths), scan(b_paths))


_ZONE_LO, _ZONE_HI = 8, 200  # the range predicate of the zone-map query


def catalog_zonemap_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest zone-map pruning, end to end: count + checksum of the
    embeddings rows with ``vec_id BETWEEN 8 AND 200``, where the file
    list comes from :func:`prune_segments_by_range` — segments whose
    committed (min, max) bounds are provably disjoint from the range
    are never opened (at sf0.01: 2 of 4 segments scanned; pinned by
    test). The residual BETWEEN still applies in-scan (zone maps prune
    files, not rows), so the result is range-exact and the DuckDB
    oracle — the same predicate over the raw table — hash-checks that
    manifest pruning never changes answers. At 100 TB this is the
    difference between opening thousands of parquet footers and
    reading one manifest: the Iceberg ``lower_bound/upper_bound``
    file-skipping path, reproduced on the catalog."""
    d = ensure_fixture_catalog(spark, sf_dir)
    paths = prune_segments_by_range(
        d, SNAP_A_ID, "embeddings", "vec_id", _ZONE_LO, _ZONE_HI
    )
    if not paths:
        scan = read_snapshot_table(
            spark, d, "embeddings", SNAP_A_ID, schema=_EMB_SCHEMA_V1
        ).limit(0)
    else:
        scan = spark.read.schema(_EMB_SCHEMA_V1).parquet(
            *[os.path.join(d, p) for p in paths]
        )
    return (
        scan.filter(F.col("vec_id").between(_ZONE_LO, _ZONE_HI))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(
                F.sum(F.expr(md5_int_sql(_EMB_ROW))), F.lit(0)
            ).alias("checksum"),
        )
        .select("n_rows", "checksum")
    )


_DOC_ROW = "concat_ws('|', CAST(doc_id AS STRING), lang, source, text)"
_EMB_ROW = "concat_ws('|', CAST(vec_id AS STRING), CAST(label AS STRING))"
# schema-evolution row fingerprint: includes the evolved column with
# NULL made explicit (concat_ws silently skips NULLs on both engines —
# the coalesce keeps a NULL tier distinguishable from tier absent)
_DOC_ROW_V2 = (
    "concat_ws('|', CAST(doc_id AS STRING), lang, source, text, "
    "CAST(coalesce(tier, -1) AS STRING))"
)


def catalog_schema_evolution_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Schema evolution end to end (VERDICT r11 item 6): read the
    documents table AS OF snapshot C, whose segment list spans TWO
    schema versions — the dirty buckets rewritten WITH the new ``tier``
    column and the clean buckets still referencing snapshot A's
    pre-evolution files. The manifest-committed schema projects the
    read (``spark.read.schema``), so old segments NULL-backfill ``tier``
    with zero extra footer I/O. Output: per tier value (NULL coalesced
    to -1) the row count and content checksum — the NULL group is
    exactly the clean-bucket population, so the oracle (which derives
    tier from content-derived bucket dirtiness) hash-checks both the
    backfill and the rewrite in one result. At 100 TB this is the
    add-column migration every training pipeline eventually runs:
    commit = one manifest write; rewrite I/O only where values exist;
    readers of pinned pre-evolution snapshots keep the old schema
    (pytest pins that)."""
    d = ensure_fixture_catalog(spark, sf_dir)
    t = read_snapshot_table(spark, d, "documents", SNAP_C_ID)
    return (
        t.groupBy(
            F.coalesce(F.col("tier"), F.lit(-1)).cast("long").alias("tier_k")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.expr(md5_int_sql(_DOC_ROW_V2))).alias("checksum"),
        )
        .orderBy("tier_k")
    )


def catalog_takedown_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COW row-level delete, end to end (the takedown/GDPR shape): the
    embeddings table AS OF snapshot D — committed by the GENERIC
    :func:`cow_delete_range` removing vec_id ∈ [TKDN_LO, TKDN_HI] —
    plus the manifest-derived blast-radius accounting: segments before,
    segments after, and how many survived BY REFERENCE (same path in
    both manifests, zero I/O). The oracle recomputes all five values
    from the raw table: rows/checksum from the range predicate, the
    segment arithmetic from the same measured-bounds overlap rule the
    zone-map prune applies — so both the row-level correctness of the
    delete AND the pruned blast radius are hash-checked. At 100 TB
    this is the difference between rewriting one overlapping segment
    and rewriting the corpus."""
    d = ensure_fixture_catalog(spark, sf_dir)
    before = read_manifest(d, SNAP_C_ID)["tables"]["embeddings"]
    after = read_manifest(d, SNAP_D_ID)["tables"]["embeddings"]
    kept = len(set(before) & set(after))
    emb = read_snapshot_table(
        spark, d, "embeddings", SNAP_D_ID, schema=_EMB_SCHEMA_V1
    )
    return emb.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.expr(md5_int_sql(_EMB_ROW))).alias("checksum"),
    ).select(
        "n_rows",
        "checksum",
        F.lit(len(before)).cast("long").alias("n_segments_before"),
        F.lit(len(after)).cast("long").alias("n_segments_after"),
        F.lit(kept).cast("long").alias("n_kept_by_ref"),
    )


_DOC_SCHEMA_V1 = "doc_id BIGINT, lang STRING, source STRING, text STRING"
# embeddings segments (and every COW rewrite of them) carry exactly the
# registry schema; readers pass it to skip inference (r13 optimization)
_EMB_SCHEMA_V1 = "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"


def catalog_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest BLOOM pruning, end to end: fetch a fixed probe-key set
    from the mod-bucketed documents table — the layout zone maps
    provably CANNOT prune (every segment spans the id domain) — opening
    only the segments whose committed bloom may contain at least one
    key. Output: the matched rows' count + content checksum PLUS the
    blast-radius accounting (segments scanned vs total). The oracle
    replays everything from the raw table, including the scanned count:
    bloom positions are md5-derived, so DuckDB recomputes the exact
    per-segment bit sets and applies the same all-K-seeds membership
    rule — the pruning decision itself is hash-checked, false
    positives and all (they are deterministic, not random). At 100 TB
    this is the point-lookup path of the dedup anti-join and of any
    "fetch these doc_ids" serving read on a table clustered by
    something other than the key."""
    d = ensure_fixture_catalog(spark, sf_dir)
    total = len(read_manifest(d, SNAP_E_ID)["tables"]["documents"])
    paths = prune_segments_by_keys(
        d, SNAP_E_ID, "documents", "doc_id", BLOOM_PROBE_KEYS
    )
    if paths:
        scan = spark.read.schema(_DOC_SCHEMA_V1).parquet(
            *[os.path.join(d, p) for p in paths]
        )
    else:
        scan = spark.createDataFrame([], _DOC_SCHEMA_V1)
    return scan.filter(
        F.col("doc_id").isin(BLOOM_PROBE_KEYS)
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(
            F.sum(F.expr(md5_int_sql(_DOC_ROW))), F.lit(0)
        ).alias("checksum"),
    ).select(
        "n_rows",
        "checksum",
        F.lit(len(paths)).cast("long").alias("n_segments_scanned"),
        F.lit(total).cast("long").alias("n_segments_total"),
    )


def catalog_bloom_sidecar_lookup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The SIDECAR form of the bloom point lookup (round 13): same
    probe keys, same pruning decision, but resolved through snapshot
    G — whose manifest carries per-segment stat-FILE references
    (``doc_id_bloom_ref``) instead of inline bitsets. The output adds
    the manifest-shape accounting the sidecar buys: zero inline
    bitsets left in the manifest, one sidecar per (formerly inline)
    bloom. Snapshot G also carries F's MOR delete files, so the read
    applies the reader anti-join (no probe key matches the delete rule,
    and the oracle replays that too). At 100 TB the difference is the
    planner reading an O(segments)-path manifest vs one inlining tens
    of MB of bitsets; pruning opens 8 KiB sidecars lazily and still no
    data file before the decision. A pytest pins the sidecar decision
    path-equal to the inline one."""
    d = ensure_fixture_catalog(spark, sf_dir)
    mg = read_manifest(d, SNAP_G_ID)
    dstats = mg.get("stats", {}).get("documents", {})
    n_inline = sum(
        1 for e in dstats.values() if "doc_id_bloom" in (e or {})
    )
    n_side = sum(
        1 for e in dstats.values() if "doc_id_bloom_ref" in (e or {})
    )
    total = len(mg["tables"]["documents"])
    paths = prune_segments_by_keys(
        d, SNAP_G_ID, "documents", "doc_id", BLOOM_PROBE_KEYS
    )
    if paths:
        scan = spark.read.schema(_DOC_SCHEMA_V1).parquet(
            *[os.path.join(d, p) for p in paths]
        )
    else:
        scan = spark.createDataFrame([], _DOC_SCHEMA_V1)
    flt = scan.filter(F.col("doc_id").isin(BLOOM_PROBE_KEYS))
    for e in mg.get("deletes", {}).get("documents", []):
        keys = spark.read.parquet(os.path.join(d, e["path"])).select(
            F.col(e["col"]).alias("__del_key")
        )
        flt = flt.join(
            F.broadcast(keys),
            flt[e["col"]] == keys["__del_key"],
            "left_anti",
        )
    return flt.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(
            F.sum(F.expr(md5_int_sql(_DOC_ROW))), F.lit(0)
        ).alias("checksum"),
    ).select(
        "n_rows",
        "checksum",
        F.lit(len(paths)).cast("long").alias("n_segments_scanned"),
        F.lit(total).cast("long").alias("n_segments_total"),
        F.lit(n_inline).cast("long").alias("n_inline_blooms"),
        F.lit(n_side).cast("long").alias("n_sidecar_files"),
    )


def catalog_position_delete_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """POSITION-delete read, end to end (round 13 — the second
    Iceberg-v2 delete flavor, completing the taxonomy next to
    ``catalog_mor_delete_read``'s equality form): the archive table
    with an O(deleted-rows) (file, row-ordinal) delete file applied by
    the reader's ``_metadata``-based anti-join. Position scope is for
    rows with no usable equality key and is sequence-scoped by
    construction (it can never touch rows appended later). Because the
    fixture archive is one SORTED file, ordinal == rank(doc_id), so
    the oracle replays the physical delete with ``row_number() - 1``
    — the pruning of a purely physical concept is hash-checked. The
    accounting pins the O(rows) commit shape: one delete file, no data
    segment rewritten."""
    d = ensure_posdel_catalog(spark, sf_dir)
    m0, m1 = read_manifest(d, 0), read_manifest(d, 1)
    entries = m1.get("deletes", {}).get("archive", [])
    unchanged = int(m1["tables"]["archive"] == m0["tables"]["archive"])
    t = read_snapshot_table(spark, d, "archive", 1, schema=_DOC_SCHEMA_V1)
    return t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.expr(md5_int_sql(_DOC_ROW))).alias("checksum"),
    ).select(
        "n_rows",
        "checksum",
        F.lit(len(entries)).cast("long").alias("n_pos_delete_files"),
        F.lit(sum(e["n"] for e in entries)).cast("long").alias(
            "n_deleted_rows"
        ),
        F.lit(unchanged).cast("long").alias("segments_unchanged"),
    )


def catalog_mor_delete_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read delete, end to end (VERDICT r12 item 3): the
    documents table AS OF snapshot F — committed by the generic
    :func:`mor_delete_keys` as an O(keys) DELETE FILE, with the reader
    anti-joining the keys out at scan time — plus the manifest-derived
    accounting that proves the commit-cost claim: delete-file count,
    committed key count, data-segment count, and a flag pinning that
    the data segment list is BYTE-IDENTICAL to snapshot E's (no data
    was rewritten — the whole point vs the COW path, whose
    ``catalog_takedown_read`` twin shows the rewritten-segment shape).
    The oracle replays the drift + tier + delete mod-rules from the raw
    table, so the anti-join read and the O(keys) blast radius are both
    hash-checked. At 100 TB this is the per-request GDPR path: commit
    cost follows the request size, read cost one broadcast anti-join,
    and compaction folds the files in before they stack up."""
    d = ensure_fixture_catalog(spark, sf_dir)
    me = read_manifest(d, SNAP_E_ID)
    mf = read_manifest(d, SNAP_F_ID)
    entries = mf.get("deletes", {}).get("documents", [])
    unchanged = int(
        mf["tables"]["documents"] == me["tables"]["documents"]
    )
    t = read_snapshot_table(spark, d, "documents", SNAP_F_ID)
    return t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.expr(md5_int_sql(_DOC_ROW_V2))).alias("checksum"),
    ).select(
        "n_rows",
        "checksum",
        F.lit(len(entries)).cast("long").alias("n_delete_files"),
        F.lit(sum(e["n"] for e in entries)).cast("long").alias(
            "n_deleted_keys"
        ),
        F.lit(len(mf["tables"]["documents"])).cast("long").alias(
            "n_data_segments"
        ),
        F.lit(unchanged).cast("long").alias("segments_unchanged"),
    )


def catalog_time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF-TIMESTAMP read (VERDICT r12 item 5): resolve the probe
    instant ``TT_AS_OF_TS`` — halfway between the B and C commit
    timestamps — through :func:`snapshot_as_of` (latest committed_at <=
    ts, manifests only, zero file I/O) and read the documents table as
    of the RESOLVED snapshot. The probe must land on snapshot B: the
    output carries the resolved id plus B's row count and content
    checksum, so the oracle (which derives B's content from the drift
    rules and states the constant id) hash-checks both the resolver's
    pick and that the pick reads the right bytes. Commit timestamps
    are INJECTED at commit time (fixed epochs in the fixture build),
    never ambient clock reads — the build stays deterministic."""
    d = ensure_fixture_catalog(spark, sf_dir)
    sid = snapshot_as_of(d, TT_AS_OF_TS)
    t = read_snapshot_table(
        spark, d, "documents", sid, schema=_DOC_SCHEMA_V1
    )
    return t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.expr(md5_int_sql(_DOC_ROW))).alias("checksum"),
    ).select(
        F.lit(sid).cast("long").alias("resolved_snapshot_id"),
        "n_rows",
        "checksum",
    )


def catalog_wap_publish_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish, end to end (round 13): the documents table
    read through the ``main`` BRANCH REF after a full WAP cycle —
    stage on the ``audit`` branch (invisible to main), audit the staged
    snapshot (dup-ingest gate), ``fast_forward`` publish. The output
    pins the published snapshot id, that the audit branch and main
    ended in sync, the published row count + content checksum, and the
    manifest-stats row counts of the base and staged segments (quoted
    from the manifest — zero extra scans). The oracle replays base,
    staged batch, and published union from the mod-rules, so the
    branch-ref read path is hash-checked against the derivation. At
    100 TB this is how ingest gates bad data: auditors query the
    branch, production readers of ``main`` never see an unaudited row,
    and publish is one O(ref) CAS — no data moves."""
    d = ensure_wap_catalog(spark, sf_dir)
    pub = resolve_ref(d, "main")
    br = resolve_ref(d, WAP_BRANCH)
    seg_stats = read_manifest(d, pub).get("stats", {}).get("documents", {})
    n_base = seg_stats["segments/documents/base"]["rows"]
    n_staged = seg_stats["segments/documents/wap-batch"]["rows"]
    t = read_snapshot_table(
        spark, d, "documents", pub, schema=_DOC_SCHEMA_V1
    )
    return t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.expr(md5_int_sql(_DOC_ROW))).alias("checksum"),
    ).select(
        F.lit(pub).cast("long").alias("published_snapshot_id"),
        F.lit(int(br == pub)).cast("long").alias("branch_in_sync"),
        "n_rows",
        "checksum",
        F.lit(n_base).cast("long").alias("n_base_rows"),
        F.lit(n_staged).cast("long").alias("n_staged_rows"),
    )


def snapshot_catalog_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent multi-table snapshot reads — both committed versions
    of BOTH tables, each (snapshot_id, table) pinned through one
    manifest: per combination the row count and the order-insensitive
    md5-int content checksum. The output shows exactly what the
    catalog guarantees: documents differ between snapshots (drift) while
    embeddings are IDENTICAL — same checksum, and in fact the same
    physical segment file reused by reference (copy-on-write). A reader
    holding snapshot 0 is unaffected by the writer having committed
    snapshot 1 — pinned manifests never move (pytest pins the
    stability across a subsequent compaction commit too)."""
    d = ensure_fixture_catalog(spark, sf_dir)

    def summary(sid: int, table: str, row_expr: str) -> DataFrame:
        ddl = _DOC_SCHEMA_V1 if table == "documents" else _EMB_SCHEMA_V1
        t = read_snapshot_table(spark, d, table, sid, schema=ddl)
        return t.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.expr(md5_int_sql(row_expr))).alias("checksum"),
        ).select(
            F.lit(sid).cast("long").alias("snapshot_id"),
            F.lit(table).alias("table_name"),
            "n_rows",
            "checksum",
        )

    parts = [
        summary(sid, table, row)
        for sid in (SNAP_A_ID, SNAP_B_ID)
        for table, row in (("documents", _DOC_ROW), ("embeddings", _EMB_ROW))
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("snapshot_id", "table_name")


_DUCK_DOC_ROW = "concat_ws('|', CAST(doc_id AS VARCHAR), lang, source, text)"
_DUCK_DOC_ROW_B = (
    "concat_ws('|', CAST(doc_id AS VARCHAR), lang, CASE WHEN doc_id % "
    f"{SNAP_CHG_MOD} = {SNAP_CHG_RES} THEN source || '-v2' ELSE source END, text)"
)
_DUCK_EMB_ROW = "concat_ws('|', CAST(vec_id AS VARCHAR), CAST(label AS VARCHAR))"

ORACLE: dict[str, str] = {}
QUERIES: dict = {
    "corpus_snapshot_diff_versions": corpus_snapshot_diff_versions,
    "catalog_incremental_diff": catalog_incremental_diff,
    "snapshot_catalog_read": snapshot_catalog_read,
    "catalog_zonemap_prune": catalog_zonemap_prune,
    "catalog_schema_evolution_read": catalog_schema_evolution_read,
    "catalog_takedown_read": catalog_takedown_read,
    "catalog_bloom_point_lookup": catalog_bloom_point_lookup,
    "catalog_mor_delete_read": catalog_mor_delete_read,
    "catalog_time_travel_read": catalog_time_travel_read,
    "catalog_wap_publish_read": catalog_wap_publish_read,
    "catalog_bloom_sidecar_lookup": catalog_bloom_sidecar_lookup,
    "catalog_position_delete_read": catalog_position_delete_read,
}


def _duck_bloom_pos_dyn(seedcol: str, keycol: str) -> str:
    """DuckDB bloom position with a RELATION-valued seed (the oracle
    crosses keys/rows with a seeds table instead of unrolling K
    expressions). Must hash the same string as the Spark builder:
    '{seed}|{key}'."""
    return (
        f"CAST(('0x' || substr(md5(concat(CAST({seedcol} AS VARCHAR), "
        f"'|', CAST({keycol} AS VARCHAR))), 1, 8)) AS BIGINT) % {BLOOM_M}"
    )


_BLOOM_KEYS_SQL = ", ".join(f"({k})" for k in BLOOM_PROBE_KEYS)
_BLOOM_SEEDS_SQL = ", ".join(f"({s})" for s in range(BLOOM_K))

ORACLE["catalog_bloom_point_lookup"] = f"""
WITH cbp_docs AS (
  SELECT doc_id, lang,
    CASE WHEN doc_id % {SNAP_CHG_MOD} = {SNAP_CHG_RES}
         THEN source || '-v2' ELSE source END AS source,
    text, doc_id % {_DOC_SEG_BUCKETS} AS bucket
  FROM documents WHERE doc_id % {SNAP_DEL_MOD} <> {SNAP_DEL_RES}
),
cbp_keys(k) AS (VALUES {_BLOOM_KEYS_SQL}),
cbp_seeds(s) AS (VALUES {_BLOOM_SEEDS_SQL}),
cbp_seg_bits AS (
  -- the committed bitset is SEED-AGNOSTIC (one bit array, classic
  -- bloom): membership only asks "is the bit set", not which seed
  -- set it — so the replay is the per-bucket position UNION
  SELECT DISTINCT bucket, {_duck_bloom_pos_dyn('s', 'doc_id')} AS p
  FROM cbp_docs CROSS JOIN cbp_seeds
),
cbp_key_pos AS (
  SELECT k, s, {_duck_bloom_pos_dyn('s', 'k')} AS p
  FROM cbp_keys CROSS JOIN cbp_seeds
),
cbp_hits AS (
  SELECT b.bucket, kp.k
  FROM cbp_key_pos kp
  JOIN cbp_seg_bits b ON b.p = kp.p
  GROUP BY b.bucket, kp.k
  HAVING count(DISTINCT kp.s) = {BLOOM_K}
),
cbp_scanned AS (SELECT count(DISTINCT bucket) AS n FROM cbp_hits),
cbp_total AS (SELECT count(DISTINCT bucket) AS n FROM cbp_docs)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
  CAST(coalesce(sum({duck_md5_int(_DUCK_DOC_ROW)}), 0) AS BIGINT)
    AS checksum,
  CAST((SELECT n FROM cbp_scanned) AS BIGINT) AS n_segments_scanned,
  CAST((SELECT n FROM cbp_total) AS BIGINT) AS n_segments_total
FROM cbp_docs
WHERE doc_id IN ({", ".join(str(k) for k in BLOOM_PROBE_KEYS)})
"""

ORACLE["catalog_takedown_read"] = f"""
WITH ctd_e AS (
  SELECT vec_id, label FROM embeddings WHERE vec_id % 2 = 0
),
ctd_zs AS (
  SELECT vec_id // {_EMB_SEG_WIDTH} AS zseg,
    min(vec_id) AS mn, max(vec_id) AS mx
  FROM ctd_e GROUP BY 1
),
ctd_counts AS (
  SELECT CAST(count(*) AS BIGINT) AS n_before,
    CAST(sum(CASE WHEN mx >= {TKDN_LO} AND mn <= {TKDN_HI}
             THEN 1 ELSE 0 END) AS BIGINT) AS n_aff
  FROM ctd_zs
),
ctd_surv AS (
  SELECT count(*) AS n FROM ctd_e e
  JOIN ctd_zs z ON e.vec_id // {_EMB_SEG_WIDTH} = z.zseg
    AND z.mx >= {TKDN_LO} AND z.mn <= {TKDN_HI}
  WHERE e.vec_id NOT BETWEEN {TKDN_LO} AND {TKDN_HI}
)
SELECT
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum({duck_md5_int(_DUCK_EMB_ROW)}) AS BIGINT) AS checksum,
  (SELECT n_before FROM ctd_counts) AS n_segments_before,
  (SELECT n_before - n_aff
     + CASE WHEN (SELECT n FROM ctd_surv) > 0 THEN 1 ELSE 0 END
   FROM ctd_counts) AS n_segments_after,
  (SELECT n_before - n_aff FROM ctd_counts) AS n_kept_by_ref
FROM ctd_e
WHERE vec_id NOT BETWEEN {TKDN_LO} AND {TKDN_HI}
"""

ORACLE["catalog_zonemap_prune"] = f"""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
  CAST(coalesce(sum({duck_md5_int(_DUCK_EMB_ROW)}), 0) AS BIGINT)
    AS checksum
FROM embeddings
WHERE vec_id % 2 = 0 AND vec_id BETWEEN {_ZONE_LO} AND {_ZONE_HI}
"""


def _duck_dirty_ctes(p: str) -> str:
    """Prefixed CTE chain ending in ``{p}dirty`` — the content-derived
    dirty-bucket determination every fixture-store oracle shares (the
    full diff, the incremental diff, and the schema-evolution read,
    whose tier rule keys on bucket dirtiness)."""
    return f"""{p}ha AS (
  SELECT doc_id % 64 AS bucket, doc_id,
    {duck_md5_int(_DUCK_DOC_ROW)} AS h
  FROM documents WHERE doc_id % {SNAP_ADD_MOD} <> {SNAP_ADD_RES}
),
{p}hb AS (
  SELECT doc_id % 64 AS bucket, doc_id,
    {duck_md5_int(_DUCK_DOC_ROW_B)} AS h
  FROM documents WHERE doc_id % {SNAP_DEL_MOD} <> {SNAP_DEL_RES}
),
{p}sa AS (
  SELECT bucket, count(*) AS n_old, CAST(sum(h) AS BIGINT) AS ck
  FROM {p}ha GROUP BY 1
),
{p}sb AS (
  SELECT bucket, count(*) AS n_new, CAST(sum(h) AS BIGINT) AS ck
  FROM {p}hb GROUP BY 1
),
{p}sums AS (
  SELECT coalesce({p}sa.bucket, {p}sb.bucket) AS bucket,
    coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new,
    CASE WHEN n_old = n_new AND {p}sa.ck = {p}sb.ck THEN 1 ELSE 0 END
      AS is_match
  FROM {p}sa FULL OUTER JOIN {p}sb ON {p}sa.bucket = {p}sb.bucket
),
{p}dirty AS (SELECT bucket FROM {p}sums WHERE is_match = 0)"""


def _duck_diff_sql(prefix: str, only_dirty: bool) -> str:
    """The drift-derivation diff chain (CTE names prefixed per the
    composed-oracle rule). The store's contents are the deterministic
    drift derivation of the documents table, so the _versions oracle is
    the SAME SQL as the simulated diff; the incremental oracle is that
    SQL restricted to ``is_match = 0`` — the manifest-pruned scan must
    reproduce exactly the content-derived dirty rows."""
    p = prefix
    where = f"WHERE s.is_match = 0" if only_dirty else ""
    return f"""
WITH {_duck_dirty_ctes(p)},
{p}cls AS (
  SELECT coalesce(a.bucket, b.bucket) AS bucket,
    CASE WHEN a.doc_id IS NULL THEN 'added'
         WHEN b.doc_id IS NULL THEN 'removed'
         WHEN a.h <> b.h THEN 'changed' ELSE 'same' END AS st
  FROM (SELECT * FROM {p}ha WHERE bucket IN (SELECT bucket FROM {p}dirty)) a
  FULL OUTER JOIN
       (SELECT * FROM {p}hb WHERE bucket IN (SELECT bucket FROM {p}dirty)) b
    ON a.doc_id = b.doc_id
),
{p}cnt AS (
  SELECT bucket,
    CAST(sum(CASE WHEN st = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
    CAST(sum(CASE WHEN st = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_removed,
    CAST(sum(CASE WHEN st = 'changed' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_changed
  FROM {p}cls GROUP BY 1
)
SELECT s.bucket, s.n_old, s.n_new, s.is_match,
  coalesce(n_added, CAST(0 AS BIGINT)) AS n_added,
  coalesce(n_removed, CAST(0 AS BIGINT)) AS n_removed,
  coalesce(n_changed, CAST(0 AS BIGINT)) AS n_changed
FROM {p}sums s LEFT JOIN {p}cnt c ON s.bucket = c.bucket
{where}
ORDER BY s.bucket
"""


ORACLE["corpus_snapshot_diff_versions"] = _duck_diff_sql("scv_", False)
ORACLE["catalog_incremental_diff"] = _duck_diff_sql("cid_", True)

ORACLE["snapshot_catalog_read"] = f"""
WITH scr_combos AS (
  SELECT CAST(0 AS BIGINT) AS snapshot_id, 'documents' AS table_name,
    CAST(count(*) AS BIGINT) AS n_rows,
    CAST(sum({duck_md5_int(_DUCK_DOC_ROW)}) AS BIGINT) AS checksum
  FROM documents WHERE doc_id % {SNAP_ADD_MOD} <> {SNAP_ADD_RES}
  UNION ALL
  SELECT CAST(0 AS BIGINT), 'embeddings',
    CAST(count(*) AS BIGINT),
    CAST(sum({duck_md5_int(_DUCK_EMB_ROW)}) AS BIGINT)
  FROM embeddings WHERE vec_id % 2 = 0
  UNION ALL
  SELECT CAST(1 AS BIGINT), 'documents',
    CAST(count(*) AS BIGINT),
    CAST(sum({duck_md5_int(_DUCK_DOC_ROW_B)}) AS BIGINT)
  FROM documents WHERE doc_id % {SNAP_DEL_MOD} <> {SNAP_DEL_RES}
  UNION ALL
  SELECT CAST(1 AS BIGINT), 'embeddings',
    CAST(count(*) AS BIGINT),
    CAST(sum({duck_md5_int(_DUCK_EMB_ROW)}) AS BIGINT)
  FROM embeddings WHERE vec_id % 2 = 0
)
SELECT snapshot_id, table_name, n_rows, checksum FROM scr_combos
ORDER BY snapshot_id, table_name
"""


# tier rule: rows in content-dirty buckets (rewritten at snapshot C)
# carry doc_id % TIER_MOD; clean-bucket rows read back NULL-backfilled.
# The oracle derives dirtiness from content (the shared dirty chain),
# which the manifest set-difference provably equals (hash-pinned by
# catalog_incremental_diff every round).
_DUCK_DOC_ROW_V2 = (
    "concat_ws('|', CAST(doc_id AS VARCHAR), lang, source, text, "
    "CAST(coalesce(tier, -1) AS VARCHAR))"
)
ORACLE["catalog_schema_evolution_read"] = f"""
WITH {_duck_dirty_ctes("sev_")},
sev_docs AS (
  SELECT doc_id, lang,
    CASE WHEN doc_id % {SNAP_CHG_MOD} = {SNAP_CHG_RES}
         THEN source || '-v2' ELSE source END AS source,
    text, doc_id % 64 AS bucket
  FROM documents WHERE doc_id % {SNAP_DEL_MOD} <> {SNAP_DEL_RES}
),
sev_tiered AS (
  SELECT doc_id, lang, source, text,
    CASE WHEN bucket IN (SELECT bucket FROM sev_dirty)
         THEN doc_id % {TIER_MOD} END AS tier
  FROM sev_docs
)
SELECT CAST(coalesce(tier, -1) AS BIGINT) AS tier_k,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum({duck_md5_int(_DUCK_DOC_ROW_V2)}) AS BIGINT) AS checksum
FROM sev_tiered
GROUP BY 1
ORDER BY tier_k
"""

# MOR delete replay: B-alive rows (drift rules), tier by bucket
# dirtiness (the schema-evolution rule — snapshot F reads through C's
# committed schema), minus the mod-rule delete keys; accounting columns
# derive from the same relations (key count = B-alive matching the mod
# rule, segment count = the bloom oracle's bucket count).
ORACLE["catalog_mor_delete_read"] = f"""
WITH {_duck_dirty_ctes("mdr_")},
mdr_docs AS (
  SELECT doc_id, lang,
    CASE WHEN doc_id % {SNAP_CHG_MOD} = {SNAP_CHG_RES}
         THEN source || '-v2' ELSE source END AS source,
    text, doc_id % {_DOC_SEG_BUCKETS} AS bucket
  FROM documents WHERE doc_id % {SNAP_DEL_MOD} <> {SNAP_DEL_RES}
),
mdr_tiered AS (
  SELECT doc_id, lang, source, text,
    CASE WHEN bucket IN (SELECT bucket FROM mdr_dirty)
         THEN doc_id % {TIER_MOD} END AS tier
  FROM mdr_docs
),
mdr_alive AS (
  SELECT * FROM mdr_tiered
  WHERE doc_id % {MOR_DEL_MOD} <> {MOR_DEL_RES}
),
mdr_delkeys AS (
  SELECT count(*) AS n FROM mdr_docs
  WHERE doc_id % {MOR_DEL_MOD} = {MOR_DEL_RES}
),
mdr_segs AS (SELECT count(DISTINCT bucket) AS n FROM mdr_docs)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum({duck_md5_int(_DUCK_DOC_ROW_V2)}) AS BIGINT) AS checksum,
  CAST(1 AS BIGINT) AS n_delete_files,
  CAST((SELECT n FROM mdr_delkeys) AS BIGINT) AS n_deleted_keys,
  CAST((SELECT n FROM mdr_segs) AS BIGINT) AS n_data_segments,
  CAST(1 AS BIGINT) AS segments_unchanged
FROM mdr_alive
"""

# the probe instant resolves to snapshot B (latest committed_at <= ts),
# so the oracle is B's drift derivation plus the constant id
ORACLE["catalog_time_travel_read"] = f"""
SELECT CAST({SNAP_B_ID} AS BIGINT) AS resolved_snapshot_id,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum({duck_md5_int(_DUCK_DOC_ROW_B)}) AS BIGINT) AS checksum
FROM documents WHERE doc_id % {SNAP_DEL_MOD} <> {SNAP_DEL_RES}
"""

# WAP replay: base = the B-drift derivation, staged = exactly the rows
# the drift deleted re-tagged '+wap', published = their union (CTE
# names wap_-prefixed per the composed-oracle collision rule)
ORACLE["catalog_wap_publish_read"] = f"""
WITH wap_base AS (
  SELECT doc_id, lang,
    CASE WHEN doc_id % {SNAP_CHG_MOD} = {SNAP_CHG_RES}
         THEN source || '-v2' ELSE source END AS source,
    text
  FROM documents WHERE doc_id % {SNAP_DEL_MOD} <> {SNAP_DEL_RES}
),
wap_staged AS (
  SELECT doc_id, lang, source || '{WAP_SRC_TAG}' AS source, text
  FROM documents WHERE doc_id % {SNAP_DEL_MOD} = {SNAP_DEL_RES}
),
wap_pub AS (
  SELECT * FROM wap_base UNION ALL SELECT * FROM wap_staged
)
SELECT CAST({WAP_STAGED_ID} AS BIGINT) AS published_snapshot_id,
  CAST(1 AS BIGINT) AS branch_in_sync,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum({duck_md5_int(_DUCK_DOC_ROW)}) AS BIGINT) AS checksum,
  CAST((SELECT count(*) FROM wap_base) AS BIGINT) AS n_base_rows,
  CAST((SELECT count(*) FROM wap_staged) AS BIGINT) AS n_staged_rows
FROM wap_pub
"""

# sidecar bloom replay (round 13): same bitset derivation as the
# inline form (the sidecars RELOCATE snapshot E's blooms, bit-for-bit),
# plus the MOR delete rule on the fetched rows and the manifest-shape
# constants (0 inline bitsets; one sidecar per bloomed segment)
ORACLE["catalog_bloom_sidecar_lookup"] = f"""
WITH cbs_docs AS (
  SELECT doc_id, lang,
    CASE WHEN doc_id % {SNAP_CHG_MOD} = {SNAP_CHG_RES}
         THEN source || '-v2' ELSE source END AS source,
    text, doc_id % {_DOC_SEG_BUCKETS} AS bucket
  FROM documents WHERE doc_id % {SNAP_DEL_MOD} <> {SNAP_DEL_RES}
),
cbs_keys(k) AS (VALUES {_BLOOM_KEYS_SQL}),
cbs_seeds(s) AS (VALUES {_BLOOM_SEEDS_SQL}),
cbs_seg_bits AS (
  SELECT DISTINCT bucket, {_duck_bloom_pos_dyn('s', 'doc_id')} AS p
  FROM cbs_docs CROSS JOIN cbs_seeds
),
cbs_key_pos AS (
  SELECT k, s, {_duck_bloom_pos_dyn('s', 'k')} AS p
  FROM cbs_keys CROSS JOIN cbs_seeds
),
cbs_hits AS (
  SELECT b.bucket, kp.k
  FROM cbs_key_pos kp
  JOIN cbs_seg_bits b ON b.p = kp.p
  GROUP BY b.bucket, kp.k
  HAVING count(DISTINCT kp.s) = {BLOOM_K}
),
cbs_scanned AS (SELECT count(DISTINCT bucket) AS n FROM cbs_hits),
cbs_total AS (SELECT count(DISTINCT bucket) AS n FROM cbs_docs)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
  CAST(coalesce(sum({duck_md5_int(_DUCK_DOC_ROW)}), 0) AS BIGINT)
    AS checksum,
  CAST((SELECT n FROM cbs_scanned) AS BIGINT) AS n_segments_scanned,
  CAST((SELECT n FROM cbs_total) AS BIGINT) AS n_segments_total,
  CAST(0 AS BIGINT) AS n_inline_blooms,
  CAST((SELECT n FROM cbs_total) AS BIGINT) AS n_sidecar_files
FROM cbs_docs
WHERE doc_id IN ({", ".join(str(k) for k in BLOOM_PROBE_KEYS)})
  AND doc_id % {MOR_DEL_MOD} <> {MOR_DEL_RES}
"""

# position-delete replay: the archive is one SORTED file, so the
# physical ordinal equals rank(doc_id) and the oracle states the
# delete as a row_number() filter over the derivation
ORACLE["catalog_position_delete_read"] = f"""
WITH cpd_arch AS (
  SELECT doc_id, lang, source, text,
    row_number() OVER (ORDER BY doc_id) - 1 AS pos
  FROM documents WHERE doc_id % {POSDEL_TAB_MOD} = {POSDEL_TAB_RES}
),
cpd_alive AS (
  SELECT * FROM cpd_arch WHERE pos % {POSDEL_POS_MOD} <> {POSDEL_POS_RES}
),
cpd_del AS (
  SELECT count(*) AS n FROM cpd_arch
  WHERE pos % {POSDEL_POS_MOD} = {POSDEL_POS_RES}
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum({duck_md5_int(_DUCK_DOC_ROW)}) AS BIGINT) AS checksum,
  CAST(1 AS BIGINT) AS n_pos_delete_files,
  CAST((SELECT n FROM cpd_del) AS BIGINT) AS n_deleted_rows,
  CAST(1 AS BIGINT) AS segments_unchanged
FROM cpd_alive
"""
