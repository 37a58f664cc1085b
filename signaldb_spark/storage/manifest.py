"""Manifest-committed tables: the object-store-safe commit protocol.

Directory-rename protocols (``os.replace`` of staged files, ``rmtree`` +
``rename`` partition swaps) assume POSIX atomicity that object stores
don't offer — on S3/GCS a rename is a copy+delete with a visible window.
Here a commit is ONE new immutable manifest object:

    table/
      data/date_day=…/hour=…/<unique-name>.parquet   (never overwritten)
      _manifests/v00000042.json                      (complete file list)

Writers write data files under names unique per attempt, then commit
manifest v(N+1) listing the complete resulting file set. The manifest
write is the transaction point: locally an ``os.link`` put-if-absent
(fails if the version exists — the loser of a race retries on the next
version); on S3 the same protocol is a conditional PUT
(``If-None-Match: *``) of the new version key. Readers resolve the
highest committed version and read exactly its files, so

- a half-finished writer is invisible (its files are unreferenced),
- a reader holding version N keeps a consistent snapshot while v(N+1)
  compacts those files away, because replaced files are deleted by
  snapshot expiration, not at commit time,
- a replayed streaming batch is a no-op: batch lineage is recorded in
  the manifest, and a batch id that already committed is skipped —
  regardless of how many files the crashed first attempt wrote.

This is the semantics the reference gets from Iceberg snapshots
(docs/architecture/storage-layout.md; compactor retention/ + orphan/
jobs); expressed directly because the sandbox has no Iceberg/Delta jars.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

MANIFEST_DIR = "_manifests"
DATA_DIR = "data"


class CommitConflict(Exception):
    """Another writer committed this version first — reread and retry."""


class ManifestTable:
    def __init__(self, table_path: str):
        self.table_path = table_path
        self.manifest_dir = os.path.join(table_path, MANIFEST_DIR)
        self.data_dir = os.path.join(table_path, DATA_DIR)

    # ------------------------------------------------------------ versions

    def versions(self) -> list[int]:
        if not os.path.isdir(self.manifest_dir):
            return []
        out = []
        for name in os.listdir(self.manifest_dir):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    out.append(int(name[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def current_version(self) -> int:
        vs = self.versions()
        return vs[-1] if vs else 0

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.manifest_dir, f"v{version:08d}.json")

    def load_manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v == 0:
            return {"version": 0, "files": [], "batches": []}
        with open(self._manifest_path(v)) as fh:
            return json.load(fh)

    # -------------------------------------------------------------- commit

    def _put_if_absent(self, manifest: dict, version: int) -> None:
        """Atomic create-if-not-exists of the version object. ``os.link``
        raises FileExistsError if the target exists (the POSIX analog of
        a conditional PUT); the temp file is always cleaned up."""
        os.makedirs(self.manifest_dir, exist_ok=True)
        tmp = os.path.join(self.manifest_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        try:
            os.link(tmp, self._manifest_path(version))
        except FileExistsError as e:
            raise CommitConflict(version) from e
        finally:
            os.unlink(tmp)

    def commit(
        self,
        add_files: list[str],
        remove_files: list[str] | tuple = (),
        batch_id: int | str | None = None,
        max_retries: int = 20,
        stats: dict[str, dict] | None = None,
        properties: dict | None = None,
        precondition=None,
    ) -> bool:
        """Commit a snapshot: current files − removed + added. Paths are
        relative to ``data/``. Returns False (no commit) if ``batch_id``
        already appears in the lineage — the idempotent-replay guard.
        Optimistic concurrency: on version collision, reread and retry.

        ``stats`` maps added file → {col: [min, max]} (the Iceberg
        manifest-entry ``lower_bounds``/``upper_bounds`` analog,
        storage-layout.md:45-96). Entries ride the manifest so
        :meth:`read` can prune the file list by predicate range BEFORE
        Spark ever plans the scan — at 100 TB the planner should list
        the matching hour's files, not every file ever committed.

        ``properties`` merges into the snapshot's table properties IN
        THE SAME atomic version object as the file list (the Iceberg
        table-properties analog) — the channel the hot/cold watermark
        rides (storage/hot.py); properties carry forward on later
        commits that don't touch them.

        ``precondition`` (manifest → bool), when given, is re-evaluated
        against the CURRENT manifest on every retry; a falsy result
        aborts the whole commit with False. This is the
        compare-and-swap hook watermark-bearing commits need: a flush
        asserts "the watermark is still the one I planned against", so
        a racing flush can never re-add already-flushed batches or
        regress the watermark, whichever order the two commits land in.
        """
        removed = set(remove_files)
        for _ in range(max_retries):
            cur = self.load_manifest()
            if batch_id is not None and batch_id in cur["batches"]:
                return False
            if precondition is not None and not precondition(cur):
                return False
            files = [f for f in cur["files"] if f not in removed] + list(add_files)
            kept_stats = {
                f: s for f, s in cur.get("stats", {}).items() if f not in removed
            }
            kept_stats.update(stats or {})
            manifest = {
                "version": cur["version"] + 1,
                "files": sorted(files),
                "batches": cur["batches"] + ([batch_id] if batch_id is not None else []),
                "stats": kept_stats,
                "props": {**cur.get("props", {}), **(properties or {})},
            }
            try:
                self._put_if_absent(manifest, cur["version"] + 1)
                return True
            except CommitConflict:
                continue
        raise RuntimeError(f"commit contention exceeded {max_retries} retries")

    # ---------------------------------------------------------------- read

    def files(self, version: int | None = None) -> list[str]:
        return [
            os.path.join(self.data_dir, f) for f in self.load_manifest(version)["files"]
        ]

    def pruned_files(
        self, col: str, lo, hi, version: int | None = None
    ) -> tuple[list[str], int]:
        """Manifest-level file pruning: drop files whose recorded
        [min, max] for ``col`` is disjoint from [lo, hi]. Files with no
        recorded stats are kept (pruning is an optimization, never a
        correctness filter). Returns (absolute paths, files_pruned)."""
        m = self.load_manifest(version)
        stats = m.get("stats", {})
        lo_k, hi_k = _stat_key(lo), _stat_key(hi)
        kept, pruned = [], 0
        for f in m["files"]:
            rng = stats.get(f, {}).get(col)
            if rng is not None and (rng[1] < lo_k or rng[0] > hi_k):
                pruned += 1
                continue
            kept.append(os.path.join(self.data_dir, f))
        return kept, pruned

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        between: tuple[str, object, object] | None = None,
    ) -> DataFrame | None:
        """Snapshot read: exactly the committed file set (explicit list +
        basePath keeps hive-style partition columns AND partition
        pruning). None for an empty table — no schema to synthesize.

        ``between=(col, lo, hi)`` additionally prunes the file list by
        the manifest's per-file column stats before Spark plans the
        scan; the caller must still apply the row-level predicate (file
        stats bound files, not rows)."""
        if between is not None:
            fs, _ = self.pruned_files(*between, version=version)
        else:
            fs = self.files(version)
        if not fs:
            return None
        return spark.read.option("basePath", self.data_dir).parquet(*fs)

    def read_recent_topk(
        self,
        spark: SparkSession,
        ts_col: str,
        n: int,
        version: int | None = None,
        transform=None,
    ) -> tuple[DataFrame | None, int]:
        """Statistics-ordered TopK scan for the dominant observability
        shape ``ORDER BY ts DESC LIMIT n`` — read the most-promising
        files first instead of scanning the table (the reference's
        declared-sort-orders change: DataFusion's statistics-based file
        reordering + TopK pushdown, 27-49x on exactly this shape; our
        ordering claim is the manifest's per-file [min, max], which the
        committing writer recorded from the parquet footers — honest by
        construction, never declared beyond what the file proves).

        Files sort by recorded max(ts) descending and read in doubling
        waves; the scan stops as soon as n rows are in hand AND the
        n-th newest timestamp strictly exceeds every unread file's max
        — unread files then provably hold no top-n row, so the result's
        timestamp multiset equals the full scan's. Files without
        recorded stats make no claim and are always read in the first
        wave. The driver-side wave loop costs at most log2(files) Spark
        jobs — the price of limit pushdown Spark's parquet scan does
        not do natively.

        Returns (top-n DataFrame ordered newest-first, files_read);
        (None, 0) for an empty table. Ties at the n-th timestamp are
        resolved arbitrarily, exactly like the unhinted full scan.

        ``transform`` (optional) applies per wave BEFORE the order/limit
        — the hook that makes the early-stop work under query
        predicates (a filtered tail still stops once n SURVIVING rows
        beat every unread file's max). The transform must only filter
        rows or add/project columns; it must never alter ``ts_col``
        values or synthesize rows, or the file-stats boundary check is
        no longer an upper bound.
        """
        m = self.load_manifest(version)
        stats = m.get("stats", {})
        blind = [f for f in m["files"] if stats.get(f, {}).get(ts_col) is None]
        known = sorted(
            (f for f in m["files"] if f not in set(blind)),
            key=lambda f: stats[f][ts_col][1],
            reverse=True,
        )
        if not blind and not known:
            return None, 0
        taken = list(blind)
        wave = 1
        while True:
            taken += known[len(taken) - len(blind):][:wave]
            wave *= 2
            unread = known[len(taken) - len(blind):]
            df = spark.read.option("basePath", self.data_dir).parquet(
                *[os.path.join(self.data_dir, f) for f in taken]
            )
            if transform is not None:
                df = transform(df)
            from pyspark.sql import functions as F

            top = df.orderBy(F.desc(ts_col)).limit(n)
            if not unread:
                return top, len(taken)
            rows = top.select(ts_col).collect()
            if len(rows) >= n:
                nth = _stat_key(rows[-1][0])
                boundary = stats[unread[0]][ts_col][1]
                if nth > boundary:
                    return top, len(taken)

    # ------------------------------------------------------- housekeeping

    def _all_data_files(self) -> list[str]:
        out = []
        for root, _dirs, names in os.walk(self.data_dir):
            for n in names:
                if n.endswith(".parquet"):
                    out.append(
                        os.path.relpath(os.path.join(root, n), self.data_dir)
                    )
        return out

    def find_orphans(self) -> list[str]:
        """Data files referenced by NO retained manifest — crashed write
        attempts and compacted-away files past expiration (the
        compactor's orphan-detection job, src/compactor/src/orphan/)."""
        live: set[str] = set()
        for v in self.versions():
            live.update(self.load_manifest(v)["files"])
        return sorted(set(self._all_data_files()) - live)

    def expire_snapshots(self, keep_last: int = 1) -> list[str]:
        """Drop old manifests (keep the newest ``keep_last``), then
        delete the data files those EXPIRED manifests referenced and no
        retained snapshot still does. Readers that resolved a retained
        version stay consistent — this, not commit, is the only place
        committed data files die (snapshot expiration,
        src/compactor/src/retention/).

        Deliberately NOT a directory diff: a file on disk that no
        manifest has ever referenced may be a concurrent writer's
        staged batch whose commit is about to land — deleting it here
        (with zero grace) would be the lost-staged-file hazard. Such
        files are maintenance.cleanup_orphans' job, behind its
        wall-clock grace window (the Iceberg split: expireSnapshots vs
        removeOrphanFiles)."""
        vs = self.versions()
        drop = vs[:-keep_last] if keep_last > 0 else vs
        keep = vs[len(drop):]
        expired_refs: set[str] = set()
        for v in drop:  # read before unlinking the manifests
            expired_refs.update(self.load_manifest(v)["files"])
        retained_refs: set[str] = set()
        for v in keep:
            retained_refs.update(self.load_manifest(v)["files"])
        dead = sorted(expired_refs - retained_refs)
        for v in drop:
            os.unlink(self._manifest_path(v))
        for rel in dead:
            path = os.path.join(self.data_dir, rel)
            try:
                os.unlink(path)
            except FileNotFoundError:
                pass
            # prune now-empty partition dirs
            d = os.path.dirname(path)
            while d != self.data_dir and os.path.isdir(d) and not os.listdir(d):
                os.rmdir(d)
                d = os.path.dirname(d)
        return dead


# ------------------------------------------------------------------ writers


def _stat_key(v):
    """Normalize a stats value to a JSON-storable, totally-ordered key:
    timestamps → epoch microseconds (int); everything else unchanged.
    Naive datetimes are treated as UTC wall time (the session timezone
    is pinned UTC; parquet footers may yield either form)."""
    import datetime as dt

    if isinstance(v, dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=dt.timezone.utc)
        return int(v.timestamp() * 1_000_000)
    if isinstance(v, dt.date):
        return v.isoformat()
    return v


def collect_file_stats(
    data_dir: str, rel_files: list[str], cols: tuple[str, ...]
) -> dict[str, dict]:
    """Per-file [min, max] for ``cols`` from parquet footers only (the
    row-group statistics pyarrow exposes) — a metadata read, no data
    I/O; the same information an Iceberg writer records in its manifest
    entries. Columns missing from a file, or with stats disabled, are
    simply absent from that file's entry."""
    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    for rel in rel_files:
        md = pq.ParquetFile(os.path.join(data_dir, rel)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        entry: dict[str, list] = {}
        for col in cols:
            i = idx.get(col)
            if i is None:
                continue
            lo = hi = None
            ok = True
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(i).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                mn, mx = _stat_key(st.min), _stat_key(st.max)
                lo = mn if lo is None or mn < lo else lo
                hi = mx if hi is None or mx > hi else hi
            if ok and lo is not None:
                entry[col] = [lo, hi]
        if entry:
            out[rel] = entry
    return out


def _stage_into_data(staging: str, data_dir: str, prefix: str) -> list[str]:
    """Move staged hive-layout parquet files under unique names in
    data/. The move is local simulation of a direct-to-final-key upload
    (what an object-store committer does); uniqueness per attempt means
    nothing is ever overwritten."""
    rel_files = []
    for root, _dirs, names in os.walk(staging):
        rel = os.path.relpath(root, staging)
        for i, n in enumerate(sorted(names)):
            if not n.endswith(".parquet"):
                continue
            dest_dir = os.path.join(data_dir, rel) if rel != "." else data_dir
            os.makedirs(dest_dir, exist_ok=True)
            fname = f"{prefix}-{i:05d}.parquet"
            os.replace(os.path.join(root, n), os.path.join(dest_dir, fname))
            rel_files.append(
                os.path.relpath(os.path.join(dest_dir, fname), data_dir)
            )
    shutil.rmtree(staging, ignore_errors=True)
    return rel_files


def write_batch_manifest(
    df: DataFrame,
    table_path: str,
    table: str,
    batch_id: int | str,
    partition_cols: tuple[str, ...] = ("date_day", "hour"),
    stats_cols: tuple[str, ...] = ("timestamp",),
) -> bool:
    """foreachBatch sink with manifest commit: idempotent under
    at-least-once replay even when the replay produces a different file
    count (each attempt's names carry a fresh attempt id; only the
    committing attempt's files enter the manifest; the rest are
    never-referenced orphans, reclaimed by maintenance.cleanup_orphans
    after its grace window). Returns True if this call committed."""
    from ..streaming.ingest import BLOOM_WRITE_OPTIONS, SORT_ORDERS

    mt = ManifestTable(table_path)
    if batch_id in mt.load_manifest()["batches"]:
        return False
    attempt = uuid.uuid4().hex[:8]
    staging = os.path.join(table_path, "_staging", f"batch-{batch_id}-{attempt}")
    sort_cols = [c for c in SORT_ORDERS.get(table, []) if c in df.columns]
    sorted_df = df.sortWithinPartitions(*sort_cols) if sort_cols else df
    writer = sorted_df.write.mode("overwrite").partitionBy(*partition_cols)
    for k, v in BLOOM_WRITE_OPTIONS.items():
        writer = writer.option(k, v)
    writer.parquet(staging)
    rel_files = _stage_into_data(staging, mt.data_dir, f"batch-{batch_id}-{attempt}")
    stats = collect_file_stats(mt.data_dir, rel_files, stats_cols) if stats_cols else None
    return mt.commit(rel_files, batch_id=batch_id, stats=stats)


def compact_partition_manifest(
    spark: SparkSession,
    table_path: str,
    table: str,
    day: str,
    hour: int,
    target_files: int = 1,
) -> int:
    """Compact one (day, hour) partition under snapshot isolation: write
    the coalesced+sorted replacement files, then ONE manifest commit
    that swaps them in. Concurrent readers on the previous version keep
    reading the old files (deleted only by expire_snapshots); there is
    no window where the partition is absent. Returns file count after.
    """
    from ..streaming.ingest import BLOOM_WRITE_OPTIONS, SORT_ORDERS

    mt = ManifestTable(table_path)
    part_rel = os.path.join(f"date_day={day}", f"hour={hour}") + os.sep
    old = [f for f in mt.load_manifest()["files"] if f.startswith(part_rel)]
    if not old:
        return 0
    df = spark.read.option("basePath", mt.data_dir).parquet(
        *[os.path.join(mt.data_dir, f) for f in old]
    )
    sort_cols = [c for c in SORT_ORDERS.get(table, ["timestamp"]) if c in df.columns]
    attempt = uuid.uuid4().hex[:8]
    staging = os.path.join(table_path, "_staging", f"compact-{day}-{hour}-{attempt}")
    out = df.drop("date_day", "hour").repartition(target_files)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    writer = out.write.mode("overwrite")
    for k, v in BLOOM_WRITE_OPTIONS.items():
        writer = writer.option(k, v)
    writer.parquet(staging)
    # staged files land inside the existing partition directory
    part_dir = os.path.join(mt.data_dir, f"date_day={day}", f"hour={hour}")
    os.makedirs(part_dir, exist_ok=True)
    rel_files = []
    for i, n in enumerate(sorted(os.listdir(staging))):
        if not n.endswith(".parquet"):
            continue
        fname = f"compact-{attempt}-{i:05d}.parquet"
        os.replace(os.path.join(staging, n), os.path.join(part_dir, fname))
        rel_files.append(os.path.join(f"date_day={day}", f"hour={hour}", fname))
    shutil.rmtree(staging, ignore_errors=True)
    stats = collect_file_stats(mt.data_dir, rel_files, ("timestamp",))
    mt.commit(rel_files, remove_files=old, stats=stats)
    return len(rel_files)
