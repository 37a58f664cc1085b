"""Stateful adversary for the manifest lifecycle (Hypothesis
RuleBasedStateMachine): random interleavings of commit / idempotent
replay / compaction / snapshot expiry / retention-style removal /
crashed-writer staging / orphan sweeps — asserting the no-dup/no-loss
invariant after EVERY step. The hot-store analog of this machine
(test_properties.py) caught two real bugs in two rounds; the manifest's
snapshot-isolation + reclamation surface is at least as
interleaving-sensitive (reference lineage: Iceberg snapshot semantics,
src/compactor/src/retention/ + orphan/).

No Spark: ManifestTable is pure-filesystem, so "data files" are row
tokens in text files named *.parquet — the machine checks LOGICAL row
multisets, exactly the property a reader cares about, at thousands of
steps per second instead of Spark-job latency.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile
from concurrent.futures import ThreadPoolExecutor

from hypothesis import settings
from hypothesis import strategies as st
from hypothesis.stateful import RuleBasedStateMachine, invariant, rule

from signaldb_spark.maintenance.jobs import cleanup_orphans
from signaldb_spark.storage.manifest import ManifestTable

AGED = dt.datetime.now(dt.timezone.utc) + dt.timedelta(hours=1)


class ManifestLifecycle(RuleBasedStateMachine):
    def __init__(self):
        super().__init__()
        self.dir = tempfile.mkdtemp(prefix="manifest-life-")
        self.mt = ManifestTable(self.dir)
        os.makedirs(self.mt.data_dir, exist_ok=True)
        self.rows: list[str] = []  # expected CURRENT logical content
        self.staged: set[str] = set()  # crashed-writer files, uncommitted
        self.committed_batches: list[int] = []
        self._file_seq = 0
        self._batch_seq = 0
        self._row_seq = 0
        self._op_seq = 0

    def teardown(self):
        shutil.rmtree(self.dir, ignore_errors=True)

    # ------------------------------------------------------------ helpers

    def _write_file(self, rows: list[str]) -> str:
        rel = os.path.join(f"day={self._file_seq % 3}",
                           f"f{self._file_seq:06d}.parquet")
        self._file_seq += 1
        path = os.path.join(self.mt.data_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            fh.write("\n".join(rows))
        return rel

    def _next_op(self) -> int:
        self._op_seq += 1
        return self._op_seq

    def _current_rows(self) -> list[str]:
        out = []
        for f in self.mt.files():
            with open(f) as fh:
                out.extend(x for x in fh.read().split("\n") if x)
        return out

    # --------------------------------------------------------------- rules

    @rule(nfiles=st.integers(1, 3), rows_per_file=st.integers(1, 3))
    def commit_batch(self, nfiles, rows_per_file):
        bid = self._batch_seq
        self._batch_seq += 1
        adds = []
        for _ in range(nfiles):
            rows = [f"b{bid}r{self._row_seq + i}" for i in range(rows_per_file)]
            self._row_seq += rows_per_file
            adds.append(self._write_file(rows))
            self.rows.extend(rows)
        assert self.mt.commit(adds, batch_id=bid) is True
        self.committed_batches.append(bid)

    @rule(data=st.data())
    def idempotent_replay(self, data):
        """Re-committing a seen batch_id — even with a DIFFERENT file
        list, the crashed-retry shape — must be a no-op; the decoy file
        it staged becomes an orphan for the sweep."""
        if not self.committed_batches:
            return
        bid = data.draw(st.sampled_from(self.committed_batches))
        decoy = self._write_file([f"replay-dup-{bid}"])
        assert self.mt.commit([decoy], batch_id=bid) is False
        self.staged.add(decoy)

    @rule()
    def concurrent_commits(self):
        """Four writers race distinct batches through the optimistic
        CAS loop at once; every one must land exactly once."""
        bids = list(range(self._batch_seq, self._batch_seq + 4))
        self._batch_seq += 4
        adds = {}
        for bid in bids:
            rows = [f"b{bid}r{self._row_seq}"]
            self._row_seq += 1
            adds[bid] = (self._write_file(rows), rows)
        with ThreadPoolExecutor(max_workers=4) as ex:
            results = list(
                ex.map(lambda b: self.mt.commit([adds[b][0]], batch_id=b), bids)
            )
        assert all(results)
        for bid in bids:
            self.rows.extend(adds[bid][1])
            self.committed_batches.append(bid)

    @rule()
    def compact_current(self):
        """Rewrite every current file into one, preserving rows, under
        snapshot isolation (old manifests keep referencing the replaced
        files until expiry)."""
        cur = self.mt.load_manifest()["files"]
        if len(cur) < 2:
            return
        rows = self._current_rows()
        merged = self._write_file(rows)
        assert self.mt.commit([merged], remove_files=cur,
                              batch_id=f"compact-{self._next_op()}") is True

    @rule(data=st.data())
    def retention_drop(self, data):
        """Remove a random current file via one snapshot commit (the
        retention shape: readers of old snapshots stay whole, bytes die
        at expiry)."""
        cur = self.mt.load_manifest()["files"]
        if not cur:
            return
        victim = data.draw(st.sampled_from(sorted(cur)))
        with open(os.path.join(self.mt.data_dir, victim)) as fh:
            gone = [x for x in fh.read().split("\n") if x]
        assert self.mt.commit([], remove_files=[victim],
                              batch_id=f"retention-{self._next_op()}") is True
        for r in gone:
            self.rows.remove(r)

    @rule(keep=st.integers(1, 3))
    def expire_snapshots(self, keep):
        """Expiry kills old manifests + their exclusive files; the
        current snapshot's answer must not move."""
        before = sorted(self._current_rows())
        self.mt.expire_snapshots(keep_last=keep)
        assert sorted(self._current_rows()) == before

    @rule()
    def crashed_writer_stages_file(self):
        self.staged.add(self._write_file([f"crashed-{self._file_seq}"]))

    @rule()
    def orphan_sweep_inside_grace(self):
        """A sweep inside the grace window must delete NOTHING — the
        staged files may be a slow writer's about-to-commit batch (the
        lost-staged-file hazard)."""
        deleted = cleanup_orphans(self.dir, grace_seconds=1e9)
        assert deleted == []
        for rel in self.staged:
            assert os.path.exists(os.path.join(self.mt.data_dir, rel))

    @rule()
    def orphan_sweep_aged(self):
        """Past the grace window, exactly the unreferenced files die:
        staged/crashed files go, files still referenced by ANY retained
        manifest (time travel) survive. A path with NO committed
        manifest is not a manifest table yet — the sweep must refuse to
        delete anything there (the files may be a first batch being
        staged), so the model expects nothing until the first commit."""
        expected = self.staged if self.mt.versions() else set()
        deleted = set(cleanup_orphans(self.dir, grace_seconds=0.0, now=AGED))
        assert deleted == expected, (deleted, expected)
        self.staged -= deleted

    # ----------------------------------------------------------- invariant

    @invariant()
    def no_dup_no_loss(self):
        """After EVERY step: the current snapshot's logical rows are
        exactly the model's — nothing lost to expiry/compaction/sweeps,
        nothing duplicated by replays/races — and no staged
        (uncommitted) file is ever visible to a reader."""
        assert sorted(self._current_rows()) == sorted(self.rows)
        visible = {os.path.relpath(f, self.mt.data_dir) for f in self.mt.files()}
        assert not (visible & self.staged)

    @invariant()
    def lineage_is_append_only(self):
        """Every committed batch id stays in the lineage (the
        idempotent-replay guard can never forget history)."""
        lineage = set(self.mt.load_manifest()["batches"])
        assert set(self.committed_batches) <= lineage


ManifestLifecycle.TestCase.settings = settings(
    max_examples=20, stateful_step_count=30, deadline=None,
)
TestManifestLifecycle = ManifestLifecycle.TestCase
