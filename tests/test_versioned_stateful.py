"""Model-based stateful test of the versioned-table layer: a random
sequence of lake operations must always agree with a plain Python dict
model, and every historical version must replay exactly. The model also
tracks every row's COMMIT VERSION (r9): the engine's `_commit_version`
must equal the last value-setting commit under every interleaving —
maintenance (compact/recluster/purge), layout changes, and deletes of
other rows must never perturb it, rollback must restore it.

This is the property the whole layer sells — snapshot isolation with
time travel — exercised across OPERATION INTERLEAVINGS rather than one
scenario per test. Hypothesis drives the sequences; shrinking turns any
failure into a minimal reproducing op list."""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, settings
    from hypothesis import strategies as st
    from hypothesis.stateful import (
        RuleBasedStateMachine,
        initialize,
        invariant,
        precondition,
        rule,
    )
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from pyspark.sql import functions as F

from wrtd_etl_spark.session import get_spark
from wrtd_etl_spark.sources.versioned import (
    delete_where,
    history,
    latest_version,
    merge_into,
    read_snapshot,
    rollback,
    update_where,
    write_snapshot,
)

KEYS = st.integers(min_value=0, max_value=30)
VALS = st.integers(min_value=-5, max_value=5)


class VersionedModel(RuleBasedStateMachine):
    """state: {k: v}; every committed version's expected state is kept
    so time travel can be checked as an invariant."""

    def __init__(self):
        super().__init__()
        self.spark = get_spark("wrtd-tests", cpus=8, shuffle_partitions=8)
        import tempfile

        self.table = tempfile.mkdtemp(prefix="wrtd_stateful_") + "/t"
        self.model: dict[int, int] = {}
        self.cv: dict[int, int] = {}  # k -> last value-setting version
        self.versions: list[dict[int, int]] = []
        self.cv_versions: list[dict[int, int]] = []
        # version at which the defaulted column `d` was declared (r10);
        # every row reads 7 from then on, whatever path wrote it
        self.default_since: "int | None" = None
        self.rollback_at: list[int] = []  # versions of rollback commits
        self.props: dict[str, str] = {}  # expected table properties

    def _df(self, rows):
        return self.spark.createDataFrame(
            [(k, v) for k, v in rows], "k long, v long"
        )

    def _commit(self):
        self.versions.append(dict(self.model))
        self.cv_versions.append(dict(self.cv))

    def _vnum(self):
        # the version number the NEXT commit will take
        return len(self.versions)

    @initialize(rows=st.dictionaries(KEYS, VALS, min_size=1, max_size=8))
    def init_table(self, rows):
        write_snapshot(self._df(rows.items()), self.table, stats_cols=["k"])
        self.model = dict(rows)
        self.cv = {k: 0 for k in rows}
        self._commit()

    @rule(rows=st.dictionaries(KEYS, VALS, min_size=1, max_size=6))
    def append(self, rows):
        # appends may duplicate keys already present — the layer is a
        # multiset of rows unless UNIQUE is declared; model keeps ONE
        # value per key, so only append genuinely fresh keys
        fresh = {k: v for k, v in rows.items() if k not in self.model}
        if not fresh:
            return
        vnum = self._vnum()
        write_snapshot(
            self._df(fresh.items()), self.table, mode="append"
        )
        self.model.update(fresh)
        self.cv.update({k: vnum for k in fresh})
        self._commit()

    @rule(lo=KEYS, hi=KEYS)
    def delete_range(self, lo, hi):
        lo, hi = min(lo, hi), max(lo, hi)
        delete_where(
            self.spark,
            self.table,
            (F.col("k") >= lo) & (F.col("k") <= hi),
            prune={"k": (lo, hi)},
        )
        self.model = {k: v for k, v in self.model.items() if not lo <= k <= hi}
        self.cv = {k: c for k, c in self.cv.items() if k in self.model}
        self._commit()

    @rule(lo=KEYS, hi=KEYS, dv=VALS)
    def update_range(self, lo, hi, dv):
        lo, hi = min(lo, hi), max(lo, hi)
        update_where(
            self.spark,
            self.table,
            (F.col("k") >= lo) & (F.col("k") <= hi),
            {"v": F.col("v") + dv},
            prune={"k": (lo, hi)},
        )
        vnum = self._vnum()
        for k in self.model:
            if lo <= k <= hi:
                self.model[k] += dv
                self.cv[k] = vnum  # the update SET this row's values
        self._commit()

    @rule(rows=st.dictionaries(KEYS, VALS, min_size=1, max_size=6))
    def merge(self, rows):
        merge_into(
            self.spark,
            self.table,
            self._df(rows.items()),
            ["k"],
        )
        self.model.update(rows)
        self.cv.update({k: len(self.versions) for k in rows})
        self._commit()

    @rule(lo=KEYS, hi=KEYS)
    def delete_range_dv(self, lo, hi):
        # merge-on-read twin of delete_range: vectors must be
        # indistinguishable from a rewrite at every later step,
        # including interleaved CoW ops, compaction, and rollback
        lo, hi = min(lo, hi), max(lo, hi)
        delete_where(
            self.spark,
            self.table,
            (F.col("k") >= lo) & (F.col("k") <= hi),
            prune={"k": (lo, hi)},
            strategy="dv",
        )
        self.model = {k: v for k, v in self.model.items() if not lo <= k <= hi}
        self.cv = {k: c for k, c in self.cv.items() if k in self.model}
        self._commit()

    @rule(lo=KEYS, hi=KEYS, dv=VALS)
    def update_range_dv(self, lo, hi, dv):
        lo, hi = min(lo, hi), max(lo, hi)
        update_where(
            self.spark,
            self.table,
            (F.col("k") >= lo) & (F.col("k") <= hi),
            {"v": F.col("v") + dv},
            prune={"k": (lo, hi)},
            strategy="dv",
        )
        vnum = self._vnum()
        for k in self.model:
            if lo <= k <= hi:
                self.model[k] += dv
                self.cv[k] = vnum  # the update SET this row's values
        self._commit()

    @rule(rows=st.dictionaries(KEYS, VALS, min_size=1, max_size=6))
    def merge_dv(self, rows):
        # merge-on-read twin of merge: matched rows become vector
        # positions + a fresh segment; must stay indistinguishable from
        # the CoW merge under every later interleaving (r8)
        merge_into(
            self.spark,
            self.table,
            self._df(rows.items()),
            ["k"],
            strategy="dv",
        )
        self.model.update(rows)
        self.cv.update({k: len(self.versions) for k in rows})
        self._commit()

    @rule()
    def purge_vectors(self):
        from wrtd_etl_spark.sources.versioned import reorg_purge

        v = reorg_purge(self.spark, self.table)
        if v is not None:
            self._commit()  # same rows, new version

    @rule()
    def compact_all(self):
        from wrtd_etl_spark.sources.versioned import compact

        compact(self.spark, self.table, target_files=2)
        self._commit()  # same rows, new version

    @rule()
    def compact_small(self):
        from wrtd_etl_spark.sources.versioned import compact_small_files

        v = compact_small_files(
            self.spark, self.table, small_bytes=1 << 20, target_bytes=1 << 30
        )
        if v is not None:
            self._commit()

    @rule()
    def declare_layout(self):
        from wrtd_etl_spark.sources.versioned import alter_cluster_by

        alter_cluster_by(self.table, ["k"], files=2)
        self._commit()  # metadata-only: same rows, new version

    @rule()
    def recluster_pass(self):
        # the r9 incremental re-clustering rewrite, interleaved with
        # every DV/CoW/rollback shape (no-op until a layout is declared)
        from wrtd_etl_spark.sources.versioned import recluster

        v = recluster(
            self.spark, self.table, small_bytes=1 << 20, target_bytes=1 << 30
        )
        if v is not None:
            self._commit()

    @precondition(lambda self: len(self.versions) >= 2)
    @rule(data=st.data())
    def rollback_to(self, data):
        target = data.draw(
            st.integers(min_value=0, max_value=len(self.versions) - 1)
        )
        rollback(self.table, target)
        self.model = dict(self.versions[target])
        self.cv = dict(self.cv_versions[target])
        self.rollback_at.append(self._vnum())
        if self.default_since is not None and target < self.default_since:
            self.default_since = None  # schema rolled back past the ALTER
        self._commit()

    @rule()
    def declare_default_column(self):
        # metadata-only ALTER with an initial default (r10): every row
        # — existing, appended without the column, merge-inserted,
        # CoW/MoR-rewritten — must read 7 from here on
        if not self.versions or self.default_since is not None:
            return
        from wrtd_etl_spark.sources.versioned import alter_add_column

        alter_add_column(self.spark, self.table, "d", "long", default=7)
        self.default_since = self._vnum()
        self._commit()

    @rule(n=st.integers(1, 3))
    def set_properties(self, n):
        # r12 TBLPROPERTIES: a metadata commit every other commit shape
        # must carry — rollback keeps the CURRENT policy (config is not
        # data), which the invariant below checks across every lineage
        if not self.versions:
            return
        from wrtd_etl_spark.sources.versioned import set_table_properties

        props = {f"p{n}": str(n), "maintain.max_files": str(500 + n)}
        set_table_properties(self.table, props)
        self.props.update(props)
        self._commit()

    @rule()
    def analyze_backfill(self):
        # r12 ANALYZE: stats/bloom backfill is row-invisible — it may
        # commit (when some file lacked v-stats or k-blooms) or no-op,
        # and every other invariant (CDC fold, sync, time travel, cv)
        # must hold straight through the sidecar swap
        if not self.versions:
            return
        from wrtd_etl_spark.sources.versioned import collect_statistics

        v = collect_statistics(
            self.spark, self.table, stats_cols=["v"], bloom_cols=["k"]
        )
        if v is not None:
            self._commit()

    @invariant()
    def properties_match_model(self):
        if not self.versions:
            return
        from wrtd_etl_spark.sources.versioned import table_properties

        assert table_properties(self.table) == self.props

    @invariant()
    def latest_matches_model(self):
        if not self.versions:
            return
        rows = read_snapshot(
            self.spark, self.table, with_commit_versions=True
        ).collect()
        assert {r.k: r.v for r in rows} == self.model
        assert {r.k: r._commit_version for r in rows} == self.cv
        assert latest_version(self.table) == len(self.versions) - 1
        if self.default_since is not None:
            # no rule ever writes `d` explicitly, so EVERY row must
            # surface the declared default through every DML/rewrite
            # lineage the steps composed
            assert all(r.d == 7 for r in rows), {
                r.k: r.d for r in rows if r.d != 7
            }

    @invariant()
    def cdc_fold_reaches_latest(self):
        # r9 row tracking: folding table_changes(mid → latest) onto the
        # mid snapshot must reproduce the latest state — whichever path
        # the range takes (keyed row-id diff across compact/purge/DV/
        # CoW lineages, physical delta, or the exceptAll fallback after
        # a rollback). One probe per step, same budget rationale as
        # a_past_version_replays.
        if len(self.versions) < 2:
            return
        from wrtd_etl_spark.sources.versioned import table_changes

        v = len(self.versions) // 2
        rows = [
            (r.k, r.v, r._change_type)
            for r in table_changes(
                self.spark, self.table, v, len(self.versions) - 1
            ).collect()
        ]
        folded = dict(self.versions[v])
        for k, val, ct in sorted(rows, key=lambda x: x[2] == "insert"):
            if ct == "delete":
                assert folded.pop(k) == val, (k, val)
            else:
                folded[k] = val
        assert folded == self.model, f"CDC fold v{v}→latest diverged"

    @invariant()
    def changed_rows_since_prunes_exactly(self):
        # r10 sub-segment cv sync: whatever lineage the steps built
        # (DV/CoW DML, compaction, recluster, rollback), the pruned
        # incremental read must surface exactly the live rows whose
        # value-setting version passes the bound — segment, file, and
        # row-group pruning may drop I/O but never rows.
        if len(self.versions) < 2:
            return
        from wrtd_etl_spark.sources.versioned import changed_rows_since

        v = len(self.versions) // 2
        got = {
            (r.k, r.v, r._commit_version)
            for r in changed_rows_since(
                self.spark, self.table, since_version=v
            ).collect()
        }
        want = {
            (k, self.model[k], cv) for k, cv in self.cv.items() if cv > v
        }
        assert got == want, f"changed_rows_since(v{v}) diverged"

    @invariant()
    def sync_changes_reproduces_latest(self):
        # r11 one-call sync: (upserts merged by key) + (deleted keys
        # removed) applied to the mid snapshot must equal the latest —
        # under every interleaving of CoW/DV DML, maintenance churn,
        # layout changes, and rollback. This is the consumer contract
        # sync_changes sells; the deleted side must also never name a
        # key that still lives.
        if len(self.versions) < 2:
            return
        from wrtd_etl_spark.sources.versioned import sync_changes

        v = len(self.versions) // 2
        if any(rv > v for rv in self.rollback_at):
            # a rollback inside the range can resurrect a row whose
            # commit version predates the bound — sync_changes must
            # REFUSE (and must never refuse otherwise: the else branch
            # below proves every rollback-free range syncs), and the
            # r12 full_diff fallback must make the SAME fold contract
            # total across the resurrect
            with pytest.raises(ValueError, match="cannot cover"):
                sync_changes(self.spark, self.table, v, keys=["k"])
            upserts, deleted = sync_changes(
                self.spark, self.table, v, keys=["k"], full_diff=True
            )
            folded = dict(self.versions[v])
            for r in upserts.collect():
                folded[r.k] = r.v
            for r in deleted.collect():
                folded.pop(r.k, None)
                assert r.k not in self.model, (
                    f"full_diff sync(v{v}) reported live key {r.k}"
                )
            assert folded == self.model, (
                f"full_diff sync fold v{v} diverged"
            )
            return
        upserts, deleted = sync_changes(
            self.spark, self.table, v, keys=["k"]
        )
        folded = dict(self.versions[v])
        for r in upserts.collect():
            folded[r.k] = r.v
        for r in deleted.collect():
            folded.pop(r.k, None)
            assert r.k not in self.model, (
                f"sync_changes(v{v}) reported live key {r.k} as deleted"
            )
        assert folded == self.model, f"sync_changes fold v{v} diverged"

    @invariant()
    def a_past_version_replays(self):
        if len(self.versions) < 2:
            return
        # checking every version every step is O(n^2) collects; probe
        # the middle one — across examples this covers the space
        v = len(self.versions) // 2
        got = {
            r.k: r.v
            for r in read_snapshot(
                self.spark, self.table, version=v
            ).collect()
        }
        assert got == self.versions[v], f"time travel to v{v} diverged"


VersionedModel.TestCase.settings = settings(
    max_examples=12,
    stateful_step_count=8,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
TestVersionedModel = VersionedModel.TestCase
