"""Kill-point matrix for the compaction publish window (r5, VERDICT
item 3): a process dying anywhere inside ``_compact_locked``'s swap —
intent write → rename(base→stash) → rename(tmp→base) →
rename(stash→trash) → rmtree(trash) → log GC → meta commit → intent
removal — must leave a table that the next
``TableStore`` open repairs to a consistent state: either the exact
pre-compaction contents (rollback) or the exact post-compaction contents
(roll-forward), never a missing/empty base, dangling stash, half-GC'd
log, or stale ``compact-*`` tmp dir.

One state is exercised with a REAL ``SIGKILL`` in a subprocess (the
between-renames window the r4 verdict called out); the other three are
induced in-process by raising at the same code points — an unhandled
exception abandons the window with the identical on-disk state a kill
would, without a 20 s Spark boot per state.
"""

import json
import os
import shutil
import signal
import subprocess
import sys

import pytest

from opentick_spark.catalog import Catalog
from opentick_spark.table import TableStore, fcntl

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ROWS = [(i, i * 10) for i in range(1, 8)]


@pytest.fixture()
def table(spark, tmp_path):
    from opentick_spark.engine import Engine

    wh = str(tmp_path / "wh")
    eng = Engine(spark, wh)
    eng.execute("create database cr")
    eng.use("cr")
    eng.execute("create table t(a int, v int, primary key(a))")
    for a, v in ROWS:
        eng.execute(f"insert into t(a, v) values({a}, {v})")
    return eng, wh


def _contents(spark, wh):
    store = TableStore(Catalog(wh), "cr", "t")  # fresh open -> recovery
    df = store.read(spark)
    return sorted((r["a"], r["v"]) for r in df.select("a", "v").collect())


def _assert_clean(wh):
    store_path = Catalog(wh).table_path("cr", "t")
    leftovers = [
        e
        for e in os.listdir(store_path)
        if e.startswith("compact-") or e.endswith(".old")
    ]
    assert leftovers == [], leftovers
    assert not os.path.exists(
        os.path.join(store_path, "data", "base.old")
    )


class _Boom(RuntimeError):
    pass


def _crash_compact(spark, wh, monkeypatch, point):
    """Run compact() on a fresh store, aborting at the named point."""
    store = TableStore(Catalog(wh), "cr", "t")
    if point == "after-intent":
        real = os.replace

        def patched(src, dst):
            real(src, dst)
            if dst.endswith("compact-intent.json"):
                raise _Boom

        monkeypatch.setattr(os, "replace", patched)
    elif point == "before-stash-disposal":
        real_mv = os.rename

        def patched(src, dst):
            if src == store.base_path + ".old":
                raise _Boom
            return real_mv(src, dst)

        monkeypatch.setattr(os, "rename", patched)
    elif point == "mid-trash-rmtree":
        real_rm = shutil.rmtree

        def patched(p, *a, **k):
            if "compact-trash-" in os.path.basename(p):
                # delete one file, then die: a PARTIAL trash dir — the
                # state that, pre-r6, existed under the name base.old
                # and was silently "restored" as a truncated base
                for root, _dirs, files in os.walk(p):
                    if files:
                        os.remove(os.path.join(root, files[0]))
                        break
                raise _Boom
            return real_rm(p, *a, **k)

        monkeypatch.setattr(shutil, "rmtree", patched)
    elif point == "during-log-gc":
        real_remove = os.remove

        def patched(p):
            if p.startswith(store.log_path):
                raise _Boom
            return real_remove(p)

        monkeypatch.setattr(os, "remove", patched)
    else:
        raise AssertionError(point)
    with pytest.raises(_Boom):
        store.compact(spark)
    monkeypatch.undo()
    return store


def test_crash_after_intent_rolls_back(spark, table, monkeypatch):
    # killed before the first rename: base untouched; intent + tmp must
    # be GC'd and contents stay pre-compaction
    _eng, wh = table
    _crash_compact(spark, wh, monkeypatch, "after-intent")
    assert _contents(spark, wh) == ROWS
    _assert_clean(wh)
    # and the table still compacts cleanly afterwards
    TableStore(Catalog(wh), "cr", "t").compact(spark)
    assert _contents(spark, wh) == ROWS


def test_crash_before_stash_disposal_rolls_forward(spark, table, monkeypatch):
    # killed after the new base is installed but before the stash is
    # moved to trash: the new base is COMPLETE and the stash intact, so
    # recovery rolls FORWARD (r6; pre-r6 this rolled back — safe but
    # wasteful — and the rename-before-rmtree protocol that prevents
    # partial-stash restores makes forward the cheap correct choice)
    _eng, wh = table
    store = _crash_compact(spark, wh, monkeypatch, "before-stash-disposal")
    assert os.path.isdir(store.base_path + ".old")  # crash state on disk
    assert os.path.isdir(store.base_path)  # new base fully installed
    assert _contents(spark, wh) == ROWS
    _assert_clean(wh)
    fresh = TableStore(Catalog(wh), "cr", "t")
    assert os.listdir(fresh.log_path) == []  # roll-forward finished GC
    meta = fresh._meta()
    assert meta["compacted"] is True
    assert meta["last_compact_seq"] == meta["seq"]


def test_crash_mid_trash_rmtree_is_gcd(spark, table, monkeypatch):
    # THE r5-advice data-loss hole: a kill mid-rmtree of the old base.
    # Pre-r6 the half-deleted dir was still named base.old, so recovery
    # "restored" a TRUNCATED base over the complete new one, silently
    # losing rows. Now the old base is atomically renamed to
    # compact-trash-* first, so the partial dir is plain-GC'd and the
    # installed new base survives with every row.
    _eng, wh = table
    store = _crash_compact(spark, wh, monkeypatch, "mid-trash-rmtree")
    trash = [
        e
        for e in os.listdir(store.path)
        if e.startswith("compact-trash-")
    ]
    assert trash  # crash state: partial trash dir on disk
    assert not os.path.isdir(store.base_path + ".old")  # never ambiguous
    assert _contents(spark, wh) == ROWS  # zero rows lost
    _assert_clean(wh)
    fresh = TableStore(Catalog(wh), "cr", "t")
    assert os.listdir(fresh.log_path) == []
    assert fresh._meta()["compacted"] is True


def test_crash_during_log_gc_rolls_forward(spark, table, monkeypatch):
    # killed mid log GC: old base and stash are gone, the new base is
    # fully installed — recovery must FINISH the job (log GC + meta)
    _eng, wh = table
    store = _crash_compact(spark, wh, monkeypatch, "during-log-gc")
    assert os.listdir(store.log_path)  # crash state: log half-present
    assert _contents(spark, wh) == ROWS
    _assert_clean(wh)
    fresh = TableStore(Catalog(wh), "cr", "t")
    assert os.listdir(fresh.log_path) == []  # roll-forward finished GC
    meta = fresh._meta()
    assert meta["compacted"] is True
    assert meta["last_compact_seq"] == meta["seq"]
    # post-recovery writes keep working with non-colliding seqs
    _eng2 = __import__("opentick_spark.engine", fromlist=["Engine"]).Engine(
        spark, wh
    )
    _eng2.use("cr")
    _eng2.execute("insert into t(a, v) values(99, 990)")
    assert _contents(spark, wh) == ROWS + [(99, 990)]


def test_orphan_tmp_dir_is_gcd(spark, table):
    # a compactor killed during the parquet write leaves compact-<uuid>
    # with no intent: plain GC on open
    _eng, wh = table
    store_path = Catalog(wh).table_path("cr", "t")
    orphan = os.path.join(store_path, "compact-deadbeef")
    os.makedirs(os.path.join(orphan, "part"))
    assert _contents(spark, wh) == ROWS
    assert not os.path.exists(orphan)


@pytest.mark.skipif(fcntl is None, reason="no fcntl on this platform")
def test_sigkill_between_renames_recovers(spark, table):
    """THE r4-verdict crash window, with a genuine SIGKILL: the process
    dies after rename(base -> base.old) with NO base directory at all.
    Before r5 the next open would makedirs() an empty base and present
    the compacted-away rows as lost; now recovery restores the stash."""
    _eng, wh = table
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tests", "_compact_killer.py"),
            wh,
            "cr",
            "t",
            "between-renames",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == -signal.SIGKILL, (
        proc.returncode,
        proc.stdout[-2000:],
        proc.stderr[-2000:],
    )
    assert "COMPACT_FINISHED_WITHOUT_KILL" not in proc.stdout
    store_path = Catalog(wh).table_path("cr", "t")
    # verify the crash state really is the no-base window before recovery
    assert not os.path.isdir(os.path.join(store_path, "data", "base"))
    assert os.path.isdir(os.path.join(store_path, "data", "base.old"))
    assert os.path.exists(os.path.join(store_path, "compact-intent.json"))
    with open(os.path.join(store_path, "compact-intent.json")) as f:
        assert sorted(json.load(f)) == [
            "applied_markers",
            "bucket_hash_class",
            "consumed_log",
            "hash_buckets",
            "seq",
            "tmp",
        ]
    # fresh open repairs it: full pre-compaction contents, clean dir
    assert _contents(spark, wh) == ROWS
    _assert_clean(wh)
    # and a later compaction completes normally
    TableStore(Catalog(wh), "cr", "t").compact(spark)
    assert _contents(spark, wh) == ROWS


def test_engine_open_triggers_recovery(spark, table):
    """Recovery must fire through the ENGINE path too — a fresh process
    opening a crashed warehouse goes Engine.store -> TableStore.__init__,
    not a direct TableStore construction."""
    from opentick_spark.engine import Engine

    _eng, wh = table
    store_path = Catalog(wh).table_path("cr", "t")
    data = os.path.join(store_path, "data")
    # hand-build the mid-swap crash state (state 2: killed between the
    # renames): stash present, no base, intent recorded
    with open(os.path.join(store_path, "compact-intent.json"), "w") as f:
        json.dump(
            {"seq": 99, "tmp": "compact-gone", "hash_buckets": None,
             "consumed_log": []},
            f,
        )
    os.rename(os.path.join(data, "base"), os.path.join(data, "base.old"))
    fresh = Engine(spark, wh)
    fresh.use("cr")
    got = sorted(tuple(r) for r in fresh.execute_rows("select * from t"))
    assert got == ROWS
    _assert_clean(wh)


def test_roll_forward_folds_intent_markers(spark, table):
    """r10: a compactor killed AFTER the base swap + log GC of the
    marker-bearing commits but BEFORE the meta commit leaves those
    applied markers in NEITHER meta nor any live commit — the intent
    file carries them, and recovery's roll-forward must fold them into
    meta so has_applied_marker keeps answering True for commits that
    published before the crash. (A MID-SWAP crash instead ROLLS BACK,
    and there the markers still live in the untouched log sidecars —
    rollback correctly ignores the intent's copy.)"""
    eng, wh = table
    store_path = Catalog(wh).table_path("cr", "t")
    # hand-build the roll-forward state: new base fully installed (the
    # real base stands in), stash disposed, tmp gone, consumed log
    # already GC'd (empty list keeps _contents() intact) — only the
    # intent (with the marker copies) remains
    with open(os.path.join(store_path, "compact-intent.json"), "w") as f:
        json.dump(
            {
                "seq": 99,
                "tmp": "compact-gone",
                "hash_buckets": None,
                "consumed_log": [],
                "applied_markers": ["stream-x:0", "stream-x:1"],
            },
            f,
        )
    fresh = TableStore(Catalog(wh), "cr", "t")  # open -> recovery
    assert fresh.has_applied_marker("stream-x:0")
    assert fresh.has_applied_marker("stream-x:1")
    assert not fresh.has_applied_marker("stream-x:2")
    assert fresh._meta()["seq"] == 99  # roll-forward finished the meta
    assert _contents(spark, wh) == ROWS
    _assert_clean(wh)
