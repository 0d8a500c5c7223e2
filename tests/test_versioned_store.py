"""Versioned store (commit log + time travel): operators/versioned_store.py.

Scale contract under test: append commits write only the delta (previous data
dirs carried by reference), the exclusive manifest link is the commit point (a
crash before it leaves the store unchanged; a racing commit to the same version
errors instead of silently replacing the winner), and vacuum reclaims exactly
the unreferenced dirs outside the retention window."""

from __future__ import annotations

import os

import pytest

from photo_vector_search_spark.operators.versioned_store import (
    VersionedStoreError,
    commit_append,
    commit_overwrite,
    commit_rewrite,
    history,
    latest_version,
    read_version,
    vacuum,
)


@pytest.fixture()
def store_path(tmp_path):
    return str(tmp_path / "vstore")


def _df(spark, ids):
    return spark.createDataFrame([(i, f"doc-{i}") for i in ids], "id int, text string")


def _ids(df):
    return sorted(r.id for r in df.select("id").collect())


def test_overwrite_append_time_travel(spark, store_path):
    assert latest_version(store_path) is None
    v0 = commit_overwrite(_df(spark, range(5)), store_path)
    v1 = commit_append(_df(spark, range(5, 8)), store_path)
    assert (v0, v1) == (0, 1)
    assert _ids(read_version(spark, store_path)) == list(range(8))
    assert _ids(read_version(spark, store_path, version=0)) == list(range(5))
    h = history(store_path)
    assert [(e["version"], e["op"], e["n_rows"]) for e in h] == [
        (1, "append", 8),
        (0, "overwrite", 5),
    ]
    # append carried v0's dir by reference: v1 lists two dirs, wrote one
    assert h[0]["n_dirs"] == 2


def test_append_is_delta_write_not_rewrite(spark, store_path):
    commit_overwrite(_df(spark, range(100)), store_path)
    data = os.path.join(store_path, "data")
    dirs_before = set(os.listdir(data))
    commit_append(_df(spark, range(100, 103)), store_path)
    new_dirs = set(os.listdir(data)) - dirs_before
    assert len(new_dirs) == 1
    # the delta dir holds only the 3 appended rows
    delta = spark.read.parquet(os.path.join(data, new_dirs.pop()))
    assert delta.count() == 3


def test_rewrite_names_op_and_replaces_state(spark, store_path):
    commit_overwrite(_df(spark, range(10)), store_path)
    kept = _df(spark, range(10)).filter("id < 4")
    v = commit_rewrite(kept, store_path, op="delete")
    assert _ids(read_version(spark, store_path)) == [0, 1, 2, 3]
    assert _ids(read_version(spark, store_path, version=0)) == list(range(10))
    assert history(store_path)[0]["op"] == "delete"
    assert v == 1


def test_crashed_commit_is_invisible_and_vacuumed(spark, store_path):
    commit_overwrite(_df(spark, range(4)), store_path)
    # simulate a crash AFTER data write, BEFORE manifest rename: orphan data dir
    orphan = os.path.join(store_path, "data", "deadbeef" * 4)
    _df(spark, range(100, 200)).write.parquet(orphan)
    assert _ids(read_version(spark, store_path)) == [0, 1, 2, 3]  # reader blind to it
    # inside the retention window the orphan might be an in-flight commit's
    # data dir — vacuum must leave it alone
    assert orphan not in vacuum(store_path, keep_last=1)
    assert os.path.exists(orphan)
    removed = vacuum(store_path, keep_last=1, min_age_seconds=0)
    assert orphan in removed
    assert not os.path.exists(orphan)
    assert _ids(read_version(spark, store_path)) == [0, 1, 2, 3]


def test_vacuum_reclaims_old_versions_only(spark, store_path):
    commit_overwrite(_df(spark, range(5)), store_path)
    commit_rewrite(_df(spark, range(5, 9)), store_path)  # v1 references only new dir
    commit_append(_df(spark, range(9, 10)), store_path)  # v2 = v1 dirs + delta
    removed = vacuum(store_path, keep_last=2, min_age_seconds=0)
    # v0's manifest and its now-unreferenced dir are gone; v1+v2 readable
    assert any(r.endswith("00000000.json") for r in removed)
    with pytest.raises(VersionedStoreError):
        read_version(spark, store_path, version=0)
    assert _ids(read_version(spark, store_path, version=1)) == [5, 6, 7, 8]
    assert _ids(read_version(spark, store_path, version=2)) == [5, 6, 7, 8, 9]
    # data dirs on disk == dirs referenced by kept manifests (orphan-free)
    data = os.path.join(store_path, "data")
    assert len(os.listdir(data)) == 2  # v1's rewrite dir + v2's append delta


def test_vacuum_never_drops_live_version(store_path):
    with pytest.raises(ValueError):
        vacuum(store_path, keep_last=0)


def test_lost_commit_race_errors_and_preserves_winner(spark, store_path):
    """Two writers racing to the same version: the loser's commit must RAISE —
    never silently replace the winner's manifest (os.link is exclusive where
    os.rename is not)."""
    commit_overwrite(_df(spark, range(3)), store_path)
    # pre-create version 1's manifest: the state a winner leaves behind in the
    # window between the loser's version computation and its link
    winner = commit_append(_df(spark, range(3, 5)), store_path)
    assert winner == 1
    import photo_vector_search_spark.operators.versioned_store as vs

    real_latest = vs.latest_version
    try:  # loser computed its version before the winner's link landed
        vs.latest_version = lambda p: 0
        with pytest.raises(VersionedStoreError, match="lost commit race"):
            commit_append(_df(spark, range(90, 92)), store_path)
    finally:
        vs.latest_version = real_latest
    # the winner's manifest and rows are intact; loser's data dir is an orphan
    assert _ids(read_version(spark, store_path, version=1)) == [0, 1, 2, 3, 4]
    assert latest_version(store_path) == 1
    # no crashed manifest tempfiles linger after the raise
    log = os.path.join(store_path, "_log")
    assert not [n for n in os.listdir(log) if n.startswith("._commit_")]


def test_two_racing_appends_both_land_linearly(spark, store_path, monkeypatch):
    """The round-3 lost-update hazard (ADVICE r3): a winner commits BETWEEN the
    loser's manifest read and its link. With base-version pinning the loser's
    link collides; the retry merges on top of the winner. Both commits land,
    the log is linear, and vacuum leaks no orphan (the loser's data dir was
    written once and reused by the retry)."""
    import photo_vector_search_spark.operators.versioned_store as vs

    commit_overwrite(_df(spark, range(3)), store_path)  # v0

    real_commit = vs._commit
    state = {"injected": False}

    def racing_commit(path, op, live, n_rows, base_version):
        if not state["injected"]:
            state["injected"] = True
            # the winner lands in the loser's read→link window (re-enters this
            # wrapper with injected=True, so it commits for real)
            commit_append(_df(spark, [100, 101]), path)
        return real_commit(path, op, live, n_rows, base_version)

    monkeypatch.setattr(vs, "_commit", racing_commit)
    loser_version = commit_append(_df(spark, [200, 201, 202]), store_path)
    monkeypatch.undo()

    # both appends landed, in a linear order, neither dropping the other
    assert loser_version == 2
    assert latest_version(store_path) == 2
    assert _ids(read_version(spark, store_path)) == [0, 1, 2, 100, 101, 200, 201, 202]
    h = history(store_path)
    assert [(e["version"], e["op"], e["n_rows"]) for e in h] == [
        (2, "append", 8),
        (1, "append", 5),
        (0, "overwrite", 3),
    ]
    # no orphan leak: after vacuum, disk holds exactly v2's referenced dirs
    vacuum(store_path, keep_last=1, min_age_seconds=0)
    data = os.path.join(store_path, "data")
    assert len(os.listdir(data)) == 3  # base + winner delta + loser delta
    assert _ids(read_version(spark, store_path)) == [0, 1, 2, 100, 101, 200, 201, 202]


def test_rewrite_surfaces_conflict_instead_of_retrying(spark, store_path, monkeypatch):
    """rewrite is read-modify-write: an intervening commit must surface as an
    error (retrying would silently discard that commit's effect)."""
    import photo_vector_search_spark.operators.versioned_store as vs

    commit_overwrite(_df(spark, range(6)), store_path)

    real_commit = vs._commit
    state = {"injected": False}

    def racing_commit(path, op, live, n_rows, base_version):
        if not state["injected"]:
            state["injected"] = True
            commit_append(_df(spark, [300]), path)
        return real_commit(path, op, live, n_rows, base_version)

    monkeypatch.setattr(vs, "_commit", racing_commit)
    with pytest.raises(VersionedStoreError, match="lost commit race"):
        commit_rewrite(_df(spark, range(3)), store_path, op="delete")
    monkeypatch.undo()
    # the intervening append is the surviving latest state
    assert _ids(read_version(spark, store_path)) == [0, 1, 2, 3, 4, 5, 300]


def test_read_errors_are_actionable(spark, store_path):
    with pytest.raises(VersionedStoreError, match="no commits"):
        read_version(spark, store_path)
    commit_overwrite(_df(spark, range(2)), store_path)
    with pytest.raises(VersionedStoreError, match="version 7 not found"):
        read_version(spark, store_path, version=7)


def test_vacuum_retention_protects_in_retention_reader(spark, store_path):
    """VERDICT r4 #6: a reader time-traveling to version N must survive a
    concurrent vacuum while N is inside the retention window — the guard keeps
    N's manifest AND its referenced dirs even when keep_last would drop them.
    The reader's contract is 'finish (or re-pin) within the window', Delta's
    versionAsOf semantics."""
    commit_overwrite(_df(spark, range(5)), store_path)           # v0
    commit_rewrite(_df(spark, range(5, 9)), store_path)          # v1
    commit_append(_df(spark, range(9, 11)), store_path)          # v2

    reader = read_version(spark, store_path, version=0)  # pinned, NOT collected

    # vacuum mid-read with a live retention window: v0 was committed seconds
    # ago, so it is protected in full — nothing the reader's plan lists moves
    removed = vacuum(store_path, keep_last=1, min_age_seconds=3600)
    assert not any(r.endswith("00000000.json") for r in removed)
    assert _ids(reader) == [0, 1, 2, 3, 4]  # the mid-vacuum read succeeds
    assert _ids(read_version(spark, store_path, version=0)) == [0, 1, 2, 3, 4]

    # once aged out of retention, the same vacuum reclaims v0 and v1
    removed = vacuum(store_path, keep_last=1, min_age_seconds=0)
    assert any(r.endswith("00000000.json") for r in removed)
    with pytest.raises(VersionedStoreError):
        read_version(spark, store_path, version=0)
    assert _ids(read_version(spark, store_path)) == [5, 6, 7, 8, 9, 10]


def test_diff_versions_cdc(spark, store_path):
    """CDC between versions: inserts/updates carry new values, deletes the
    retracted old row, unchanged keys are absent; bad schemas/keys error."""
    from photo_vector_search_spark.operators.versioned_store import diff_versions

    v1 = commit_overwrite(_df(spark, [1, 2, 3]), store_path)
    changed = spark.createDataFrame(
        [(2, "doc-2"), (3, "doc-3-EDITED"), (4, "doc-4")], "id int, text string"
    )
    v2 = commit_rewrite(changed, store_path)

    got = {
        r["id"]: (r["change_type"], r["text"])
        for r in diff_versions(spark, store_path, v1, v2, ["id"]).collect()
    }
    assert got == {
        1: ("delete", "doc-1"),
        3: ("update", "doc-3-EDITED"),
        4: ("insert", "doc-4"),
    }
    # symmetric direction flips the roles
    rev = {
        r["id"]: r["change_type"]
        for r in diff_versions(spark, store_path, v2, v1, ["id"]).collect()
    }
    assert rev == {1: "insert", 3: "update", 4: "delete"}
    # self-diff is empty
    assert diff_versions(spark, store_path, v2, v2, ["id"]).count() == 0
    with pytest.raises(VersionedStoreError, match="key columns"):
        diff_versions(spark, store_path, v1, v2, ["nope"])


def test_diff_versions_null_key_not_phantom(spark, store_path):
    """An unchanged row whose KEY is NULL must not appear as a phantom
    delete+insert pair (null-safe key join, r5 second review); a changed
    NULL-key row surfaces as a single update."""
    from photo_vector_search_spark.operators.versioned_store import diff_versions

    v1 = commit_overwrite(
        spark.createDataFrame([(None, "x"), (1, "a")], "id int, text string"),
        store_path,
    )
    v2 = commit_rewrite(
        spark.createDataFrame([(None, "x"), (1, "b")], "id int, text string"),
        store_path,
    )
    got = [
        (r["id"], r["change_type"], r["text"])
        for r in diff_versions(spark, store_path, v1, v2, ["id"]).collect()
    ]
    assert got == [(1, "update", "b")]

    v3 = commit_rewrite(
        spark.createDataFrame([(None, "y"), (1, "b")], "id int, text string"),
        store_path,
    )
    got2 = [
        (r["id"], r["change_type"], r["text"])
        for r in diff_versions(spark, store_path, v2, v3, ["id"]).collect()
    ]
    assert got2 == [(None, "update", "y")]


def test_diff_versions_separator_shift_not_missed(spark, store_path):
    """The review's collision case: values shifting across columns
    ('x\\x1fy','z') -> ('x','y\\x1fz') concatenate identically under a
    separator-joined hash; the to_json struct hash must catch the update.
    Likewise NULL vs the literal sentinel string."""
    from photo_vector_search_spark.operators.versioned_store import diff_versions

    v1 = commit_overwrite(
        spark.createDataFrame(
            [(1, "x\x1fy", "z"), (2, None, "q")], "id int, a string, b string"
        ),
        store_path,
    )
    v2 = commit_rewrite(
        spark.createDataFrame(
            [(1, "x", "y\x1fz"), (2, "\x00", "q")], "id int, a string, b string"
        ),
        store_path,
    )
    got = {
        r["id"]: r["change_type"]
        for r in diff_versions(spark, store_path, v1, v2, ["id"]).collect()
    }
    assert got == {1: "update", 2: "update"}


def test_diff_versions_prunes_shared_dirs(spark, store_path):
    """Manifest-level CDC pruning: across an append commit the diff must
    physically read ONLY the appended dirs (shared immutable dirs can hold
    nothing but unchanged rows), and the result must equal the unpruned
    semantics."""
    from photo_vector_search_spark.operators.versioned_store import (
        _read_manifest,
        diff_versions,
    )

    v0 = commit_overwrite(_df(spark, range(100)), store_path)
    v1 = commit_append(_df(spark, range(100, 103)), store_path)
    base_dirs = set(_read_manifest(store_path, v0)["live"])
    delta_dirs = set(_read_manifest(store_path, v1)["live"]) - base_dirs
    assert len(delta_dirs) == 1

    diff = diff_versions(spark, store_path, v0, v1, ["id"])
    got = {(r["change_type"], r["id"]) for r in diff.collect()}
    assert got == {("insert", 100), ("insert", 101), ("insert", 102)}

    # physical proof: every input file of the diff plan lives in the delta
    # dir — the 100-row base dir is never opened
    files = diff.inputFiles()
    assert files, "diff plan reports no input files"
    delta_rel = next(iter(delta_dirs))
    assert all(delta_rel in f for f in files), files

    # symmetric direction: the appended rows surface as deletes, same pruning
    back = diff_versions(spark, store_path, v1, v0, ["id"])
    assert {(r["change_type"], r["id"]) for r in back.collect()} == {
        ("delete", 100),
        ("delete", 101),
        ("delete", 102),
    }
    assert all(delta_rel in f for f in back.inputFiles())
