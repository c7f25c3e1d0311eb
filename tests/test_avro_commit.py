"""Two-phase manifest commit for the Avro sink: a writer killed at ANY
point before the atomic manifest rename must leave the previous
committed view fully intact — readers never observe partial output.
Each test kills the write at one boundary of the protocol."""

from __future__ import annotations

import json
import os

import pytest

from example_beam_spark.formats import avro_spark
from example_beam_spark.formats.avro_ocf import write_ocf
from example_beam_spark.formats.avro_spark import (
    _MANIFEST_NAME,
    read_avro,
    write_avro,
)


def _frame(spark, ids):
    return spark.createDataFrame([(i, f"n{i}") for i in ids], "id long, name string")


def _ids(spark, path):
    return sorted(r["id"] for r in read_avro(spark, path).collect())


def test_append_and_overwrite_maintain_manifest(spark, tmp_path):
    path = str(tmp_path / "t")
    write_avro(_frame(spark, [1, 2]), path, mode="append")
    write_avro(_frame(spark, [3]), path, mode="append")
    assert _ids(spark, path) == [1, 2, 3]
    with open(os.path.join(path, _MANIFEST_NAME)) as f:
        listed = {e["path"] for e in json.load(f)["files"]}
    on_disk = {n for n in os.listdir(path) if n.endswith(".avro")}
    assert listed == on_disk and len(listed) >= 2

    write_avro(_frame(spark, [9]), path, mode="overwrite")
    assert _ids(spark, path) == [9]
    # post-commit GC removed the replaced files
    on_disk = {n for n in os.listdir(path) if n.endswith(".avro")}
    with open(os.path.join(path, _MANIFEST_NAME)) as f:
        assert {e["path"] for e in json.load(f)["files"]} == on_disk


def test_stray_part_file_is_invisible(spark, tmp_path):
    """Simulates a writer killed between staging-move and manifest
    rename: a fully-materialized part file sits in the directory but is
    not manifest-listed — reads (and schema peeks) must ignore it."""
    path = str(tmp_path / "t")
    write_avro(_frame(spark, [1, 2]), path, mode="append")

    stray = os.path.join(path, "part-99999-deadbeef.avro")
    schema = {
        "type": "record",
        "name": "spark_record",
        "fields": [
            {"name": "id", "type": ["null", "long"], "default": None},
            {"name": "name", "type": ["null", "string"], "default": None},
        ],
    }
    with open(stray, "wb") as f:
        write_ocf(f, schema, [{"id": 777, "name": "stray"}])

    assert _ids(spark, path) == [1, 2]  # 777 invisible


def test_killed_manifest_write_preserves_old_view(spark, tmp_path, monkeypatch):
    """Kill the writer AT the commit point (manifest rename raises):
    write_avro must raise, and readers must still see the previous
    committed contents only."""
    path = str(tmp_path / "t")
    write_avro(_frame(spark, [1, 2]), path, mode="append")

    def boom(p, entries, avro_schema):
        raise OSError("simulated crash during manifest rename")

    monkeypatch.setattr(avro_spark, "_write_manifest_atomic", boom)
    with pytest.raises(RuntimeError, match="previous manifest still governs") as ei:
        write_avro(_frame(spark, [3, 4]), path, mode="overwrite")
    assert isinstance(ei.value.__cause__, OSError)  # the simulated crash, not a TypeError
    monkeypatch.undo()

    assert _ids(spark, path) == [1, 2]


def test_killed_overwrite_never_exposes_partial(spark, tmp_path, monkeypatch):
    """Old files are deleted only AFTER the commit point: killing the
    write before commit leaves the old table fully readable (the old
    protocol deleted first — a kill then lost BOTH generations)."""
    path = str(tmp_path / "t")
    write_avro(_frame(spark, [1, 2, 3]), path, mode="append")

    real_replace = os.replace
    calls = {"n": 0}

    def flaky_replace(src, dst):
        # let the first staged file move, die on the second
        calls["n"] += 1
        if calls["n"] >= 2:
            raise OSError("simulated crash mid file-move")
        return real_replace(src, dst)

    monkeypatch.setattr(avro_spark.os, "replace", flaky_replace)
    with pytest.raises(RuntimeError):
        write_avro(
            _frame(spark, [7, 8]).repartition(2), path, mode="overwrite"
        )
    monkeypatch.undo()

    assert _ids(spark, path) == [1, 2, 3]


def test_legacy_unmanifested_dir_reads_and_adopts(spark, tmp_path):
    """Directories created before the manifest protocol (or hand-placed
    files) still read via glob fallback, and the first append ADOPTS
    them into the manifest so they stay visible afterwards."""
    path = str(tmp_path / "t")
    write_avro(_frame(spark, [1, 2]), path, mode="append")
    os.remove(os.path.join(path, _MANIFEST_NAME))  # legacy layout

    assert _ids(spark, path) == [1, 2]  # glob fallback

    write_avro(_frame(spark, [3]), path, mode="append")
    assert _ids(spark, path) == [1, 2, 3]  # adopted + new


def test_fresh_dir_kill_mid_move_exposes_nothing(spark, tmp_path, monkeypatch):
    """The FIRST write into a fresh directory commits a bootstrap (empty)
    manifest BEFORE any part file lands, so a writer killed mid-move
    leaves strays that readers never glob and that the next append never
    adopts. (Pre-fix probe: 4 rows in 2 files, kill after file 1 —
    read_avro returned 1 row and the next append committed the partial
    file permanently.)"""
    path = str(tmp_path / "t")

    real_replace = os.replace
    calls = {"n": 0}

    def flaky_replace(src, dst):
        # call 1 = bootstrap manifest rename, call 2 = first part-file
        # move; die on the second part-file move
        calls["n"] += 1
        if calls["n"] >= 3:
            raise OSError("simulated crash mid file-move")
        return real_replace(src, dst)

    monkeypatch.setattr(avro_spark.os, "replace", flaky_replace)
    with pytest.raises(RuntimeError):
        write_avro(_frame(spark, [1, 2, 3, 4]).repartition(2), path, mode="append")
    monkeypatch.undo()

    # one stray fully-materialized part file IS on disk...
    assert sum(n.endswith(".avro") for n in os.listdir(path)) == 1
    # ...but readers resolve through the bootstrap manifest: zero rows
    assert _ids(spark, path) == []

    # and the next append does NOT adopt the stray into the manifest
    write_avro(_frame(spark, [5]), path, mode="append")
    assert _ids(spark, path) == [5]


def test_fresh_dir_kill_before_bootstrap_leaves_dir_empty(
    spark, tmp_path, monkeypatch
):
    """Killed AT the bootstrap commit: no manifest, no part files — the
    directory is exactly as unwritten (output preserved in staging for
    manual recovery)."""
    path = str(tmp_path / "t")

    def boom(p, entries, avro_schema):
        raise OSError("simulated crash during bootstrap manifest rename")

    monkeypatch.setattr(avro_spark, "_write_manifest_atomic", boom)
    with pytest.raises(RuntimeError, match="previous manifest still governs"):
        write_avro(_frame(spark, [1, 2]), path, mode="append")
    monkeypatch.undo()

    assert not any(n.endswith(".avro") for n in os.listdir(path))
    assert not os.path.isfile(os.path.join(path, _MANIFEST_NAME))


def test_committed_empty_table_reads_empty(spark, tmp_path):
    path = str(tmp_path / "t")
    write_avro(_frame(spark, [1]), path, mode="append")
    write_avro(_frame(spark, []).limit(0), path, mode="overwrite")
    df = read_avro(spark, path)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["id", "name"]
