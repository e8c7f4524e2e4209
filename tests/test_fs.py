"""fs shim (pspcz_analyzer_spark.fs): LocalFS and the pyarrow-backed
ArrowFS must expose identical primitive behavior, and the manifest
protocol must run unchanged through either."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from pspcz_analyzer_spark.fs import ArrowFS, LocalFS, get_fs


def _impls():
    from pyarrow.fs import LocalFileSystem

    return [("local", LocalFS()), ("arrow", ArrowFS(LocalFileSystem()))]


@pytest.mark.parametrize("name,fs", _impls(), ids=lambda x: x if isinstance(x, str) else "")
def test_primitive_parity(name, fs, tmp_path):
    root = str(tmp_path / name)
    fs.makedirs(root)
    assert fs.isdir(root)
    p = os.path.join(root, "a.bin")
    fs.create_exclusive(p, b"hello")
    assert fs.exists(p)
    assert fs.read_bytes(p) == b"hello"
    assert fs.size(p) == 5
    with pytest.raises(FileExistsError):
        fs.create_exclusive(p, b"again")
    assert fs.read_bytes(p) == b"hello"  # loser never clobbers
    q = os.path.join(root, "b.bin")
    fs.rename(p, q)
    assert not fs.exists(p) and fs.read_bytes(q) == b"hello"
    assert sorted(fs.listdir(root)) == ["b.bin"]
    fs.remove(q)
    assert not fs.exists(q)
    fs.rmtree(root)
    assert not fs.exists(root)
    fs.rmtree(root)  # idempotent on missing


def test_get_fs_resolution(tmp_path):
    fs, rel = get_fs(str(tmp_path))
    assert isinstance(fs, LocalFS) and rel == str(tmp_path)
    fs, rel = get_fs(f"file://{tmp_path}")
    assert isinstance(fs, LocalFS) and rel == str(tmp_path)
    with pytest.raises(Exception):  # unknown scheme surfaces pyarrow's error
        get_fs(f"bogus-scheme://{tmp_path}")


def test_parquet_file_through_arrow_fs(spark, tmp_path):
    from pyarrow.fs import LocalFileSystem

    path = str(tmp_path / "t")
    spark.range(10).write.parquet(path)
    fs = ArrowFS(LocalFileSystem())
    f = next(b for b in fs.listdir(path) if b.endswith(".parquet"))
    assert fs.parquet_file(os.path.join(path, f)).metadata.num_rows > 0


def test_manifest_lifecycle_through_arrow_fs(spark, tmp_path, monkeypatch):
    """The full protocol — init, append, evolve, delete, compact, time
    travel, vacuum — on the object-store code path (ArrowFS), proving the
    shim carries every op, not just the happy reads."""
    from pyarrow.fs import LocalFileSystem

    from pspcz_analyzer_spark import manifest as M

    arrow = ArrowFS(LocalFileSystem())
    monkeypatch.setattr(M, "get_fs", lambda p: (arrow, p))

    path = str(tmp_path / "tbl")
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("g")
    )
    df.repartition(4).write.parquet(path)
    assert M.manifest_init(path) == 1
    M.append(
        spark.range(1000, 1010).select(
            F.col("id").alias("k"),
            (F.col("id") % 10).alias("g"),
            F.lit("b2").alias("src"),
        ),
        path,
        merge_schema=True,
    )
    t = M.load_manifest_table(spark, path)
    assert t.count() == 1010 and t.columns == ["k", "g", "src"]
    files_v2 = len(M.read_manifest(path)["files"])
    M.delete_keys(spark, path, "g", [3])
    t3 = M.load_manifest_table(spark, path)
    assert t3.filter(F.col("g") == 3).count() == 0
    assert M.load_manifest_table(spark, path, version=2).count() == 1010
    n3 = t3.count()  # materialize BEFORE vacuum: t3's plan pins v3's files
    merged, written = M.compact_small_files(spark, path, target_bytes=1 << 20)
    assert merged >= 2 and written >= 1
    assert M.load_manifest_table(spark, path).count() == n3
    removed = M.vacuum(path, retain_versions=1, min_age_seconds=0)
    assert removed > 0
    assert M.load_manifest_table(spark, path).count() == n3
    assert files_v2 > 0  # silence unused warnings


def test_arrowfs_create_exclusive_fails_closed(tmp_path, monkeypatch):
    """ADVICE r05: the ArrowFS publish emulation must verify-after-write —
    a racer's bytes in place of ours raises (commit reported LOST, which
    manifest._commit maps to CommitConflict), never a silent success."""
    from pyarrow.fs import LocalFileSystem

    from pspcz_analyzer_spark.fs import ArrowFS

    afs = ArrowFS(LocalFileSystem())
    target = str(tmp_path / "00000002.json")
    afs.create_exclusive(target, b'{"version": 2}')  # clean publish verifies
    assert afs.read_bytes(target) == b'{"version": 2}'

    import pytest as _pytest

    with _pytest.raises(FileExistsError):  # pre-check still applies
        afs.create_exclusive(target, b"x")

    lost = str(tmp_path / "00000003.json")
    monkeypatch.setattr(ArrowFS, "read_bytes", lambda self, p: b"racer won")
    with _pytest.raises(FileExistsError, match="verify-after-write"):
        afs.create_exclusive(lost, b'{"version": 3}')
