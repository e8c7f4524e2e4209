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


def _subtree_get_fs(tmp_path):
    """get_fs twin for an object-store layout where the STORE-RELATIVE
    path differs from the table URI (on local disk both coincide, which
    is exactly what hid the r7 rel-vs-path bugs): fs ops resolve through
    a SubTreeFileSystem rooted at tmp_path, so `rel` is relative and NOT
    readable by Spark — any spark.read against rel fails like it would
    on s3://."""
    from pyarrow.fs import LocalFileSystem, SubTreeFileSystem

    sub = ArrowFS(SubTreeFileSystem(str(tmp_path), LocalFileSystem()))
    base = str(tmp_path)

    def fake_get_fs(p: str):
        if p.startswith(base):
            return sub, os.path.relpath(p, base)
        return LocalFS(), p

    return fake_get_fs


def test_read_changes_resolves_table_uri_not_rel(spark, tmp_path, monkeypatch):
    """ADVICE r07: read_changes must hand Spark the ORIGINAL table path,
    not the store-relative one — on object stores rel has no scheme and
    spark.read resolves it as a local path. Reproduced via a subtree fs
    where rel is cwd-relative garbage for Spark."""
    from pspcz_analyzer_spark import manifest as M

    path = str(tmp_path / "cdf_uri")
    spark.range(20).selectExpr("id AS k").coalesce(1).write.parquet(path)
    M.manifest_init(path)
    M.enable_cdf(path)
    monkeypatch.setattr(M, "get_fs", _subtree_get_fs(tmp_path))
    v0 = M.current_version(path)
    M.delete_where(spark, path, "k < 5")  # records cdf_files
    ch = M.read_changes(spark, path, v0)
    assert ch.count() == 5
    assert {r["_change_type"] for r in ch.collect()} == {"delete"}


def test_version_at_timestamp_uses_ict_on_uri_backends(
    spark, tmp_path, monkeypatch
):
    """ADVICE r07: version_at_timestamp passed `rel` to read_manifest, so
    on URI backends the in-commit-timestamp read ALWAYS threw and the
    resolver silently fell back to mtimes — the exact failure ICT exists
    to prevent. Pin mtimes to the far future so only ICT resolution can
    answer correctly."""
    import json

    from pspcz_analyzer_spark import manifest as M

    path = str(tmp_path / "ict_uri")
    spark.range(10).selectExpr("id AS k").coalesce(1).write.parquet(path)
    M.manifest_init(path)  # v1
    M.append(spark.range(10, 15).selectExpr("id AS k"), path)  # v2
    mdir = os.path.join(path, "_manifest")
    for v, t in ((1, 1000.0), (2, 2000.0)):
        p = os.path.join(mdir, f"{v:08d}.json")
        doc = json.loads(open(p).read())
        doc.pop("crc", None)  # re-seal below: blobs are crc-checked on read
        doc["ts"] = t
        open(p, "wb").write(M._seal_doc(doc))
        os.utime(p, (9_999_999_999, 9_999_999_999))  # mtime: far future
    monkeypatch.setattr(M, "get_fs", _subtree_get_fs(tmp_path))
    # Between the commits: ICT resolves v1; the mtime fallback would see
    # nothing <= 1500 and raise (pre-fix behavior on URI backends).
    assert M.version_at_timestamp(path, 1500) == 1
    assert M.version_at_timestamp(path, 2500) == 2
