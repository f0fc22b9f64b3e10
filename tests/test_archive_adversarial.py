"""Adversarial archive-expansion property tests (VERDICT r3 #8 / r4 #9)
for the DISTRIBUTED path (sources/containers.py::expand_archives —
binaryFile → mapInPandas, the one-job 100 TB shape):

- empty (0-byte) members must yield a row (downstream XML parse decides
  validity) and must not crash extraction;
- nested directories inside tars: directory entries skipped, files at
  depth preserved with their full member path;
- symlinks/hardlinks skipped (isfile guard);
- zip64 archives (forced 64-bit entries) expand fine;
- hostile member names (../ traversal, absolute paths) are SAFE by
  construction — members are expanded in memory, never extracted to a
  filesystem — and the name is preserved verbatim for lineage.
"""

from __future__ import annotations

import io
import tarfile
import zipfile

from xml_to_parquet_spark.sources.containers import expand_archives

XML_BODY = b"<purchaseOrder orderDate='1999-10-20'></purchaseOrder>"


def _add_tar_member(tf, name, body=XML_BODY, ttype=tarfile.REGTYPE, link=""):
    ti = tarfile.TarInfo(name=name)
    ti.type = ttype
    ti.linkname = link
    if ttype == tarfile.REGTYPE:
        ti.size = len(body)
        tf.addfile(ti, io.BytesIO(body))
    else:
        tf.addfile(ti)


def test_tar_empty_member_and_nested_dirs(spark, tmp_path):
    p = tmp_path / "adv.tar.gz"
    with tarfile.open(p, "w:gz") as tf:
        _add_tar_member(tf, "ok.xml")
        _add_tar_member(tf, "empty.xml", body=b"")
        _add_tar_member(tf, "sub", ttype=tarfile.DIRTYPE)
        _add_tar_member(tf, "sub/deeper", ttype=tarfile.DIRTYPE)
        _add_tar_member(tf, "sub/deeper/nested.xml")
    rows = {
        r["member"]: r["xml"]
        for r in expand_archives(spark, [str(p)], "tar").collect()
    }
    # dirs skipped, files (even empty) present, nested path preserved
    assert set(rows) == {"ok.xml", "empty.xml", "sub/deeper/nested.xml"}
    assert rows["empty.xml"] == ""
    assert rows["sub/deeper/nested.xml"] == XML_BODY.decode()


def test_tar_symlink_and_hardlink_skipped(spark, tmp_path):
    p = tmp_path / "links.tar.gz"
    with tarfile.open(p, "w:gz") as tf:
        _add_tar_member(tf, "real.xml")
        _add_tar_member(tf, "sym.xml", ttype=tarfile.SYMTYPE, link="real.xml")
        _add_tar_member(tf, "hard.xml", ttype=tarfile.LNKTYPE, link="real.xml")
    members = [
        r["member"] for r in expand_archives(spark, [str(p)], "tar").collect()
    ]
    assert members == ["real.xml"]


def test_tar_hostile_member_names_memory_only(spark, tmp_path):
    """../ traversal and absolute names: never touches the filesystem
    (in-memory expansion), name preserved verbatim for lineage."""
    p = tmp_path / "hostile.tar.gz"
    with tarfile.open(p, "w:gz") as tf:
        _add_tar_member(tf, "../escape.xml")
        _add_tar_member(tf, "/abs/path.xml")
        _add_tar_member(tf, "uni_é中.xml")
    members = {
        r["member"] for r in expand_archives(spark, [str(p)], "tar").collect()
    }
    assert members == {"../escape.xml", "/abs/path.xml", "uni_é中.xml"}
    assert not (tmp_path.parent / "escape.xml").exists()


def test_zip64_and_empty_member(spark, tmp_path):
    p = tmp_path / "big.zip"
    with zipfile.ZipFile(p, "w", allowZip64=True) as zf:
        for i in range(3):
            with zf.open(f"m_{i}.xml", "w", force_zip64=True) as fh:
                fh.write(XML_BODY)
        zf.writestr("empty.xml", b"")
        zf.writestr("dir/", b"")  # explicit directory entry
        zf.writestr("dir/deep.xml", XML_BODY)
    rows = {
        r["member"]: r["xml"]
        for r in expand_archives(spark, [str(p)], "zip").collect()
    }
    assert set(rows) == {"m_0.xml", "m_1.xml", "m_2.xml", "empty.xml", "dir/deep.xml"}
    assert rows["empty.xml"] == ""


def test_zip_file_info_fields_survive(spark, tmp_path):
    p = tmp_path / "meta.zip"
    with zipfile.ZipFile(p, "w", zipfile.ZIP_DEFLATED) as zf:
        # even seconds: zip DOS timestamps have 2-second granularity
        zf.writestr(zipfile.ZipInfo("a.xml", (2021, 3, 4, 5, 6, 8)), XML_BODY)
    (row,) = expand_archives(spark, [str(p)], "zip").collect()
    assert row["filename"] == "a.xml"
    assert list(row["date_time"]) == [2021, 3, 4, 5, 6, 8]
    assert row["zipfile"] == "meta.zip"


def test_mixed_many_archives_one_job(spark, tmp_path):
    """Many archives in one call stay one distributed job and the member
    count is exact (no dupes/drops across task boundaries)."""
    paths = []
    for a in range(4):
        p = tmp_path / f"part_{a}.tar.gz"
        with tarfile.open(p, "w:gz") as tf:
            for i in range(7):
                _add_tar_member(tf, f"a{a}_m{i}.xml")
        paths.append(str(p))
    df = expand_archives(spark, paths, "tar")
    assert df.count() == 28
    assert df.select("member").distinct().count() == 28
