"""Worker-zip bytecode augmentation (OPTIMIZATION_r11, guide §4):
spawned Python processes import pyspark from $SPARK_HOME's zip, where
zipimport cannot use __pycache__ — so session.py adds .pyc members to
the zip once per interpreter. These tests pin the helper's contract
on a toy zip: bytecode is added, preferred by zipimport, idempotent,
and stale-magic bytecode is regenerated."""

from __future__ import annotations

import importlib
import importlib.util
import sys
import zipfile

from mc_ns_data_pipeline_spark.session import _augment_zip_with_pyc


def _make_zip(path, extra=()):
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("toypkg/__init__.py", "FLAVOR = 'source'\n")
        z.writestr("toypkg/mod.py", "def f():\n    return 41 + 1\n")
        z.writestr("toypkg/data.txt", "not python\n")
        for name, data in extra:
            z.writestr(name, data)
    return str(path)


def test_augment_adds_preferred_bytecode(tmp_path):
    zp = _make_zip(tmp_path / "t.zip")
    _augment_zip_with_pyc(zp)
    with zipfile.ZipFile(zp) as z:
        names = set(z.namelist())
        assert {"toypkg/__init__.pyc", "toypkg/mod.pyc",
                "toypkg/data.txt"} <= names
        assert z.read("toypkg/__init__.pyc")[:4] == \
            importlib.util.MAGIC_NUMBER
    sys.path.insert(0, zp)
    try:
        import toypkg
        import toypkg.mod
        assert toypkg.mod.f() == 42
        # zipimport must have picked the bytecode member
        assert toypkg.__spec__.origin.endswith("__init__.pyc")
    finally:
        sys.path.remove(zp)
        for m in ("toypkg", "toypkg.mod"):
            sys.modules.pop(m, None)


def test_augment_is_idempotent(tmp_path):
    import os

    zp = _make_zip(tmp_path / "t.zip")
    _augment_zip_with_pyc(zp)
    before = (os.path.getmtime(zp), os.path.getsize(zp))
    _augment_zip_with_pyc(zp)  # marker present: must not rewrite
    assert (os.path.getmtime(zp), os.path.getsize(zp)) == before


def test_augment_replaces_stale_magic(tmp_path):
    stale = b"\x00\x00\x0d\x0a" + b"\x00" * 20
    zp = _make_zip(tmp_path / "t.zip",
                   extra=[("toypkg/__init__.pyc", stale)])
    _augment_zip_with_pyc(zp)
    with zipfile.ZipFile(zp) as z:
        assert z.read("toypkg/__init__.pyc")[:4] == \
            importlib.util.MAGIC_NUMBER
        # exactly one .pyc per .py, no stale duplicates
        names = [n for n in z.namelist() if n.endswith(".pyc")]
        assert sorted(names) == ["toypkg/__init__.pyc",
                                 "toypkg/mod.pyc"]
