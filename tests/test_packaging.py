"""Packaging pin: the repo is pip-installable (PEP 517 sdist builds,
metadata resolves, every package module ships). Mirrors the
reference's setup.cfg/pyproject discipline (reference setup.cfg:1-28,
pyproject.toml). The build runs offline — no index access."""

from __future__ import annotations

import os
import tarfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def sdist_path(tmp_path_factory):
    try:
        from setuptools.build_meta import build_sdist
    except ImportError:  # pragma: no cover - setuptools always present
        pytest.skip("setuptools build backend unavailable")
    out = tmp_path_factory.mktemp("dist")
    cwd = os.getcwd()
    os.chdir(REPO)
    try:
        name = build_sdist(str(out))
    finally:
        os.chdir(cwd)
    return os.path.join(str(out), name)


def test_sdist_builds_and_carries_the_package(sdist_path):
    with tarfile.open(sdist_path) as tf:
        names = tf.getnames()
    assert any(n.endswith("PKG-INFO") for n in names)
    # every module of the importable package ships in the sdist
    shipped = {
        n.split("/", 1)[1]
        for n in names
        if "/" in n and n.split("/", 1)[1].endswith(".py")
    }
    for root, _dirs, files in os.walk(
        os.path.join(REPO, "mssql_dataframe_spark")
    ):
        if "__pycache__" in root:
            continue
        rel_root = os.path.relpath(root, REPO)
        for f in files:
            if f.endswith(".py"):
                assert os.path.join(rel_root, f) in shipped


def test_sdist_metadata_names_the_project(sdist_path):
    with tarfile.open(sdist_path) as tf:
        pkg_info = next(
            tf.extractfile(m).read().decode()
            for m in tf.getmembers()
            if m.name.endswith("PKG-INFO")
        )
        # older setuptools records dependencies in egg-info/requires.txt
        # rather than PKG-INFO Requires-Dist; accept either location
        requires = "".join(
            tf.extractfile(m).read().decode()
            for m in tf.getmembers()
            if m.name.endswith("requires.txt")
        )
    assert "Name: mssql_dataframe_spark" in pkg_info.replace("-", "_")
    assert "pyspark" in (pkg_info + requires)
