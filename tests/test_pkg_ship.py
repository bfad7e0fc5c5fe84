"""The shipped package zip must be content-addressed (r12).

A fixed /tmp path raced between concurrent sessions from different
source trees: the second process rewrote the zip in place and the
first's executors failed Spark's fetch consistency check. The zip name
now embeds a hash of its bytes, so different trees get different
files and identical trees re-land identical bytes atomically.
"""

import os
import stat
import zipfile

import citus_spark
from citus_spark.queries import _write_pkg_zip

PKG = os.path.dirname(os.path.abspath(citus_spark.__file__))


def test_zip_name_embeds_content_hash():
    p = _write_pkg_zip(PKG)
    base = os.path.basename(p)
    assert base.startswith("citus_spark_pkg_") and base.endswith(".zip")
    digest = base[len("citus_spark_pkg_"):-len(".zip")]
    assert len(digest) == 12
    import hashlib

    with open(p, "rb") as fh:
        assert hashlib.sha256(fh.read()).hexdigest()[:12] == digest


def test_zip_is_deterministic_and_complete():
    p1 = _write_pkg_zip(PKG)
    p2 = _write_pkg_zip(PKG)
    assert p1 == p2  # same tree -> same bytes -> same name
    names = zipfile.ZipFile(p1).namelist()
    assert any(n.endswith("citus_spark/queries/__init__.py") for n in names)
    assert any(n.endswith("citus_spark/session.py") for n in names)
    assert not any("__pycache__" in n for n in names)
    # world-readable so other sessions landing on the same digest (and
    # cluster executors) can fetch it
    assert stat.S_IMODE(os.stat(p1).st_mode) == 0o644
