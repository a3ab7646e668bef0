"""ensure_shipped cache hygiene: per-user private dir + byte-verified
reuse (ADVICE r6 tmp-squatting, CWE-379)."""

import glob
import os
import stat
import tempfile


def _cache_dir() -> str:
    return os.path.join(tempfile.gettempdir(), f"hdk_spark-{os.getuid()}")


def test_ensure_shipped_private_dir_and_squat_rejection(spark):
    """The shipped-zip cache lives in a per-user 0700 directory, and a
    pre-existing file whose bytes do NOT match the content digest is
    atomically replaced instead of shipped (never trust the name)."""
    from hdk_spark.session import ensure_shipped

    spark.sparkContext._hdk_spark_shipped = False
    zpath = ensure_shipped(spark)
    cdir = _cache_dir()
    assert os.path.isdir(cdir)
    assert stat.S_IMODE(os.stat(cdir).st_mode) == 0o700
    # the returned path is the CURRENT package state's zip — the cache
    # dir legitimately holds stale digests from earlier source states,
    # so a glob-and-pick-last here squats the wrong file and the
    # repair assertion below goes flaky (r8 full-suite failure)
    assert zpath is not None and os.path.dirname(zpath) == cdir
    assert os.path.basename(zpath).startswith("hdk_spark_pkg_")
    good = open(zpath, "rb").read()
    with open(zpath, "wb") as fh:
        fh.write(b"PK\x03\x04 not the real package")
    spark.sparkContext._hdk_spark_shipped = False
    ensure_shipped(spark)
    assert open(zpath, "rb").read() == good

    # and a matching file is reused untouched (mtime preserved)
    mtime = os.stat(zpath).st_mtime_ns
    spark.sparkContext._hdk_spark_shipped = False
    ensure_shipped(spark)
    assert os.stat(zpath).st_mtime_ns == mtime
    # no stray .tmp files from the atomic writes
    assert not glob.glob(os.path.join(cdir, "*.tmp"))
