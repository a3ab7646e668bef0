"""SparkSession factory with scale-aware defaults.

Single place every entry point (facade, tests, bench, driver contract)
gets its session from, so the tuning story is consistent:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing) —
  plays the role of the reference's adaptive device/layout choices
  (reference omniscidb/QueryEngine/MemoryLayoutBuilder.cpp picks hash
  layouts by observed cardinality; AQE is the Spark-native equivalent).
- shuffle.partitions sized to local cores for tests; on a real cluster
  AQE coalescing makes the initial number mostly irrelevant.
- Arrow enabled for toPandas()/pandas-UDF boundaries.
- UTC session timezone so results compare cleanly against UTC-naive
  oracles (DuckDB) and parquet ms/ns timestamps.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 1.5m (vs Spark's 10m default): Spark scales a scan's size estimate
    # by the column-pruning ratio, so an 11MB fact file projected to 3
    # of 11 columns estimates ~3MB and gets broadcast — the driver-side
    # hash build of the 600k-row side measured ~0.5s/query at sf0.1 and
    # OOMs at scale. 1.5m keeps true dimension tables (customer/orders
    # pruned, supplier, part, nation, region) broadcast while fact scans
    # shuffle; AQE still upgrades a join to broadcast from observed
    # runtime sizes when a side is genuinely small (e.g. a filtered
    # dim⋈dim intermediate).
    "spark.sql.autoBroadcastJoinThreshold": str(1536 * 1024),
    # Runtime (AQE) broadcast decisions use MEASURED shuffle sizes, not
    # pruning-scaled guesses, so a much higher bar is safe there: a join
    # side observed ≤32 MB broadcasts even when its static estimate was
    # wrong in either direction. This recovers broadcast plans for
    # mid-size intermediates (LSH bucket relations, filtered dim⋈dim
    # results) without ever risking a driver-side build of a
    # misestimated fact table.
    "spark.sql.adaptive.autoBroadcastJoinThreshold": str(32 * 1024 * 1024),
    # local[...] runs one JVM: the driver is the only memory pool.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
    "spark.ui.enabled": "false",
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    # DELIBERATELY NOT SET (measured r13, scale_smoke.py --r13c):
    # spark.sql.adaptive.coalescePartitions.initialPartitionNum=512.
    # AQE coalesces DOWN from the initial split using measured map
    # sizes, so at sf10 (60M lineitem) a 512-way initial split cuts
    # q5 from 16.1 s to 6.6 s (32-way leaves ~2M rows per SMJ
    # partition → sort spill), and in AGED long-lived sessions it
    # also cut the minhash dedup path ~2.5× (more, smaller Python
    # tasks across warm workers). But on a FRESH session at sf0.1 the
    # same setting slows that dedup path ~35% (0.89 → 1.25 s —
    # more Python tasks before worker startup amortizes), so adopting
    # it globally would trade the young-session profile the bench
    # measures for the aged-session profile. Mechanism (pinned via
    # task counts + executed plans): AQE never coalesces the minhash
    # pipeline's REUSED signature exchange (two consumers share
    # `Exchange hashpartitioning(signature, N)`), so this knob sets
    # that stage's task count directly — 512 tasks of ~KB each, and
    # per-task Python round-trips dominate until workers warm.
    # Callers running at sf10+ scale should set it per session.
}


def get_spark(app_name: str = "hdk_spark", **overrides: str) -> SparkSession:
    """Return the shared SparkSession, creating it on first use."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.master(
        os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    ).appName(app_name)
    for k, v in {**_DEFAULTS, **overrides}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()


def ensure_shipped(spark: SparkSession) -> "str | None":
    """Ship the hdk_spark package to Python workers via ``addPyFile``.
    Returns the content-addressed cache path of the shipped zip (None
    when the context was already shipped and the path wasn't rebuilt).

    Closures passed to ``mapInPandas``/``pandas_udf`` that reference
    module-level helpers are cloudpickled BY REFERENCE (the module is
    importable in the driver), so the worker must be able to
    ``import hdk_spark`` too. Under the repo's own sessions or a
    driver whose cwd is the repo root that works incidentally (the
    worker's ``-m``-style launch puts the cwd on sys.path); under an
    arbitrary vanilla session it does not — the worker dies with
    ``ModuleNotFoundError: No module named 'hdk_spark'`` before any
    UDF code runs. Shipping a zip of the package through Spark's own
    file distribution makes every kernel cwd/PYTHONPATH-independent.
    Idempotent per SparkContext; ~100 KB once per session."""
    sc = spark.sparkContext
    if getattr(sc, "_hdk_spark_shipped", False):
        return
    import hashlib
    import io
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    # Build the zip DETERMINISTICALLY in memory (sorted entries, fixed
    # timestamps) and write it to a content-addressed path reused by
    # every session shipping the same package bytes. Executors fetch
    # addPyFile sources LAZILY at task time and verify them against the
    # original path, so the file must outlive the session — a single
    # stable cache file replaces the former one-mkstemp-leak-per-session
    # (and deleting eagerly breaks the lazy fetch: a recycled temp name
    # with fresh zip timestamps fails Spark's contents-match check).
    srcs = []
    for root, _dirs, files in os.walk(pkg_dir):
        if "__pycache__" in root:
            continue
        for fn in files:
            if fn.endswith(".py"):
                srcs.append(os.path.join(root, fn))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for full in sorted(srcs):
            rel = os.path.join("hdk_spark", os.path.relpath(full, pkg_dir))
            with open(full, "rb") as fh:
                payload = fh.read()
            info = zipfile.ZipInfo(rel, date_time=(2000, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, payload)
    blob = buf.getvalue()
    digest = hashlib.sha256(blob).hexdigest()[:16]
    # Per-user 0700 cache dir, NOT the shared temp dir: on a multi-user
    # host a world-writable /tmp lets anyone pre-create ("squat") the
    # predictable content-addressed name with arbitrary code that
    # addPyFile would then ship to every executor (CWE-379).
    cache_dir = os.path.join(
        tempfile.gettempdir(), f"hdk_spark-{os.getuid()}"
    )
    os.makedirs(cache_dir, mode=0o700, exist_ok=True)
    # A squatter can pre-create the predictable path (or plant a symlink
    # to a directory they control) before our makedirs; verify the entry
    # is a REAL directory OWNED BY US before chmod/use, and fail with a
    # message naming the squatted path instead of an opaque
    # PermissionError downstream. os.getuid/lstat.st_uid are POSIX-only,
    # like the 0700 protection itself.
    st = os.lstat(cache_dir)
    import stat as _stat

    if not _stat.S_ISDIR(st.st_mode) or st.st_uid != os.getuid():
        raise RuntimeError(
            f"refusing to use package cache dir {cache_dir!r}: it is "
            "not a directory owned by the current user (possible tmp "
            "squatting) — remove it or set TMPDIR elsewhere"
        )
    os.chmod(cache_dir, 0o700)  # makedirs skips mode if dir pre-exists
    zpath = os.path.join(cache_dir, f"hdk_spark_pkg_{digest}.zip")
    # Belt-and-braces: even inside the private dir, reuse only a file
    # whose BYTES match the digest we computed — never trust the name.
    reuse = False
    if os.path.exists(zpath):
        with open(zpath, "rb") as fh:
            reuse = hashlib.sha256(fh.read()).hexdigest()[:16] == digest
    if not reuse:
        tmp = zpath + f".{os.getpid()}.tmp"
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, zpath)  # atomic; concurrent writers converge
    sc.addPyFile(zpath)
    sc._hdk_spark_shipped = True
    return zpath
