"""Ship this package to Python workers — self-sufficiency for the
Python-on-data paths.

Every ``mapInPandas`` / ``applyInPandas(WithState)`` closure in this
repo references module-level helpers, which cloudpickle serializes BY
REFERENCE: the worker interpreter must be able to
``import signaldb_spark``. Under the repo's own session factory that
works because session.py pins PYTHONPATH before the JVM launches — but
a VANILLA embedder session (the round driver's, or any application's)
only works when the driver's cwd happens to contain the repo. Found in
round 11 by a partitioning-determinism audit run from a different cwd:
``ModuleNotFoundError: signaldb_spark`` from the Python worker.

The fix is the standard cluster deployment mechanism, applied lazily:
zip the package once per process and ``sc.addPyFile`` it the first time
a Python-on-data operator runs on a given SparkContext. Workers put
shipped zips on ``sys.path``, so the by-reference deserialization works
under ANY session — vanilla local sessions, and real executors on a
1000-node cluster where the repo was never pip-installed (this is
exactly how PySpark applications ship non-installed packages).
"""

from __future__ import annotations

import atexit
import contextlib
import os
import tempfile
import threading
import zipfile

_LOCK = threading.Lock()
_SHIPPED: set[str] = set()  # applicationIds already carrying the zip
_ZIP_PATH: str | None = None


def _package_zip() -> str:
    """Build (once per process) a zip of the package's .py files,
    rooted so ``signaldb_spark/...`` imports resolve from the zip.

    Snapshot semantics: the zip is built from the sources as they are
    at the FIRST Python-on-data call and cached for the process
    lifetime — later edits to package files never reach already-running
    workers (Spark itself cannot re-ship an addPyFile name anyway;
    restart the session to pick up source changes). The zip is removed
    at interpreter exit so /tmp does not accumulate one per driver pid.
    """
    global _ZIP_PATH
    if _ZIP_PATH is not None and os.path.exists(_ZIP_PATH):
        return _ZIP_PATH
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(
        tempfile.gettempdir(), f"signaldb_spark_pkg_{os.getpid()}.zip"
    )
    tmp = path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg_dir):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    os.replace(tmp, path)
    _ZIP_PATH = path

    def _cleanup(p=path):
        with contextlib.suppress(OSError):
            os.remove(p)

    atexit.register(_cleanup)
    return path


def ensure_package_on_workers(spark) -> None:
    """Idempotent per (process, SparkContext): ship the package zip so
    Python workers can deserialize this repo's pandas-UDF closures.
    Call at the entry of every operator that puts Python on the data
    path; no-op after the first call for a context."""
    sc = spark.sparkContext
    app = sc.applicationId
    if app in _SHIPPED:
        return
    with _LOCK:
        if app in _SHIPPED:
            return
        sc.addPyFile(_package_zip())
        _SHIPPED.add(app)
