"""Ship this package to executor Python workers.

Local mode inherits the driver's PYTHONPATH; cluster mode gets the package
via addPyFile (the spark-submit --py-files story). get_spark() calls
ensure_shipped() so ANY entry path (driver contract, bench, user script from
an arbitrary cwd) yields workers that can import the package.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_PARENT = os.path.dirname(_PKG_DIR)
_PKG = os.path.basename(_PKG_DIR)


def export_pythonpath() -> None:
    """Must run before the JVM/gateway starts for local-mode workers."""
    cur = os.environ.get("PYTHONPATH", "")
    if _PARENT not in cur.split(os.pathsep):
        os.environ["PYTHONPATH"] = _PARENT + (os.pathsep + cur if cur else "")


def package_zip() -> str:
    tag = hashlib.sha256(_PARENT.encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"{_PKG}-{tag}.zip")
    with zipfile.ZipFile(path, "w") as zf:
        for root, _dirs, files in os.walk(_PKG_DIR):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, _PARENT))
    return path


def ensure_shipped(spark) -> None:
    """Idempotent per session."""
    sc = spark.sparkContext
    if getattr(sc, "_lsh_pkg_shipped", False):
        return
    try:
        sc.addPyFile(package_zip())
    except Exception:
        pass  # already registered under the same name
    sc._lsh_pkg_shipped = True
