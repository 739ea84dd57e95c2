"""Loader for the vendored pure-Python protobuf shim
(``vendor/pbshim/google/protobuf``) so Spark's
``transformWithStateInPandas`` worker protocol executes in environments
without the real protobuf package (r7 VERDICT item 6: turn the
perpetual protobuf-gated skip into a run).

Two halves, both no-ops when ``import google.protobuf`` already works
(the shim must never shadow the real runtime):

- :func:`ensure_protobuf_driver` — driver-process ``sys.path``.
- :func:`ensure_protobuf` — driver + executors: zips the shim once per
  process and ships it with ``SparkContext.addPyFile`` (the standard
  mechanism — workers insert shipped archives into ``sys.path``), so
  the worker-side ``import pyspark...StateMessage_pb2`` resolves.

New module per the evidence-ledger rule; no registry query depends on
it (the tws operator itself keeps its pytest oracle — the live JVM
state server on the other end of the socket is the protocol oracle).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_VENDOR_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "vendor",
    "pbshim",
)
_zip_path: str | None = None


def ensure_protobuf_driver() -> bool:
    """Make ``google.protobuf`` importable in THIS process and every
    python process a LATER-started JVM spawns. Returns True when an
    import will succeed afterwards.

    Besides ``sys.path``, this prepends the vendor dir to the
    ``PYTHONPATH`` environment variable: transformWithState's pre-init
    "driver worker" is launched by the JVM with the environment the JVM
    was started with — it does not see ``addPyFile`` includes — so for
    the tws protocol this MUST run before the SparkSession (and its
    JVM) is created. conftest.py does exactly that for the test
    session."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    if not os.path.isdir(os.path.join(_VENDOR_DIR, "google", "protobuf")):
        return False
    import sys

    if _VENDOR_DIR not in sys.path:
        sys.path.insert(0, _VENDOR_DIR)
    existing = os.environ.get("PYTHONPATH", "")
    if _VENDOR_DIR not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _VENDOR_DIR + (os.pathsep + existing if existing else "")
        )
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def _shim_zip() -> str:
    """Zip the shim package once per process (addPyFile wants a file)."""
    global _zip_path
    if _zip_path is None or not os.path.exists(_zip_path):
        fd, path = tempfile.mkstemp(prefix="pbshim_", suffix=".zip")
        os.close(fd)
        with zipfile.ZipFile(path, "w") as zf:
            for root, _dirs, files in os.walk(os.path.join(_VENDOR_DIR, "google")):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        zf.write(full, os.path.relpath(full, _VENDOR_DIR))
        _zip_path = path
    return _zip_path


def ensure_protobuf(spark) -> bool:
    """Driver + executor availability. Ships the shim to workers via
    ``addPyFile`` only when the real package is missing ON THE DRIVER.

    Environment-homogeneity assumption (review-noted, deliberate): when
    the driver HAS real protobuf, nothing is shipped — executor
    availability cannot be probed from here, and unconditionally
    shipping the shim would put it at the FRONT of executor
    ``sys.path``, shadowing a real (newer, complete) runtime on any
    cluster that has one. True in local mode (driver == executors) and
    on uniform-image clusters — the deployments this repo targets; a
    heterogeneous cluster whose executors lack protobuf must install
    it in the executor image."""
    if not ensure_protobuf_driver():
        return False
    import google.protobuf

    if not getattr(google.protobuf, "__version__", "").endswith(
        "shim-proto3-subset"
    ):
        return True  # real protobuf everywhere; nothing to ship
    spark.sparkContext.addPyFile(_shim_zip())
    return True
