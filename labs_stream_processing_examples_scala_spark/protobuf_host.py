"""Locate a pure-Python ``google.protobuf`` runtime on the host.

Spark 4.x's ``transformWithStateInPandas`` Python worker speaks protobuf
to the JVM (pyspark/sql/streaming/proto/*_pb2.py, generated modules that
need the Apache-2.0 ``protobuf`` runtime). This container has no
``protobuf`` pip package, but common host tooling bundles the identical
pure-Python runtime files; if one is found, adding its directory to
``sys.path`` (driver) and ``PYTHONPATH`` (so Spark's forked Python
workers inherit it — PythonWorkerFactory merges the JVM's PYTHONPATH
into worker paths) makes TWS fully runnable with zero installs.

Call :func:`ensure_protobuf` BEFORE the first SparkSession is created:
the JVM captures the environment at gateway launch, so a PYTHONPATH set
afterwards never reaches the workers.
"""

from __future__ import annotations

import os
import sys

# Known host locations of a bundled pure-Python protobuf runtime (the
# same Apache-2.0 files as the PyPI `protobuf` wheel). Checked only when
# `google.protobuf` is not already importable.
_HOST_PROTOBUF_DIRS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)

_resolved: bool | None = None


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable (driver + future workers).

    Returns True iff a runtime with the modern codegen API
    (``internal.builder``, needed by pyspark's generated ``*_pb2.py``)
    is importable after the call. Idempotent; caches the outcome.
    """
    global _resolved
    if _resolved is not None:
        return _resolved
    try:
        from google.protobuf.internal import builder  # noqa: F401

        _resolved = True
        return True
    except ImportError:
        pass
    for d in _HOST_PROTOBUF_DIRS:
        if not os.path.isdir(os.path.join(d, "google", "protobuf", "internal")):
            continue
        # append (not insert): only the `google` namespace should come
        # from here; everything else keeps resolving from site-packages.
        # VERIFY the builder import before committing the mutation: a
        # pre-3.20 host runtime passes the isdir probe but fails the
        # import, and leaving the dir on sys.path/PYTHONPATH would make
        # every later `import google.protobuf` (driver, forked workers,
        # subprocesses) resolve the incompatible runtime — turning a
        # clean 'protobuf unavailable' into downstream gencode errors
        # (round-12 self-review).
        added_sys = d not in sys.path
        if added_sys:
            sys.path.append(d)
        pp_orig = os.environ.get("PYTHONPATH")  # None ≠ "": rollback must
        # restore UNSET, not leave a defined-but-empty var behind for
        # subprocesses to inherit (round-12 ADVICE)
        pp = pp_orig or ""
        added_pp = d not in pp.split(os.pathsep)
        if added_pp:
            os.environ["PYTHONPATH"] = (pp + os.pathsep + d) if pp else d
        try:
            from google.protobuf.internal import builder  # noqa: F401
        except ImportError:
            if added_sys:
                sys.path.remove(d)
            if added_pp:
                if pp_orig is None:
                    os.environ.pop("PYTHONPATH", None)
                else:
                    os.environ["PYTHONPATH"] = pp_orig
            continue
        # pyspark's generated *_pb2.py may be one minor version ahead of
        # the host runtime (e.g. gencode 6.33 vs runtime 6.32), which the
        # strict check rejects even though minor-version wire format is
        # unchanged; protobuf's own documented escape hatch covers this.
        os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
        _resolved = True
        return True
    _resolved = False
    return False
