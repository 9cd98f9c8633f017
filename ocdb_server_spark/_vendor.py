"""Fallback wiring for the vendored pure-Python protobuf runtime.

This container ships no `protobuf` wheel and has no network (install
attempts documented in BASELINE.md "Round 6"), but PySpark 4.1.2's
`transformWithStateInPandas` needs `google.protobuf` for its
state-server wire protocol. `vendor/google/protobuf` is the BSD-3
pure-Python 4.23.2 runtime bundled with the locally installed Google
Cloud SDK, with its import prefix restored and a `runtime_version`
shim (see vendor/google/protobuf/runtime_version.py for the
gencode-version rationale and the end-to-end test that stands in for
the skipped version check).

`ensure_protobuf()` is a strict FALLBACK: if a real `google.protobuf`
is importable (any properly provisioned deployment), the vendor copy
is never put on the path. Otherwise it is appended to BOTH `sys.path`
(driver) and `$PYTHONPATH` (inherited by Python workers — the state
server runs worker-side, so the driver path alone is not enough;
must run before the SparkSession is created).
"""

from __future__ import annotations

import importlib.util
import os
import sys

VENDOR_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "vendor")


def ensure_protobuf() -> bool:
    """Make `google.protobuf` importable, vendored copy as fallback.
    Returns True iff protobuf is available (real or vendored)."""
    try:
        if importlib.util.find_spec("google.protobuf") is not None:
            return True
    except (ImportError, ModuleNotFoundError, ValueError):
        pass
    if not os.path.isdir(os.path.join(VENDOR_DIR, "google", "protobuf")):
        return False
    if VENDOR_DIR not in sys.path:
        sys.path.append(VENDOR_DIR)  # append: a real install always wins
    pp = os.environ.get("PYTHONPATH", "")
    if VENDOR_DIR not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (pp + os.pathsep + VENDOR_DIR) if pp else VENDOR_DIR
    # A session built BEFORE this ran (the driver's bare session: it
    # creates its SparkSession first, then imports __spark_entry__)
    # has already captured its env — but Python workers and the TWS
    # state server take their env from `sc.environment` at worker
    # LAUNCH, which is mutable post-hoc. Verified end-to-end: setting
    # it here makes transformWithStateInPandas work in a session that
    # existed before the vendor path did.
    _wire_active_context()
    # Invalidate caches so the just-added path is honored, then confirm.
    importlib.invalidate_caches()
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except (ImportError, ModuleNotFoundError, ValueError):
        return False


def _wire_active_context() -> None:
    """Append the vendor dir to a LIVE SparkContext's worker env."""
    try:
        from pyspark import SparkContext

        sc = SparkContext._active_spark_context
    except Exception:  # pyspark absent/odd — nothing to wire
        return
    if sc is None:
        return
    pp = sc.environment.get("PYTHONPATH", "")
    if VENDOR_DIR not in pp.split(os.pathsep):
        sc.environment["PYTHONPATH"] = (
            (pp + os.pathsep + VENDOR_DIR) if pp else VENDOR_DIR
        )
