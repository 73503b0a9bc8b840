"""Activation for the vendored protobuf fallback runtime.

``transformWithStateInPandas`` (streaming/daily.py ttl_dedup_stream)
needs ``google.protobuf`` inside the PYTHON WORKER for the state-server
protocol. This container ships no protobuf wheel, so the repo vendors a
minimal pure-Python runtime implementing exactly the generated-module
contract (vendor/protoshim/google/protobuf/_shim_runtime.py).

``ensure_protobuf()`` is a no-op when a real ``google.protobuf`` is
importable (the shim never shadows a real install). Otherwise it puts
the shim on this process's ``sys.path`` AND on ``PYTHONPATH`` so Spark
python workers — separate processes spawned by the JVM — inherit it.
Call it BEFORE building the SparkSession: in local mode the JVM
snapshots the environment at launch, so a PYTHONPATH exported after
``getOrCreate()`` never reaches the workers.
"""

from __future__ import annotations

import importlib.util
import os
import sys

SHIM_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "vendor", "protoshim")


def _has_protobuf() -> bool:
    try:
        # find_spec raises ModuleNotFoundError when even the parent
        # 'google' namespace package is absent
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


def ensure_protobuf() -> str:
    """Returns 'real' if google.protobuf is already importable, else
    activates the shim and returns 'shim'."""
    if _has_protobuf():
        return "real"
    if SHIM_DIR not in sys.path:
        sys.path.insert(0, SHIM_DIR)
    current = os.environ.get("PYTHONPATH", "")
    if SHIM_DIR not in current.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            SHIM_DIR + (os.pathsep + current if current else "")
        )
    if not _has_protobuf():
        raise RuntimeError(f"protobuf shim not importable from {SHIM_DIR}")
    return "shim"
