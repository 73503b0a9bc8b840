"""Scalar Column-expression library (SURVEY §2.4, §2.10).

Everything here is a native Catalyst expression (JVM-side, whole-stage
codegen) — no Python UDFs on the hot path. Exact-parity pure-Python
twins live alongside for property/golden testing only.
"""

from sstable_migrator_spark.functions import domains, net, text, vectors  # noqa: F401
