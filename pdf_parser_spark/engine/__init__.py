"""Pure-Python statement semantics (no Spark imports here).

Everything in this package is deterministic, picklable, and safe to ship
to executors inside Arrow-vectorized UDFs.
"""
