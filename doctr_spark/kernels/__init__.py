"""Pure-numpy kernels: no Spark imports here.

These are the per-page / per-crop computational primitives that the Spark
operators wrap in Arrow-batched pandas UDFs. Each kernel reimplements the
semantics of a reference function (cited in its docstring) — the code is
written from scratch for this engine.
"""
