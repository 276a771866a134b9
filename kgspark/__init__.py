"""kgspark — PySpark-native knowledge-graph construction engine.

Brand-new implementation (not a port) of the capabilities of
``syfyufei/What_kgllm``: pages → text extraction → chunking → triple
extraction → entity standardization/linking → relationship inference →
materialized triple/entity/edge tables, plus the reference's analytics
query surface — all expressed as Spark DataFrame operations and
vectorized pandas/Arrow UDFs (no per-row Python UDFs anywhere).

Reference semantics are documented per-operator with file:line citations
into /root/reference so parity can be audited.
"""

__version__ = "0.1.0"
