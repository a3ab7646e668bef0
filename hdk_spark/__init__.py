"""hdk_spark — a PySpark-native analytics engine with the query surface of
intel/hdk (Heterogeneous Data Kernels).

The reference (/root/reference, archived intel/hdk) is a single-node
columnar JIT engine; this package re-expresses its data model, operator
inventory and Python API (pyhdk, reference python/pyhdk/hdk.py) on top of
the PySpark DataFrame/SQL API so Catalyst + Tungsten supply optimization,
codegen, shuffle and spill.

Public surface (mirrors pyhdk, reference python/pyhdk/hdk.py:2956 `init`):

    import hdk_spark as hdk
    eng = hdk.init()                      # wraps a SparkSession
    t = eng.import_parquet("lineitem.parquet")
    eng.sql("SELECT ...").to_pandas()
    t.agg(["l_returnflag"], ["count", "sum(l_quantity)"]).run()
"""

from hdk_spark.session import get_spark, stop_spark
from hdk_spark.context import HDK, init
from hdk_spark import functions
from hdk_spark import operators
from hdk_spark import partitioning

__all__ = [
    "init", "HDK", "get_spark", "stop_spark", "functions", "operators",
    "partitioning",
]

__version__ = "0.1.0"
