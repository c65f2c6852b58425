"""Column-function library.

Everything here returns Spark ``Column`` expressions built from built-in
``pyspark.sql.functions`` (JVM-side, whole-stage-codegen'd) unless a module
explicitly documents a Pandas-UDF slow path. No row-at-a-time Python UDFs
in any hot path.
"""
