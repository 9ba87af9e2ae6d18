"""Spark-side functions: Column-expression rules (JVM codegen path)
and batched Arrow pandas-UDFs (Python path, kernels/*)."""
