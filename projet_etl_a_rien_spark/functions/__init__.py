"""Column-expression helpers built purely on pyspark.sql.functions."""
