"""Column-expression library (SURVEY §2.8): pure pyspark.sql.functions
compositions — JVM-side, codegen-friendly, no UDFs."""
