"""medea_ps_spark — PySpark-native constraint-validation + training-data analytics engine."""
