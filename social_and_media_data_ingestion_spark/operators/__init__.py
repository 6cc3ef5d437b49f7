"""Composable, schema-typed operators over Spark DataFrames."""
