"""PySpark-native analytics/ingestion engine.

A from-scratch re-expression of the capabilities of the reference
`xixuanzhang2022/social-and-media-data-ingestion` (five ETL scripts for
Reddit / Twitter / media-article collection) as composable, schema-typed
Spark operators, plus the LLM-training-data-pipeline layer (dedup,
similarity search, text analysis) designed for 100 TB scale.

Architecture: DataFrame/SQL plans handed to Catalyst — never hand-executed
row loops. Python UDFs only where semantics genuinely require them
(HTML parsing, side-effecting HTTP), always Arrow-batched.
"""

from social_and_media_data_ingestion_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
