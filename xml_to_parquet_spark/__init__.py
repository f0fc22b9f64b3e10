"""xml_to_parquet_spark — a PySpark-native engine with the capabilities of
blackrock/xml_to_parquet, extended with a relational / LLM-data-pipeline
operator surface.

The reference (/root/reference, Apache-2.0) is a single-process XML→Parquet
conversion pipeline; this package re-expresses its semantics Spark-first
(DataFrame API, Catalyst optimization, executor parallelism) and adds the
[EXT] operator inventory documented in SURVEY.md §2.2.

Public API:
    from xml_to_parquet_spark import convert, read_xml_documents, get_spark
"""

from xml_to_parquet_spark.session import get_spark
from xml_to_parquet_spark.sources.xml_source import (
    convert,
    convert_archives_to_dataset,
    convert_to_dataset,
    read_xml_documents,
)
from xml_to_parquet_spark.sources.xsd import xsd_to_spark_schema

__all__ = [
    "get_spark",
    "convert",
    "convert_to_dataset",
    "convert_archives_to_dataset",
    "read_xml_documents",
    "xsd_to_spark_schema",
]
__version__ = "0.1.0"
