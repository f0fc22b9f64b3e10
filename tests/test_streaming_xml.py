"""Streaming XML ingestion: the reference's conversion surface lifted to
Structured Streaming (read_xml_documents_stream). Verifies the streamed
rows match the batch reader's golden shape and that newly-arriving files
are picked up by a subsequent trigger."""

import json
import shutil
import uuid

from pyspark.sql import functions as F

from tests.conftest import REF_XML, REF_XSD
from tests.test_conversion import GOLDEN_FULL
from xml_to_parquet_spark.sources.xml_source import read_xml_documents_stream


def _drain_to_view(df, view):
    q = (
        df.writeStream.format("memory")
        .queryName(view)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()


def test_stream_matches_batch_golden(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    for i in range(3):
        shutil.copy(REF_XML, src / f"po_{i}.xml")
    view = f"xmlstream_{uuid.uuid4().hex[:8]}"
    _drain_to_view(read_xml_documents_stream(spark, str(src), REF_XSD), view)
    rows = spark.sql(
        f"SELECT to_json(struct(*), map('ignoreNullFields','false')) AS j FROM {view}"
    ).collect()
    assert len(rows) == 3
    assert all(json.loads(r["j"]) == GOLDEN_FULL for r in rows)


def test_stream_picks_up_new_files(spark, tmp_path):
    """Incremental conversion: parquet sink + checkpoint; a second trigger
    converts only the newly-arrived file (exactly-once file tracking)."""
    src = tmp_path / "incoming2"
    src.mkdir()
    shutil.copy(REF_XML, src / "first.xml")
    stream = read_xml_documents_stream(spark, str(src), REF_XSD)
    out = str(tmp_path / "out_parquet")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    drain()
    assert spark.read.parquet(out).count() == 1
    shutil.copy(REF_XML, src / "second.xml")
    drain()  # second trigger: only the new file is read (exactly-once)
    assert spark.read.parquet(out).count() == 2


def test_stream_include_path_prunes(spark, tmp_path):
    src = tmp_path / "incoming3"
    src.mkdir()
    shutil.copy(REF_XML, src / "po.xml")
    stream = read_xml_documents_stream(
        spark, str(src), REF_XSD, xpaths="/purchaseOrder/items/item"
    )
    view = f"xmlstream_{uuid.uuid4().hex[:8]}"
    _drain_to_view(stream, view)
    row = spark.table(view).select(
        F.size("purchaseOrder.items.item").alias("n")
    ).collect()[0]
    assert row["n"] == 2
    fields = [f.name for f in spark.table(view).schema["purchaseOrder"].dataType.fields]
    assert "shipTo" not in fields and "billTo" not in fields
