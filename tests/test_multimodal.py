"""Multimodal binary-column plumbing tests (north-star; SURVEY.md
§2.10 design notes in sources/multimodal.py). The decode kernel is
stubbed (no codec libs in this container); the Spark-side contract —
schema, Arrow batch iteration, metadata-only pruning — is real."""

from __future__ import annotations

import pytest

from ocdb_server_spark.sources.multimodal import (
    DECODED_SCHEMA,
    MEDIA_SCHEMA,
    decode_image_stub,
    decode_images,
    make_synthetic_assets,
)


def test_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\x00" * 16)


def test_stub_fake_decodes_header():
    import struct

    payload = struct.pack("<ii", 320, 240) + b"\x01" * 8
    assert decode_image_stub(payload, fake=True) == (320, 240)


@pytest.fixture(scope="module")
def assets(spark):
    return make_synthetic_assets(spark, n=64).cache()


def test_media_schema(assets):
    assert assets.schema == MEDIA_SCHEMA
    assert assets.count() == 64


def test_decode_images_mapinpandas(assets):
    decoded = decode_images(assets, fake=True)
    assert decoded.schema == DECODED_SCHEMA
    rows = {r["asset_id"]: r for r in decoded.collect()}
    assert len(rows) == 64
    # dims must match the deterministic generator formula
    for i in (0, 7, 13, 63):
        assert rows[i]["width"] == 64 + (i % 8) * 16
        assert rows[i]["height"] == 48 + (i % 6) * 16
        assert rows[i]["n_bytes"] == 8 + 128


def test_metadata_query_prunes_payload(assets, tmp_path):
    """A metadata-only aggregation over the parquet-backed media table
    must not read the binary payload column (columnar pruning — the
    reason opaque bytes can sit beside metadata at 100 TB)."""
    path = str(tmp_path / "media")
    assets.write.parquet(path)
    spark = assets.sparkSession
    df = spark.read.parquet(path).groupBy("modality").count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan_part = plan[plan.index("ReadSchema") :][:300] if "ReadSchema" in plan else plan
    assert "payload" not in scan_part
    assert df.collect()[0]["count"] == 64
