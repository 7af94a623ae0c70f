"""Multimodal binary-column plumbing (operators/multimodal.py): schema,
determinism, fan-out contract, strict-stub behavior, and column pruning
(metadata queries must not read the blob)."""

from __future__ import annotations

import numpy as np
import pytest

from search_engine_spark.operators import multimodal as mm

N = 64


@pytest.fixture(scope="module")
def assets(spark):
    df = mm.make_assets(spark, N, partitions=4)
    df.cache()
    df.count()
    return df


def test_metadata_schema_and_determinism(assets):
    meta = mm.asset_metadata(assets).collect()
    assert len(meta) == N
    by_id = {r["asset_id"]: r for r in meta}
    assert by_id[0]["n_bytes"] > 0
    assert len(by_id[0]["content_hash"]) == 32
    # modality round-trips through header sniffing
    mods = {r["modality"] for r in meta}
    assert mods == {"image/png", "image/jpeg", "audio/wav", "video/webm"}


def test_features_deterministic_across_partitionings(spark, assets):
    a = mm.extract_features(assets).collect()
    b = mm.extract_features(assets.repartition(13)).collect()
    fa = {r["asset_id"]: r["features"] for r in a}
    fb = {r["asset_id"]: r["features"] for r in b}
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k])
        assert len(fa[k]) == mm.FEATURE_DIM


def test_strict_stub_raises(assets):
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        mm.extract_features(assets, strict=True).collect()


def test_frame_fanout(assets):
    frames = mm.sample_frames(assets, every_n_bytes=32, max_frames=4).collect()
    per_asset: dict[int, list[int]] = {}
    for r in frames:
        per_asset.setdefault(r["asset_id"], []).append(r["frame_no"])
    assert len(per_asset) == N
    for fs in per_asset.values():
        assert sorted(fs) == list(range(len(fs)))
        assert 1 <= len(fs) <= 4


def test_metadata_prunes_blob_column(spark, assets, tmp_path):
    """A metadata-only projection over the parquet layout must not read
    the payload column (ReadSchema pruning)."""
    p = str(tmp_path / "assets")
    assets.write.parquet(p)
    stored = spark.read.parquet(p)
    q = stored.select("asset_id", "modality")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan
