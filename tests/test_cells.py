"""S2 + h3lite cell indexes: spec anchors, hierarchy algebra, Spark UDF parity."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tiledspark import cells


def test_s2_face_center_anchors():
    """Face centers have the canonical S2 ids ((2*face+1) << 60 | 1) — a
    public-spec anchor independent of our own code."""
    lat = np.array([0.0, 0.0, 90.0, -90.0])
    lon = np.array([0.0, 90.0, 0.0, 0.0])
    leaf = cells.np_s2_leaf_id(lat, lon)
    assert leaf[0] == 0x1000000000000001  # face 0 center
    assert leaf[1] == 0x3000000000000001  # face 1 center
    assert leaf[2] == 0x5000000000000001  # face 2 center
    # face 5 (z-): unsigned 0xB000000000000001 → signed
    assert leaf[3] == np.int64(np.uint64(0xB000000000000001))


def test_s2_city_prefixes():
    """Known public S2 token prefixes for world cities — checks the full
    face/ST/Hilbert pipeline against published S2 ids."""
    cases = [
        (51.5074, -0.1278, 0x4876),  # London
        (40.7128, -74.0060, 0x89c2),  # New York
        (37.4220, -122.0840, 0x808f),  # Mountain View
        (37.7749, -122.4194, 0x8085),  # San Francisco (other side of the Hilbert seam)
    ]
    for lat, lon, prefix in cases:
        leaf = cells.np_s2_leaf_id(np.array([lat]), np.array([lon]))
        assert (np.uint64(leaf[0]) >> np.uint64(48)) == prefix, (lat, lon, hex(np.uint64(leaf[0])))


def test_s2_hierarchy_and_levels():
    rng = np.random.default_rng(5)
    lat = rng.uniform(-89, 89, 3000)
    lon = rng.uniform(-180, 180, 3000)
    leaf = cells.np_s2_leaf_id(lat, lon)
    assert (cells.np_s2_level(leaf) == 30).all()
    for lvl in (3, 9, 13, 20):
        p = cells.np_s2_parent(leaf, lvl)
        assert (cells.np_s2_level(p) == lvl).all()
        # containment is transitive through intermediate levels
        q = cells.np_s2_parent(cells.np_s2_parent(leaf, lvl + 4), lvl)
        assert np.array_equal(p, q)
    # nearby points share coarse cells
    base = cells.np_s2_cell(np.array([48.85, 48.8501]), np.array([2.35, 2.3501]), 10)
    assert base[0] == base[1]


def test_s2_locality_vs_quadtree():
    """Points in the same tiny radius share S2 parents; antipodal points never do."""
    a = cells.np_s2_cell(np.array([10.0]), np.array([20.0]), 8)
    b = cells.np_s2_cell(np.array([-10.0]), np.array([-160.0]), 8)
    assert a[0] != b[0]


def test_h3lite_determinism_and_res():
    rng = np.random.default_rng(6)
    lat = rng.uniform(-80, 80, 1000)
    lon = rng.uniform(-180, 180, 1000)
    for res in (3, 7, 9):
        c1 = cells.np_h3lite_cell(lat, lon, res)
        c2 = cells.np_h3lite_cell(lat, lon, res)
        assert np.array_equal(c1, c2)
        r, q, rr = cells.np_h3lite_unpack(c1)
        assert (r == res).all()
    # finer res → more distinct cells
    n3 = len(np.unique(cells.np_h3lite_cell(lat, lon, 3)))
    n9 = len(np.unique(cells.np_h3lite_cell(lat, lon, 9)))
    assert n9 > n3


def test_spark_udf_parity(spark):
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {"lat": rng.uniform(-85, 85, 2000), "lon": rng.uniform(-180, 180, 2000)}
    )
    df = spark.createDataFrame(pdf)
    out = cells.with_cell_indexes(df, s2_level=13, h3_res=7).toPandas()
    exp_s2 = cells.np_s2_cell(pdf["lat"].to_numpy(), pdf["lon"].to_numpy(), 13)
    exp_h3 = cells.np_h3lite_cell(pdf["lat"].to_numpy(), pdf["lon"].to_numpy(), 7)
    assert np.array_equal(np.sort(out["s2_cell"].to_numpy()), np.sort(exp_s2))
    assert np.array_equal(np.sort(out["h3lite_cell"].to_numpy()), np.sort(exp_h3))
