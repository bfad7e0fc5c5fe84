from citus_spark.catalog import DIST_HASH, DIST_REFERENCE, DistCatalog


def test_colocation_groups():
    cat = DistCatalog()
    cat.register("orders", DIST_HASH, "o_orderkey", buckets=32)
    cat.register("lineitem", DIST_HASH, "l_orderkey", buckets=32, colocate_with="orders")
    cat.register("events", DIST_HASH, "user_id", buckets=32)
    cat.register("nation", DIST_REFERENCE)
    assert cat.colocated("orders", "lineitem")
    assert not cat.colocated("orders", "events")  # different groups
    assert cat.colocated("orders", "nation")  # reference joins anything
    assert cat.get("lineitem").colocation_id == cat.get("orders").colocation_id


def test_colocation_bucket_mismatch():
    cat = DistCatalog()
    cat.register("a", DIST_HASH, "k", buckets=32)
    try:
        cat.register("b", DIST_HASH, "k", buckets=16, colocate_with="a")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_persistence(tmp_path):
    cat = DistCatalog()
    cat.register("orders", DIST_HASH, "o_orderkey")
    p = tmp_path / "cat.json"
    cat.save(p)
    cat2 = DistCatalog.load(p)
    assert cat2.get("orders").dist_col == "o_orderkey"
    assert cat2.colocated("orders", "orders")
