

def test_winner_docs_key_exclusion_same_on_both_join_paths(spark, monkeypatch):
    """The size-gated broadcast fallback (unbounded streaming key
    accumulators must not be force-broadcast forever) returns the same
    winners as the broadcast path."""
    from entity_extractor_spark.operators import extract as X

    headers = spark.createDataFrame(
        [
            ("doc-00000001", "Acme Glue", "Acme", "c", "us"),
            ("doc-00000002", "Acme Glue", "Acme", "c", "us"),
            ("doc-00000003", "Other Thing", "Beta", "c", "us"),
        ],
        "doc_id string, display_name string, manufacturer_name string,"
        " manufacturer_city string, manufacturer_country string",
    )
    chems = spark.createDataFrame(
        [("doc-00000001",), ("doc-00000002",), ("doc-00000003",)],
        "doc_id string",
    )
    existing = spark.createDataFrame(
        [("acmeglue\x1fAcme",)], "mat_key string"
    )
    broadcast_path = X.winner_docs(headers, chems, existing).collect()
    monkeypatch.setattr(X, "EXISTING_KEYS_BROADCAST_MAX", 0)
    shuffle_path = X.winner_docs(headers, chems, existing).collect()
    want = {("doc-00000003", "Other Thing")}
    for got in (broadcast_path, shuffle_path):
        assert {(r["doc_id"], r["display_name"]) for r in got} == want
