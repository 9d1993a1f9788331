"""Examples: spheric family (mirrors /root/reference/pysph/examples/spheric)."""
