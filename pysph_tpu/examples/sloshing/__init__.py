"""Examples: sloshing family (mirrors /root/reference/pysph/examples/sloshing)."""
