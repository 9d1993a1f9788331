"""Examples: dam_break family (mirrors /root/reference/pysph/examples/dam_break)."""
