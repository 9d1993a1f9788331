"""Examples: shallow_water family (mirrors /root/reference/pysph/examples/shallow_water)."""
