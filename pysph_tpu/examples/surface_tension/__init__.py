"""Examples: surface_tension family (mirrors /root/reference/pysph/examples/surface_tension)."""
