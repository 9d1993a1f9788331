"""Examples: sphysics family (mirrors /root/reference/pysph/examples/sphysics)."""
