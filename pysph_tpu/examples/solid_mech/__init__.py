"""Examples: solid_mech family (mirrors /root/reference/pysph/examples/solid_mech)."""
