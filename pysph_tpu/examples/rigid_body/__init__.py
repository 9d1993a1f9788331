"""Examples: rigid_body family (mirrors /root/reference/pysph/examples/rigid_body)."""
