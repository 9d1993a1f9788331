"""Examples: gas_dynamics family (mirrors /root/reference/pysph/examples/gas_dynamics)."""
