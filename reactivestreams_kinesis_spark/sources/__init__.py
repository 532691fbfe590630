"""Source connectors: batch parquet (see ``catalog``), emulated record
streams (see ``streaming.records``), and the real-Kinesis option surface
(``sources.kinesis`` — config pass-through, not network-tested, mirroring
how the reference keeps its only live-network test commented out)."""
