"""Sources/sinks: the parquet/Iceberg-style table seam and the adapter
from the driver's flat documents table to the engine's native
interleaved-span shape."""
